package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Pins the Delta-log-shaped commit kernel (operators/SnapshotLog):
  * checkpoint-based resolution must equal a from-scratch JSON replay
  * bit-exactly, and must keep working after the pre-checkpoint JSON
  * tail is vacuumed — the on-disk proof that resolution is O(tail),
  * not O(history). */
class SnapshotLogSpec extends SparkTestBase {

  import operators.SnapshotLog

  test("checkpoint resolution equals from-scratch replay bit-exactly") {
    val root = SnapshotLog.ensure(spark, sf)
    val latest = SnapshotLog.latestLogVersion(root)
    // from-scratch replay: fold EVERY json delta, ignoring checkpoints
    val pure = (0 to latest).foldLeft(Seq.empty[String]) { (units, v) =>
      SnapshotLog.applyDelta(units,
        Files.readString(Paths.get(root, "_log", s"$v.json")))
    }
    val viaCkpt = SnapshotLog.resolveUnits(spark, root, latest)
    assert(viaCkpt == pure, s"unit lists diverged: $viaCkpt vs $pure")
    // and the reconstructed rows agree with the base projection
    val got = SnapshotLog.readLogSnapshot(spark, root, latest)
      .orderBy("custkey").collect()
    val want = Tables.customer(spark, sf).select(
        col("c_custkey").as("custkey"), col("c_name").as("name"),
        col("c_acctbal").as("acctbal"))
      .orderBy("custkey").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("intermediate versions resolve via checkpoint + tail") {
    val root = SnapshotLog.ensure(spark, sf)
    // v5 sits between the checkpoints at v3 and v7: resolution must be
    // ckpt_3 + deltas 4..5 and list exactly slices 0..5
    val v5 = SnapshotLog.resolveUnits(spark, root, 5)
    assert(v5 == (0 to 5).map(k => s"data/slice_$k"))
    // the checkpointed version itself round-trips through its parquet
    val v7 = SnapshotLog.resolveUnits(spark, root, 7)
    assert(v7 == (0 to 7).map(k => s"data/slice_$k"))
  }

  test("vacuuming pre-checkpoint logs leaves resolution intact (O(tail))") {
    val root = SnapshotLog.ensure(spark, sf)
    val latest = SnapshotLog.latestLogVersion(root)
    val before = SnapshotLog.readLogSnapshot(spark, root, latest)
      .agg(count(lit(1)), sum("custkey")).first()
    val removed = SnapshotLog.vacuumLog(root)
    assert(removed > 0, "vacuum deleted nothing — test is vacuous")
    // latest resolves through ckpt_7 + the v8 delta alone; a resolver
    // that secretly replayed from v0 would now throw
    val after = SnapshotLog.readLogSnapshot(spark, root, latest)
      .agg(count(lit(1)), sum("custkey")).first()
    assert(after == before, "snapshot changed after log vacuum")
    // the checkpointed version still time-travels...
    assert(SnapshotLog.resolveUnits(spark, root, 7) ==
      (0 to 7).map(k => s"data/slice_$k"))
    // ...and a mid-window version whose tail was vacuumed fails FAST
    // with a diagnosable error instead of resolving wrongly
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.resolveUnits(spark, root, 5)
    }
    assert(e.getMessage.contains("vacuumed"))
  }
}
