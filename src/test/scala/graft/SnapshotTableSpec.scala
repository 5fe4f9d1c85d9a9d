package graft

import org.apache.spark.sql.functions._

/** Contract of the manifest-based snapshot table
  * ([[operators.SnapshotTable]]): commits are complete manifests,
  * copy-on-write rewrites ONLY the touched unit, and time travel to
  * version 0 reproduces the pre-upsert snapshot byte-for-byte. (The
  * oracle gate proves engine parity of both reads against DuckDB;
  * this pins the FORMAT mechanics the oracle can't see.) */
class SnapshotTableSpec extends SparkTestBase {

  test("copy-on-write: v1 carries untouched v0 units by reference") {
    import operators.SnapshotTable
    // both reads force construction (idempotent via the memo)
    val v1 = SnapshotTable.etlSnapshotRead(spark, sf)
    val v0 = SnapshotTable.etlTimeTravel(spark, sf)
    val root = Tables.sinkPath(spark, sf, "snaptbl")

    def units(v: Int): Seq[String] = {
      val mf = java.nio.file.Paths.get(root, "_manifests", s"v$v.json")
      "\"(data/[^\"]+)\"".r
        .findAllMatchIn(java.nio.file.Files.readString(mf))
        .map(_.group(1)).toSeq
    }
    val (u0, u1) = (units(0), units(1))
    assert(u0.size == SnapshotTable.NBuckets)
    // exactly one COW unit rewritten; the other three shared by name
    assert(u0.tail.forall(u1.contains), "untouched units must be shared")
    assert(!u1.contains(u0.head), "touched unit must be rewritten")
    assert(u1.size == SnapshotTable.NBuckets + 1, "inserts add one unit")

    // time travel: v0 is the untouched base projection
    val base = Tables.customer(spark, sf).select(
      col("c_custkey").as("custkey"), col("c_name").as("name"),
      col("c_acctbal").as("acctbal"))
    assert(v0.exceptAll(base).isEmpty && base.exceptAll(v0).isEmpty,
      "v0 must equal the pre-upsert snapshot")

    // v1 semantics: inserts appended, updated rows renamed
    assert(v1.count() == base.count() +
      base.filter(col("custkey") % 7 === 0).count())
    assert(v1.filter(col("name").endsWith("_v2")).count() > 0)
    // updated keys are confined to bucket 0 (the COW locality claim)
    val width = base.agg(max("custkey")).first().getLong(0) /
      SnapshotTable.NBuckets + 1
    assert(v1.filter(col("name").endsWith("_v2") &&
      col("custkey") >= width).count() == 0)
  }

  test("change feed reads only the differing units and classifies rows") {
    import operators.SnapshotTable
    val diff = SnapshotTable.etlSnapshotDiff(spark, sf)
    val root = Tables.sinkPath(spark, sf, "snaptbl")
    // manifest-level pruning: only the rewritten unit, its v0
    // predecessor, and the inserts unit are ever scanned — carried
    // units are provably unchanged and must not appear in the scan
    val files = diff.inputFiles.toSeq
    assert(files.nonEmpty)
    assert(files.forall(f => f.contains("/data/v1_b0") ||
      f.contains("/data/v0_b0") || f.contains("/data/v1_inserts")),
      s"diff scanned a carried unit:\n${files.mkString("\n")}")
    val base = Tables.customer(spark, sf)
    val width = base.agg(max("c_custkey")).first().getLong(0) /
      SnapshotTable.NBuckets + 1
    val byChange = diff.groupBy("change").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byChange.getOrElse("insert", 0L) ==
      base.filter(col("c_custkey") % 7 === 0).count())
    assert(byChange.getOrElse("update", 0L) ==
      base.filter(col("c_custkey") % 5 === 0 &&
        col("c_custkey") < width).count())
    assert(!byChange.contains("delete"), "COW fixture produces no deletes")
  }

  test("compaction is metadata-only: one unit, same rows, history intact") {
    import operators.SnapshotTable
    val compacted = SnapshotTable.etlSnapshotCompact(spark, sf)
    assert(compacted.inputFiles.length == 1, "v2 must be one compacted unit")
    val root = Tables.sinkPath(spark, sf, "snaptbl")
    val v1 = SnapshotTable.readSnapshot(spark, root, 1)
      .select("custkey", "name", "acctbal")
    assert(compacted.exceptAll(v1).isEmpty && v1.exceptAll(compacted).isEmpty,
      "compaction changed row content")
    // older versions remain readable: compaction never deletes units
    assert(SnapshotTable.readSnapshot(spark, root, 0).count() ==
      Tables.customer(spark, sf).count())
    assert(SnapshotTable.latestVersion(root) == 2)
  }

  test("unknown version fails fast with a diagnosable error") {
    import operators.SnapshotTable
    SnapshotTable.etlSnapshotRead(spark, sf).count()
    val root = Tables.sinkPath(spark, sf, "snaptbl")
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.readSnapshot(spark, root, 99)
    }
    assert(e.getMessage.contains("no version 99"))
  }
}
