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

  test("merge: COW touches exactly the matched buckets; clauses apply") {
    import operators.SnapshotTable
    val merged = SnapshotTable.etlSnapshotMerge(spark, sf)
    val root = Tables.sinkPath(spark, sf, "snapmerge")
    def units(v: Int): Seq[String] = {
      val mf = java.nio.file.Paths.get(root, "_manifests", s"v$v.json")
      "\"(data/[^\"]+)\"".r
        .findAllMatchIn(java.nio.file.Files.readString(mf))
        .map(_.group(1)).toSeq
    }
    val (u0, u1) = (units(0), units(1))
    // matched keys live under 2*width -> buckets 0,1 rewritten, 2,3 carried
    assert(u1.count(_.startsWith("data/v1_merge_b")) == 2,
      s"expected 2 rewritten buckets: $u1")
    assert(u0.drop(2).forall(u1.contains), "buckets 2-3 must carry by reference")
    val base = Tables.customer(spark, sf)
    val width = base.agg(max("c_custkey")).first().getLong(0) /
      SnapshotTable.NBuckets + 1
    val nDel = base.filter(col("c_custkey") % 10 === 6 &&
      col("c_custkey") < 2 * width).count()
    val nIns = base.filter(col("c_custkey") % 11 === 0).count()
    assert(merged.count() == base.count() - nDel + nIns)
    // WHEN MATCHED DELETE really removed the rows
    assert(merged.filter(col("custkey") % 10 === 6 &&
      col("custkey") < 2 * width).count() == 0)
    // WHEN MATCHED UPDATE applied to every surviving matched row
    assert(merged.filter(col("name").endsWith("_m")).count() ==
      base.filter(col("c_custkey") % 10 === 3 &&
        col("c_custkey") < 2 * width).count())
  }

  test("vacuum deletes unreferenced units; latest snapshot intact") {
    import operators.SnapshotTable
    val after = SnapshotTable.etlSnapshotVacuum(spark, sf)
    val root = Tables.sinkPath(spark, sf, "snapvac")
    // the v0-only unit (the one the upsert rewrote) is physically gone
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "data", "v0_b0")),
      "vacuum must delete the unreferenced v0 unit")
    // superseded manifest gone -> time travel to v0 fails fast
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.readSnapshot(spark, root, 0)
    }
    assert(e.getMessage.contains("no version 0"))
    // carried units survive and the latest snapshot still reconstructs
    val main = SnapshotTable.etlSnapshotRead(spark, sf)
    assert(after.exceptAll(main).isEmpty && main.exceptAll(after).isEmpty,
      "vacuum changed the latest snapshot's rows")
  }

  test("stats pruning never opens a unit the predicate cannot match") {
    import operators.SnapshotTable
    val pruned = SnapshotTable.etlSnapshotPrune(spark, sf)
    val files = pruned.inputFiles.toSeq
    assert(files.nonEmpty)
    assert(files.forall(_.contains("/data/v0_b0")),
      s"pruned read opened a non-matching unit:\n${files.mkString("\n")}")
    // and the result is exactly the predicate applied to the base
    val base = Tables.customer(spark, sf)
    val width = base.agg(max("c_custkey")).first().getLong(0) /
      SnapshotTable.NBuckets + 1
    assert(pruned.count() ==
      base.filter(col("c_custkey") < width / 2).count())
  }

  test("add column: old units null-fill, appended unit carries values") {
    import operators.SnapshotTable
    val evolved = SnapshotTable.etlSnapshotAddColumn(spark, sf)
    val base = Tables.customer(spark, sf)
    val nNew = base.filter(col("c_custkey") % 9 === 0).count()
    assert(evolved.count() == base.count() + nNew)
    assert(evolved.filter(col("segment").isNull).count() == base.count(),
      "every pre-evolution row must read back with segment NULL")
    assert(evolved.filter(col("segment").isNotNull).count() == nNew)
    // ADD COLUMN rewrote nothing: the appended unit is the only new file
    val root = Tables.sinkPath(spark, sf, "snapevo")
    val mf = java.nio.file.Files.readString(
      java.nio.file.Paths.get(root, "_manifests", "v1.json"))
    assert((0 until SnapshotTable.NBuckets)
      .forall(b => mf.contains(s"data/v0_b$b")),
      "v0 units must carry by reference through the schema change")
  }

  test("shallow clone shares storage: no data copied, rows identical") {
    import operators.SnapshotTable
    val clone = SnapshotTable.etlSnapshotClone(spark, sf)
    val cloneRoot = Tables.sinkPath(spark, sf, "snapclone")
    val srcRoot = Tables.sinkPath(spark, sf, "snaptbl")
    // every scanned file lives under the SOURCE table's directory
    val files = clone.inputFiles.toSeq
    assert(files.nonEmpty)
    assert(files.forall(_.contains(
      java.nio.file.Paths.get(srcRoot).getFileName.toString)),
      s"clone scanned a non-source file:\n${files.mkString("\n")}")
    // the clone root holds a manifest and NO data files of its own
    assert(!java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(cloneRoot, "data")),
      "shallow clone must not materialize data files")
    // and the rows equal the source's current snapshot
    val src = SnapshotTable.etlSnapshotRead(spark, sf)
    assert(clone.exceptAll(src).isEmpty && src.exceptAll(clone).isEmpty)
  }

  test("restore rolls the log tail back; history stays intact") {
    import operators.SnapshotTable
    val restored = SnapshotTable.etlSnapshotRestore(spark, sf)
    val root = Tables.sinkPath(spark, sf, "snaprest")
    assert(SnapshotTable.latestVersion(root) == 2)
    // the restore commit re-references v0's units — nothing rewritten
    def mf(v: Int) = java.nio.file.Files.readString(
      java.nio.file.Paths.get(root, "_manifests", s"v$v.json"))
    assert((0 until SnapshotTable.NBuckets)
      .forall(b => mf(2).contains(s"data/v0_b$b")))
    // rows equal the pre-upsert base; the rolled-back v1 is still there
    val base = Tables.customer(spark, sf).select(
      col("c_custkey").as("custkey"), col("c_name").as("name"),
      col("c_acctbal").as("acctbal"))
    assert(restored.exceptAll(base).isEmpty && base.exceptAll(restored).isEmpty)
    assert(SnapshotTable.readSnapshot(spark, root, 1).count() > base.count())
  }

  test("racing commits of one version admit exactly one writer") {
    import operators.SnapshotTable
    val root = Tables.sinkPath(spark, sf, "snapcc")
    SnapshotTable.commit(root, 0, Seq("data/writer_a"))
    // writer B staged its own manifest for v0 concurrently; the
    // atomic no-replace rename must reject it — optimistic
    // concurrency at the filesystem layer
    intercept[java.nio.file.FileAlreadyExistsException] {
      SnapshotTable.commit(root, 0, Seq("data/writer_b"))
    }
    // the winner's manifest is intact, not half-overwritten
    val mf = java.nio.file.Files.readString(
      java.nio.file.Paths.get(root, "_manifests", "v0.json"))
    assert(mf.contains("writer_a") && !mf.contains("writer_b"))
    // and the loser's correct move is a RE-BASED commit at v1, which
    // succeeds against the advanced log tail
    SnapshotTable.commit(root, 1, Seq("data/writer_a", "data/writer_b"))
    assert(SnapshotTable.latestVersion(root) == 1)
  }

  test("genuinely concurrent commit race: one winner, intact manifest") {
    // the sequential race test above can't catch staging-layer
    // corruption (two writers sharing one tmp name overwrite each
    // other's staged bytes BEFORE the atomic claim); this one runs
    // many same-version commits truly in parallel, repeatedly, and
    // asserts exactly one winner per version whose published manifest
    // is one of the two candidate payloads, bit-complete
    import operators.SnapshotTable
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val root = Tables.sinkPath(spark, sf, "snapccmt")
    val pool = Executors.newFixedThreadPool(8)
    try {
      for (v <- 0 until 20) {
        val start = new CountDownLatch(1)
        val results = (0 until 8).map { w =>
          pool.submit(new java.util.concurrent.Callable[Option[Int]] {
            override def call(): Option[Int] = {
              start.await()
              try { SnapshotTable.commit(root, v, Seq(s"data/w$w")); Some(w) }
              catch { case _: java.nio.file.FileAlreadyExistsException => None }
            }
          })
        }
        start.countDown()
        val winners = results.flatMap(_.get(30, TimeUnit.SECONDS))
        assert(winners.size == 1, s"v$v admitted ${winners.size} writers")
        val mf = java.nio.file.Files.readString(
          java.nio.file.Paths.get(root, "_manifests", s"v$v.json"))
        // the published manifest is the winner's complete payload —
        // not a torn mix of two writers' staged bytes
        assert(mf == s"""{"version":$v,"files":["data/w${winners.head}"]}""",
          s"v$v manifest torn or foreign: $mf")
      }
    } finally pool.shutdownNow()
  }

  test("two concurrent transactional appenders: loser rebases, no row or version lost") {
    // r10 verdict #5 — the WRITER-LOOP half of the OCC story: the raw
    // claim race above proves one link() wins; this proves the full
    // transaction (stage unit → claim tail+1 → on loss REBASE onto
    // the winner's unit list → retry) loses the race GRACEFULLY. Two
    // committers race from the same observed tail, repeatedly; every
    // round must end with both rows in the final snapshot, contiguous
    // versions, and each intermediate manifest a superset of its
    // parent (nothing overwritten).
    import operators.SnapshotTable
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    import spark.implicits._
    val root = Tables.sinkPath(spark, sf, "snaptx")
    new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
    // v0 base: one row, so the table starts with a committed tail
    SnapshotTable.commitAppendTx(
      Seq((0L, "base")).toDF("id", "who"), root, "base")
    val pool = Executors.newFixedThreadPool(2)
    try {
      for (round <- 1 to 5) {
        val start = new CountDownLatch(1)
        val vs = Seq("a", "b").map { w =>
          pool.submit(new java.util.concurrent.Callable[Int] {
            override def call(): Int = {
              start.await()
              SnapshotTable.commitAppendTx(
                Seq((round.toLong, w)).toDF("id", "who"),
                root, s"r${round}_$w")
            }
          })
        }
        start.countDown()
        val committed = vs.map(_.get(60, TimeUnit.SECONDS))
        // both landed, at distinct versions, and the log tail moved
        // by exactly 2 — the loser retried at N+1 instead of failing
        // or silently overwriting the winner
        assert(committed.distinct.size == 2,
          s"round $round: both writers claim version ${committed.head}")
        assert(committed.toSet == Set(2 * round - 1, 2 * round),
          s"round $round: versions $committed not contiguous after tail ${2 * round - 2}")
      }
      val latest = SnapshotTable.latestVersion(root)
      assert(latest == 10, s"log tail $latest after 1 base + 5×2 appends")
      val all = SnapshotTable.readSnapshot(spark, root, latest)
        .as[(Long, String)].collect().toSet
      val want = Set((0L, "base")) ++
        (1 to 5).flatMap(r => Seq((r.toLong, "a"), (r.toLong, "b"))).toSet
      assert(all == want, s"rows lost or duplicated: ${all.diff(want)} / ${want.diff(all)}")
      // every version's unit list is a superset of its parent's — the
      // rebase adopted the winner's units instead of clobbering them
      (1 to latest).foreach { v =>
        val prev = SnapshotTable.readSnapshot(spark, root, v - 1).count()
        val cur = SnapshotTable.readSnapshot(spark, root, v).count()
        assert(cur == prev + 1, s"v$v holds $cur rows after parent's $prev")
      }
    } finally pool.shutdownNow()
  }

  test("tag reuse is refused even after compaction hides it from the tail") {
    // the r12 ADVICE hazard: compaction commits a manifest listing
    // only the compacted unit, so a tail-only guard no longer sees a
    // pre-compaction tag — but its bytes are still referenced by the
    // older manifests time travel reads, and a reused tag's
    // mode("overwrite") staging would rewrite them
    import operators.SnapshotTable
    import spark.implicits._
    val root = Tables.sinkPath(spark, sf, "snaptag")
    new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
    SnapshotTable.commitAppendTx(
      Seq((1L, "x")).toDF("id", "who"), root, "day1")
    // simulated compaction: one unit holding the current snapshot,
    // committed as a manifest that lists ONLY it (the tail no longer
    // names data/tx_day1)
    val latest = SnapshotTable.latestVersion(root)
    SnapshotTable.readSnapshot(spark, root, latest)
      .coalesce(1).write.mode("overwrite").parquet(s"$root/data/compact_t")
    SnapshotTable.commit(root, latest + 1, Seq("data/compact_t"))
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.commitAppendTx(
        Seq((2L, "y")).toDF("id", "who"), root, "day1")
    }
    assert(e.getMessage.contains("already committed"),
      s"wrong failure: ${e.getMessage}")
    // the historical snapshot is untouched and still reconstructs
    assert(SnapshotTable.readSnapshot(spark, root, latest)
      .as[(Long, String)].collect().toSet == Set((1L, "x")))
    // a FRESH tag still commits normally after the refusal
    val v = SnapshotTable.commitAppendTx(
      Seq((2L, "y")).toDF("id", "who"), root, "day2")
    assert(v == latest + 2)
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
