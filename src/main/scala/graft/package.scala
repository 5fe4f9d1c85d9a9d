package object graft {
  /** Signature the driver contract imposes on every query:
    * (session, scale-factor dir) => result DataFrame. */
  type QFn = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Harness scratch root for `spark.local.dir` (shuffle files,
    * RocksDB state-store working dirs): the RAM disk when present,
    * else the JVM default. This box's /tmp is ext4 — RocksDB commits
    * fsync their SST/changelog staging there, and that real-disk
    * round-trip was measured as the stream family's largest remaining
    * fixed cost (StreamProf, stream_join warm 5.4 → 3.4 s from this
    * alone; r14). All of spark.local.dir's contents are throwaway by
    * construction — a production deployment points it at local NVMe,
    * which tmpfs stands in for here, same rationale as the
    * [[graft.streaming.Streaming.scratchCkpt]] checkpoint. */
  def scratchLocalDir: String = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) "/dev/shm/graft_local"
    else System.getProperty("java.io.tmpdir")
  }
}
