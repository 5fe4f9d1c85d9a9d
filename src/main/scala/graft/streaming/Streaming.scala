package graft.streaming

import graft.{QFn, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, ListState,
  MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues,
  ValueState}
import org.apache.spark.sql.types.DecimalType
import java.sql.Timestamp
import scala.jdk.CollectionConverters._

/** Structured Streaming operators (SURVEY.md §2.8) over the `events`
  * table replayed in timestamp order through a staged parquet file
  * feed ([[stagedFeed]] — the production lake-directory ingest shape).
  *
  * Each `queries` entry runs a REAL streaming query (micro-batch
  * execution, state store, watermarks) to completion and returns the
  * final sink table, so the driver's batch-shaped contract still
  * applies. Events are fed in bounded ts-ordered chunks (≥2 files,
  * one micro-batch each — see [[chunkSizeFor]]) so watermarks advance
  * mid-stream and stateful operators exercise their merge path.
  * Results equal the equivalent batch aggregation (the oracle) —
  * the streaming/batch unification Spark guarantees and the specs
  * assert.
  *
  * Scale path: swap the staged directory for Kafka/a live lake feed;
  * the query bodies are unchanged. State is keyed by high-cardinality
  * keys (user_id, window), so state stores shard across executors.
  */
object Streaming {

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

  /** `transformWithState` processor: per-user running purchase count +
    * exact decimal total in one named ValueState. */
  class PurchaseProcessor extends StatefulProcessor[Long, Ev, (Long, Long, Double)] {
    @transient private var st: ValueState[(Long, BigDecimal)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, BigDecimal)]("purchases",
        Encoders.product[(Long, BigDecimal)], TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
      val (n0, sum0) = if (st.exists()) st.get() else (0L, BigDecimal(0))
      var n = n0; var total = sum0
      rows.foreach { e => n += 1; total += BigDecimal(e.value.toString) }
      st.update((n, total))
      Iterator.single((uid, n, total.toDouble))
    }
  }

  /** `MapState` processor — the keyed-collection state variable of
    * the Spark-4 API: per user, a map of event_type → running count.
    * A composite per-key collection like this is exactly what
    * `mapGroupsWithState`'s single opaque value forces users to
    * re-serialize wholesale; `MapState` reads/writes only the touched
    * sub-keys (RocksDB point lookups). Emits the user's current
    * counts each batch. */
  class TypeCountsProcessor
      extends StatefulProcessor[Long, Ev, (Long, String, Long)] {
    @transient private var st: MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getMapState[String, Long]("typeCounts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[(Long, String, Long)] = {
      rows.foreach { e =>
        val cur = if (st.containsKey(e.event_type)) st.getValue(e.event_type) else 0L
        st.updateValue(e.event_type, cur + 1)
      }
      // materialize: the state iterator must not outlive the handler
      st.iterator().map { case (k, v) => (uid, k, v) }.toList.iterator
    }
  }

  /** `ListState` processor — the append-log state variable: per user,
    * the last 3 purchase values as a bounded recent-history window
    * (append new rows, trim to the tail — RocksDB appends, no
    * full-value rewrite). Emits the current trailing mean after each
    * batch; the feed is (ts, event_id)-ordered, so "last 3" is
    * well-defined and batch-reproducible. */
  class RecentPurchasesProcessor
      extends StatefulProcessor[Long, Ev, (Long, Long, Long, Double)] {
    @transient private var st: ListState[Double] = _
    @transient private var total: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getListState[Double]("recent",
        Encoders.scalaDouble, TTLConfig.NONE)
      total = getHandle.getValueState[Long]("total",
        Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(uid: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[(Long, Long, Long, Double)] = {
      val batch = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      batch.foreach(e => st.appendValue(e.value))
      val n = (if (total.exists()) total.get() else 0L) + batch.length
      total.update(n)
      val all = st.get().toArray
      val tail = all.takeRight(3)
      if (all.length > 3) st.put(tail) // trim: bounded per-key state
      // exact decimal sum, then ONE double division — same expression
      // shape as the oracle's CAST(sum(decimal) AS DOUBLE) / count.
      // n_total is monotone and versions the updates: the final
      // (max-n_total) row per user is the end-of-stream state.
      val mean = tail.map(v => BigDecimal(v.toString)).sum.toDouble / tail.length
      Iterator.single((uid, n, tail.length.toLong, mean))
    }
  }

  /** Event-time TIMER processor (`transformWithState`, Spark 4's
    * timer surface): per user, count events and keep a session-close
    * timer 30 minutes past the latest event; when the WATERMARK
    * passes the timer, [[handleExpiredTimer]] fires, emits the closed
    * session (closed = true) and clears the state — bounded state by
    * construction, driven by event time, the semantics
    * `mapGroupsWithState` approximates with timeout conf. Exercised
    * by the TwsTimerSpec hand-built feed. */
  class SessionTimerProcessor
      extends StatefulProcessor[Long, Ev, (Long, Long, Boolean)] {
    @transient private var st: ValueState[(Long, Long)] = _ // (n, timerMs)
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long)]("sess",
        Encoders.product[(Long, Long)], TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[(Long, Long, Boolean)] = {
      val (n0, prevTimer) = if (st.exists()) st.get() else (0L, -1L)
      var n = n0; var maxTs = Long.MinValue
      rows.foreach { e => n += 1; maxTs = math.max(maxTs, e.ts.getTime) }
      if (prevTimer >= 0) getHandle.deleteTimer(prevTimer)
      val timer = maxTs + 30L * 60 * 1000
      getHandle.registerTimer(timer)
      st.update((n, timer))
      Iterator.single((uid, n, false))
    }
    override def handleExpiredTimer(uid: Long, timerValues: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[(Long, Long, Boolean)] = {
      val n = if (st.exists()) st.get()._1 else 0L
      st.clear()
      Iterator.single((uid, n, true))
    }
  }

  /** Watermark-flush sentinels: two far-future events fed after the
    * real data. The first advances the watermark past every real
    * window; the second seals the first's own windows, so ALL real
    * windows are emitted in a DATA batch (no reliance on the trailing
    * no-data-batch flush) and only the second sentinel's windows stay
    * unsealed in state. Keys filter sentinel windows out by window
    * start (< [[SentinelGuard]]). */
  private val Sentinel1 = Timestamp.valueOf("2099-01-01 00:00:00")
  private val Sentinel2 = Timestamp.valueOf("2099-02-01 00:00:00")
  val SentinelGuard = "2090-01-01"

  /** State-store telemetry of the LAST finished streaming query run
    * through [[runStream]]: total rows across its state operators at
    * the final progress. Harness/spec diagnostic only — the
    * bounded-state assertion for the append+watermark keys (state must
    * hold only the unsealed sentinel windows, not every window ever
    * opened). */
  @volatile var lastStateRowsTotal: Long = -1L

  /** Accurate state-row totals cost RocksDB a read-before-write per
    * update (`trackTotalNumberOfRows`). Only the bounded-state specs
    * consume them ([[lastStateRowsTotal]]), so tracking is off on the
    * bench path and the specs flip it on around their assertions —
    * the same diagnostics-are-opt-in shape as
    * `collectIvfDiagnostics`. */
  @volatile var trackStateRows: Boolean = false

  /** Per-micro-batch progress JSON of the LAST [[runStream]] query —
    * harness profiling diagnostic (where does the fixed per-key cost
    * go: planning, state commit, sink write). */
  @volatile var lastProgressJson: Seq[String] = Nil

  /** Chunking rule for the staged feed: each chunk is one
    * micro-batch, so the watermark advances per chunk and multi-batch
    * progression is preserved (floor of two chunks on small data).
    * Chunk size scales with the table (≥ 50k, ≥ rows/6): a
    * micro-batch costs a near-fixed ~8 RocksDB store commits
    * regardless of its row count, so a fixed 50k chunk made batch
    * COUNT — pure harness overhead — grow linearly with data
    * (measured at the 10× replica: 20 batches per key, stream group
    * 6.9× the sf0.1 wall). Batches carry more data at scale instead
    * of multiplying. */
  private def chunkSizeFor(n: Long): Long = math.max(
    math.min(50000L, math.max(1L, (n + 1) / 2)), (n + 5) / 6)

  /** STAGED FILE FEED (r6 verdict #3 — the one untried harness shape):
    * the ts-ordered replay is written ONCE PER MACHINE as a directory
    * of parquet files — one file per chunk, modification times spaced
    * so the file source's oldest-first ordering IS the chunk order —
    * keyed by the events table's content fingerprint
    * ([[graft.IndexStore.cachedDir]], atomic publish). Every streaming
    * key then reads it through `readStream.parquet` with
    * `maxFilesPerTrigger = 1` + `Trigger.AvailableNow`: batch
    * boundaries, watermark progression, and results are identical to
    * the MemoryStream feed (file k ≡ addData slice k), but the rows
    * reach executors as a parallel parquet scan instead of
    * driver-block serialization, and the per-batch
    * addData/processAllAvailable driver round-trips disappear — this
    * is also the production ingest shape (a lake directory), so the
    * harness now measures the operator, not a test-only feed.
    *
    * Sentinel placement matches the old feed exactly: sentinel 1
    * rides WITH the last data chunk (one fewer batch — r4 item 4),
    * sentinel 2 is its own trailing file so every real window is
    * sealed and emitted in a DATA batch. `flush = false` keys get a
    * sentinel-free twin directory. */
  private def stagedFeed(s: SparkSession, d: String, flush: Boolean): String = {
    val fp = graft.IndexStore.fingerprint(s"$d/events.parquet")
    val tag = if (flush) "flush" else "plain"
    // v3: chunks come from a DISTRIBUTED ts-range write (below), not a
    // driver collect — boundaries moved, so stale v2 chunkings must
    // never be served
    graft.IndexStore.cachedDir(s"stream_feed_${tag}_v3_$fp") { tmp =>
      import s.implicits._
      import java.nio.file.{Files, Paths}
      val ev = Tables.events(s, d)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .as[Ev]
      // seeding is fully distributed (r8 verdict #6 — the old
      // collect().sortBy was a driver-OOM ceiling at 1000× replicas):
      // range-partition by ts into ceil(n/chunk) buckets and sort each
      // within. Partition file order IS global ts order, and because
      // the range key is ts ALONE, an equal-ts run can never straddle
      // a chunk boundary — which also closes the r8 ADVICE race where
      // a same-ts (view, click) pair split across micro-batches made
      // streamAsofEnrich chunk-size-dependent. Within a chunk,
      // sortWithinPartitions(ts, event_id) reproduces the old feed's
      // total order.
      val n = ev.count()
      val nChunks = math.max(1L,
        (n + chunkSizeFor(n) - 1) / chunkSizeFor(n)).toInt
      val withS1 =
        if (flush) ev.union(s.createDataset(
          Seq(Ev(-1L, Sentinel1, -1L, "__flush__", 0.0, ""))))
        else ev
      val stage = s"$tmp/_stage"
      withS1
        .repartitionByRange(nChunks, col("ts"))
        .sortWithinPartitions(col("ts"), col("event_id"))
        .write.parquet(stage)
      val dir = Paths.get(tmp)
      Files.createDirectories(dir)
      // part-file NAMES carry the partition (= ts-range) order
      val parts = {
        val l = Files.list(Paths.get(stage))
        try l.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .toSeq.sortBy(_.getFileName.toString)
        finally l.close()
      }
      val moved = parts.zipWithIndex.map { case (part, i) =>
        val target = dir.resolve(f"feed_$i%03d.parquet")
        Files.move(part, target)
        (target, i)
      }
      // sentinel 2 gets its own trailing file so every real window is
      // sealed and emitted in a DATA batch (sentinel 1 rode with the
      // last data chunk: its 2099 ts range-partitions it there)
      val allFiles = if (flush) {
        val s2stage = s"$tmp/_stage_s2"
        s.createDataset(Seq(Ev(-2L, Sentinel2, -1L, "__flush__", 0.0, "")))
          .coalesce(1).write.parquet(s2stage)
        val s2 = {
          val l = Files.list(Paths.get(s2stage))
          try l.iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .toSeq.head
          finally l.close()
        }
        val target = dir.resolve(f"feed_${moved.size}%03d.parquet")
        Files.move(s2, target)
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s2stage))
        moved :+ (target, moved.size)
      } else moved
      // explicit 2 s mtime spacing: FileStreamSource orders by
      // modification time, and same-millisecond writes would make
      // the chunk order nondeterministic
      allFiles.foreach { case (target, i) =>
        Files.setLastModifiedTime(target,
          java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 2000L))
      }
      // the multi-batch guarantee ("≥2 files, one micro-batch each")
      // rests on repartitionByRange yielding ≥2 non-empty range
      // partitions; with degenerate (near-constant) ts all rows could
      // collapse into one and flush=false feeds would silently lose
      // their mid-stream watermark advance — fail loudly instead
      require(n < 2 || allFiles.size >= 2,
        s"stagedFeed($tag): degenerate chunking — $n rows landed in " +
          s"${allFiles.size} file(s); ts range cannot support ≥2 micro-batches")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
    }
  }

  /** Harness checkpoint dir on tmpfs: the per-batch state commit
    * fsyncs its changelog files to the checkpoint dir, and at
    * ~0.4-0.6 s of file-sync per micro-batch that disk round-trip WAS
    * most of the fixed per-key cost (measured via StreamProf). A
    * bench-harness checkpoint is throwaway by construction (each run
    * starts fresh or resumes within the same key invocation), so
    * RAM-disk durability is exactly right HERE — a production
    * deployment keeps its checkpoint on durable storage and pays that
    * fsync as the price of exactly-once. */
  def scratchCkpt(tag: String): String = {
    val shm = new java.io.File("/dev/shm")
    val root = if (shm.isDirectory && shm.canWrite) "/dev/shm"
      else System.getProperty("java.io.tmpdir")
    sweepStaleCkpts(root)
    s"$root/graft_ckpt_$tag"
  }

  /** Stale-checkpoint sweep (r14, same hygiene class as
    * IndexStore.sweep): runStream deletes ITS checkpoint after each
    * query, but the resume-contract keys (`stream_file_source`,
    * `stream_incremental_resume`, foreachBatch) key theirs by
    * APPLICATION id — the next JVM's pre-start clear can't reach the
    * previous JVM's dirs, and hundreds of graft_ckpt_* dirs had
    * accumulated on the RAM disk. Once per JVM, best-effort delete
    * sibling graft_ckpt_* entries stale for 6+ hours. Staleness is
    * the NEWEST mtime within the tree's top two levels, not the root
    * dir's (r14 review: batch commits write into offsets/commits/
    * state SUBDIRS and never bump the root, so a long-lived live
    * query's root mtime is frozen at creation — the offsets/ dir,
    * one level down, gains a file per batch and is always fresh on a
    * live checkpoint). Crashed-JVM leftovers under graft_local/
    * (blockmgr-*, spark-*) age out by the same rule. */
  private val ckptSwept = new java.util.concurrent.atomic.AtomicBoolean(false)
  private def sweepStaleCkpts(root: String): Unit =
    if (ckptSwept.compareAndSet(false, true)) try {
      val cutoff = System.currentTimeMillis() - 6L * 3600 * 1000
      def newestMtime(f: java.io.File, depth: Int): Long = {
        val own = f.lastModified()
        if (depth == 0 || !f.isDirectory) own
        else Option(f.listFiles()).getOrElse(Array.empty)
          .foldLeft(own)((m, c) => math.max(m, newestMtime(c, depth - 1)))
      }
      def reap(f: java.io.File): Unit =
        if (newestMtime(f, 2) < cutoff) {
          try new scala.reflect.io.Directory(f).deleteRecursively()
          catch { case _: Throwable => () }
        }
      Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("graft_ckpt_")).foreach(reap)
      Option(new java.io.File(root, "graft_local").listFiles())
        .getOrElse(Array.empty).foreach(reap)
    } catch { case _: Throwable => () }

  /** Replay events through `build`, return the materialized sink.
    * All queries run on the RocksDB state store provider — the
    * production backend (bounded executor heap; state spills to local
    * disk + changelog), pinned here so every stateful key exercises
    * it. With `flush = true` the sentinel feed (above) seals all real
    * event-time windows for Append-mode emission.
    *
    * SINK CHOICE (r10, found by the 300× ladder rung): Append-mode
    * queries write a PARQUET FILE SINK and the result is read back
    * through its `_spark_metadata` log — never the memory sink. The
    * memory sink accumulates every emitted row ON THE DRIVER, and
    * Append output for keys like `stream_dedup` is proportional to
    * EVENT VOLUME: at the 300× replica (30 M events) the read-back of
    * the driver-held rows serialized an 88 MB ParallelCollection task,
    * OOM'd a 24 g heap, killed the scheduler endpoint and hung AQE.
    * The file sink is also the production shape — results land as an
    * exactly-once parquet table, distributed end to end. Update-mode
    * queries (the stateful quartet) keep the memory sink: file sinks
    * don't support Update, and their output is bounded by STATE
    * cardinality (users × batch count), not event volume — the same
    * bound their state story already guarantees. */
  /** SINGLE-LIVE-HANDLE constraint (r10 ADVICE): the Append-mode sink
    * dir is keyed by (key, dataset, app) and deleteRecursively'd
    * before each start, so the DataFrame returned by an EARLIER
    * runStream call for the same triple is invalidated the moment the
    * key reruns in-session — hold at most one live read-back per
    * (key, dataset) and materialize it before rerunning the key.
    * Every current caller (Verify's immediate write, Bench's
    * immediate count, the specs' collect) does; a per-invocation dir
    * would lift the constraint but accumulates event-volume-sized
    * results per rerun until JVM exit (GBs × passes at the 300×
    * rung), which is the wrong trade for a bench harness. */
  private def runStream(s: SparkSession, d: String,
      mode: OutputMode, name: String,
      extraConfs: Map[String, String] = Map.empty,
      flush: Boolean = false,
      feedPath: Option[String] = None)(build: DataFrame => DataFrame): DataFrame = {
    val feed = feedPath.getOrElse(stagedFeed(s, d, flush))
    val sinkName = s"${name}_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    // fewer state partitions: each stateful operator commits one state
    // store per shuffle partition per micro-batch; at this volume the
    // per-store checkpoint overhead dominates, so 8 beats 32 — and the
    // r12 A/B took it further: a stream-stream join holds FOUR store
    // instances per partition, so 8 partitions = 32 per-batch changelog
    // commits + loads; at 4 that halves and the family benched 67.6 →
    // 55.0 s (stream_join_semi warm 8.1 → 4.6 s in StreamProf), while
    // 2 went CPU-bound (5.8 s) — 4 is the measured knee. Pinned at
    // query start (state partitioning is fixed for the query's life);
    // previous values restored immediately after start. A production
    // deployment sizes this to state volume, not harness latency.
    val confs = Map(
      "spark.sql.shuffle.partitions" ->
        sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "4"),
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      // commit a small changelog per batch instead of a full RocksDB
      // snapshot zip — the production durability mode for frequent
      // micro-batches (snapshots still happen, in the background
      // maintenance thread). Env knob for A/B only (r13 verdict #3
      // candidate: per-batch zips could beat changelogs on a tmpfs
      // checkpoint); measured on stream_join warm: OFF was not faster
      // (see Bench scaladoc) so the production mode stays the default.
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
        sys.env.getOrElse("SPARK_GRAFT_STREAM_CHANGELOG", "true"),
      "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows" ->
        trackStateRows.toString,
      // stream-stream joins at state format v3 (r13): the four join
      // state stores live as VIRTUAL COLUMN FAMILIES in ONE RocksDB
      // instance per partition instead of four instances — quartering
      // the per-batch instance-commit count the r12 partition-knee
      // A/B identified as the family's fixed cost. Measured
      // like-for-like (N=2 subset bench, sf0.1, v3 window dirtier):
      // the 5 join keys 22.1 -> 14.7 s total, every key improved
      // (stream_join 5.6 -> 2.4 s); rate_vs_baseline 1.09 -> 0.73.
      // Safe to pin: checkpoints here are per-run throwaway, so no
      // cross-version checkpoint compat surface exists.
      // Partition knee RE-MEASURED under v3 (don't retry): the r12
      // 8→4 win was instance-commit-count driven, so v3's single
      // instance could have moved the knee — it didn't: join family
      // N=2 totals 13.2 s (4 parts) vs 15.4 s (2, CPU-bound) vs
      // 19.0 s (8, per-store floor) — 4 stays optimal.
      "spark.sql.streaming.join.stateFormatVersion" -> "3",
      // every batch here is ~0.4 s of task-scheduling + state-store
      // floor, and watermark advancement after each data batch was
      // spawning a no-data batch right behind it (6 batches per key
      // for a 3-addData feed — measured via StreamProf). The sentinel
      // feed seals every real window inside DATA batches, so the
      // no-data batches contribute nothing to the sink and eviction
      // just moves to the next data batch: halve the batch count
      "spark.sql.streaming.noDataMicroBatches.enabled" -> "false"
    ) ++ extraConfs
    val prev = confs.keys.map(k => k -> s.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    val ckpt = scratchCkpt(sinkName)
    val append = mode == OutputMode.Append()
    // file-sink output path: keyed by (key, dataset, app) and cleared
    // before start, so repeated runs in one session can't accumulate
    // stale batches or unbounded tmp growth. NOT /dev/shm — at 300×
    // an event-volume-proportional result is GBs, which on tmpfs is
    // RAM. The dir must OUTLIVE this call (the returned DataFrame
    // reads it lazily), so cleanup is a JVM shutdown hook over every
    // sink dir this session created — without it each session leaked
    // its app-id-keyed dirs forever (unreachable by the next app's
    // pre-start clear; r10 review finding).
    val outPath = s"${System.getProperty("java.io.tmpdir")}/graft_sink_" +
      s"${name}_${d.hashCode & 0x7fffffff}_${s.sparkContext.applicationId}"
    registerSinkDirCleanup(outPath)
    var outSchema: org.apache.spark.sql.types.StructType = null
    val q = try {
      val src = s.readStream.schema(Encoders.product[Ev].schema)
        .option("maxFilesPerTrigger", "1").parquet(feed)
      val streamed = build(src)
      outSchema = streamed.schema
      val w = streamed.writeStream.outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      if (append) {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(outPath)).deleteRecursively()
        w.format("parquet").option("path", outPath).start()
      } else w.format("memory").queryName(sinkName).start()
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
    try {
      // AvailableNow drains the staged files (one batch per file, the
      // same boundaries the addData feed produced) and stops itself
      q.awaitTermination()
      lastStateRowsTotal = Option(q.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      lastProgressJson = q.recentProgress.map(_.json).toSeq
    } finally {
      q.stop()
      // tmpfs is a shared finite resource: reclaim the throwaway
      // checkpoint as soon as the query is done
      import scala.reflect.io.Directory
      new Directory(new java.io.File(ckpt)).deleteRecursively()
    }
    // explicit schema: a key whose every batch emitted zero rows has a
    // _spark_metadata log but no part files — schema inference would
    // throw where "empty result" is the correct answer
    if (append) s.read.schema(outSchema).parquet(outPath)
    else s.table(sinkName)
  }

  // Sink dirs created this session, deleted at JVM exit (one hook,
  // registered on first use). Live read-backs are session-scoped, so
  // exit is the earliest safe point; other concurrent JVMs' dirs are
  // never touched (their app id differs).
  private val sinkDirs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val sinkHook: Unit = sys.addShutdownHook {
    import scala.reflect.io.Directory
    sinkDirs.forEach(p => new Directory(new java.io.File(p)).deleteRecursively())
  }
  private def registerSinkDirCleanup(p: String): Unit = {
    sinkHook; sinkDirs.add(p)
  }

  private def dsum2(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(30, 2))).cast("double")
  private def csum2(c: org.apache.spark.sql.Column) = graft.Det.csum2(c)

  /** 1-hour tumbling windows × event_type — watermark + APPEND, the
    * production shape: a window's state row is emitted once when the
    * watermark seals it and then EVICTED, so state holds only open
    * windows (bounded by the watermark horizon), not every window
    * ever seen, and the sink is written once per window instead of
    * re-emitting the whole result table each micro-batch. The
    * sentinel feed seals the trailing windows so the batch-equivalence
    * oracle still sees the complete result. */
  val streamTumbling: QFn = (s, d) =>
    runStream(s, d, OutputMode.Append(), "tumbling", flush = true) { df =>
      df.withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum2(col("value")).as("sum_value"))
    }.select(col("window.start").as("w_start"), col("event_type"),
      col("n"), col("sum_value"))
      .filter(col("w_start") < SentinelGuard)
      .orderBy("w_start", "event_type")

  /** STREAM–STATIC dimension join — the enrichment shape Structured
    * Streaming treats specially: the static side is a plain batch
    * DataFrame (here a per-user activity profile aggregated once from
    * the events table — "the serving-side dim snapshot"), joined into
    * every micro-batch STATELESSLY (no watermark bookkeeping, no join
    * state store — unlike the stream-stream family) and broadcast so
    * the streaming side never shuffles for the join. The watermark is
    * applied BEFORE the join so the flush sentinels (whose user_id
    * joins nothing) still advance event time and seal every real
    * window. Flushed result equals the batch join + hour aggregate
    * exactly — the oracle. At 100 TB the static side is the small
    * dimension by construction (a profile table), which is what makes
    * per-batch broadcast the right physical plan. */
  /** STREAMING quote summary — the namesake `ts_bidask_spread` shape
    * run the way a production tick pipeline actually runs it: quotes
    * arrive as a stream, both sides aggregate in ONE watermarked
    * tumbling window (conditional exact-decimal sums — no second
    * stateful operator for the second side), and the derived
    * spread/mid/bps columns are stateless post-window arithmetic.
    * Flushed result equals the batch key exactly, so the ORACLE IS
    * `ts_bidask_spread`'s (1-hour tumbling windows coincide with
    * `date_trunc('hour')`). Sentinel flush rows carry event_type
    * `__flush__`, so both conditional sides ignore them by
    * construction and their window falls beyond the guard. */
  val streamBidaskSpread: QFn = (s, d) => {
    val bidv = when(col("event_type") === "view", col("value"))
    val askv = when(col("event_type") === "purchase", col("value"))
    runStream(s, d, OutputMode.Append(), "bidask", flush = true) { df =>
      df.withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(
          csum2(bidv).as("bid_c"), count(bidv).as("n_bid"),
          csum2(askv).as("ask_c"), count(askv).as("n_ask"))
    }.select(col("window.start").as("bar"), col("bid_c"), col("n_bid"),
        col("ask_c"), col("n_ask"))
      .filter(col("bar") < SentinelGuard)
      .filter(col("n_bid") > 0 && col("n_ask") > 0)
      // identical post-window integer micro-unit arithmetic as the
      // batch namesake key (shared oracle) — see tsBidaskSpread's
      // scaladoc for the div-vs-// sign contract
      .withColumn("bid_micro", expr("bid_c * 10000 div n_bid"))
      .withColumn("ask_micro", expr("ask_c * 10000 div n_ask"))
      .withColumn("spread_micro", col("ask_micro") - col("bid_micro"))
      .withColumn("mid_micro", expr("(bid_micro + ask_micro) div 2"))
      .select(
        col("bar"), col("bid_micro"), col("ask_micro"),
        col("spread_micro"), col("mid_micro"),
        when(col("mid_micro") > 0,
          when(col("spread_micro") < 0, lit(-1L)).otherwise(lit(1L)) *
            expr("abs(spread_micro) * 1000000 div mid_micro"))
          .as("spread_bps_c"),
        col("n_bid"), col("n_ask"))
      .orderBy("bar")
  }

  /** STREAMING TEMPORAL JOIN (as-of enrichment) — the Flink
    * "temporal table join" shape Structured Streaming has no built-in
    * operator for: every trade ('click') is enriched with the
    * PREVAILING quote ('view') for its key, from per-key
    * `flatMapGroupsWithState` state holding the latest quote
    * (ts, value). Inside each micro-batch the group iterates in
    * event-time order with quotes ahead of trades at equal
    * timestamps, and an equal-ts quote replaces state only with a
    * larger value — exactly the batch semantics (quotes deduplicated
    * per (key, ts) to max value, backward match with `<=`), so the
    * flushed result equals the NATIVE as-of join bit-for-bit and the
    * oracle is the same correlated-subquery SQL. Relies on the
    * harness feed's global event-time order across micro-batches —
    * [[stagedFeed]] range-partitions by ts alone, so an equal-ts run
    * (e.g. a same-ts view+click pair for one user) can never straddle
    * a micro-batch boundary (the r8 ADVICE race) — the production
    * deployment of this pattern delays emission by a watermark
    * instead, which is the documented trade (`stream_late_data`
    * covers the disorder story). State is O(1) per key: ONE quote,
    * not a buffer. */
  val streamAsofEnrich: QFn = (s, d) => {
    runStream(s, d, OutputMode.Append(), "asof_enrich") { df =>
      import df.sparkSession.implicits._
      df.filter(col("event_type").isin("view", "click")).as[Ev]
        .groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Append(),
            GroupStateTimeout.NoTimeout()) {
          (uid: Long, evs: Iterator[Ev], state: GroupState[(Long, Double)]) =>
            var st = state.getOption
            val out = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Long, Timestamp, Option[Double])]
            evs.toSeq.sortBy(e =>
              (e.ts.getTime, if (e.event_type == "view") 0 else 1, e.event_id))
              .foreach { e =>
                if (e.event_type == "view") {
                  val t = e.ts.getTime
                  st = st match {
                    case Some((pt, pv)) if pt > t || (pt == t && pv >= e.value) => st
                    case _ => Some((t, e.value))
                  }
                } else out += ((e.event_id, uid, e.ts, st.map(_._2)))
              }
            st.foreach(state.update)
            out.iterator
        }.toDF("event_id", "user_id", "ts", "mid")
    }.orderBy("event_id")
  }

  /** Tick row for the streaming CEP state function: price already in
    * exact integer cents (cast in Spark SQL, not JVM code). */
  case class CepTick(event_id: Long, ts: Timestamp, user_id: Long, vc: Long)

  /** STREAMING CEP — the Flink-CEP headline capability as a
    * Structured Streaming stateful operator: `ts_cep_pattern`'s
    * V-reversal (three strictly-falling ticks then an up-tick off
    * the trough) detected ONLINE over the click stream, one output
    * row per match as it happens. Per-user `flatMapGroupsWithState`
    * holds the pattern's bounded lookback — the last three tick
    * prices in cents — which IS the compiled state of a
    * bounded-length CEP pattern: O(1) per key, no buffering, no
    * re-scan, so state volume is #users regardless of tick volume.
    * Cents come from the same DECIMAL(30,2)·100 cast as the batch
    * key, computed in Spark SQL BEFORE the state function so no JVM
    * double-rounding can diverge. Within a micro-batch the group
    * iterates in full-resolution event-time order (ms + nanos,
    * event_id tiebreak — the batch window's (ts, event_id) total
    * order); across batches [[stagedFeed]]'s ts-range chunking
    * keeps global order and never splits an equal-ts run, so the
    * flushed match set equals the batch lag-window formulation row
    * for row — and the oracle IS that independent formulation. */
  /** The CEP stream transformation, factored from [[streamCepPattern]]
    * so StreamRecoverySpec can drive the same state machine through a
    * kill-resume checkpoint cycle. */
  def cepStream(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.filter(col("event_type") === "click")
      .select(col("event_id"), col("ts"), col("user_id"),
        graft.Det.cents(col("value")).as("vc"))
      .as[CepTick]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
          GroupStateTimeout.NoTimeout()) {
        (uid: Long, ticks: Iterator[CepTick],
         state: GroupState[(Int, Long, Long, Long)]) =>
          // (n seen, last, second-last, third-last)
          var (n, v1, v2, v3) = state.getOption.getOrElse((0, 0L, 0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Timestamp, Long, Long)]
          ticks.toSeq
            .sortBy(t => (t.ts.getTime, t.ts.getNanos, t.event_id))
            .foreach { t =>
              if (n >= 3 && v3 > v2 && v2 > v1 && t.vc > v1)
                out += ((t.event_id, uid, t.ts, t.vc - v1, v3 - v1))
              v3 = v2; v2 = v1; v1 = t.vc; n = math.min(n + 1, 3)
            }
          state.update((n, v1, v2, v3))
          out.iterator
      }.toDF("event_id", "user_id", "ts", "rebound_cents", "depth_cents")
  }

  val streamCepPattern: QFn = (s, d) =>
    runStream(s, d, OutputMode.Append(), "cep_pattern")(cepStream)
      .orderBy("event_id")

  val streamStaticJoin: QFn = (s, d) => {
    val profile = Tables.events(s, d)
      .groupBy("user_id").agg(count(lit(1)).as("user_events"))
      .select(col("user_id"), expr("user_events div 20").as("band"))
    runStream(s, d, OutputMode.Append(), "static_join", flush = true) { df =>
      df.withWatermark("ts", "1 hour")
        .join(broadcast(profile), "user_id")
        .groupBy(window(col("ts"), "1 hour"), col("band"))
        .agg(count(lit(1)).as("n"), dsum2(col("value")).as("sum_value"))
    }.select(col("window.start").as("w_start"), col("band"),
      col("n"), col("sum_value"))
      .filter(col("w_start") < SentinelGuard)
      .orderBy("w_start", "band")
  }

  /** CHAINED time-window aggregations — two stateful operators in ONE
    * streaming query (a Spark-4 capability: `window(window_col, ...)`
    * re-windows the struct output of an upstream windowed agg):
    * 15-minute partials roll up into 1-hour finals, both under the
    * same watermark in Append mode. This is the production pre-agg
    * cascade (fine-grain state for freshness, coarse-grain emission
    * for the serving table) without a foreachBatch seam; each
    * operator's state stays bounded by the watermark horizon. The
    * 15-minute sums are exact decimal-summed 2-decimal values, so the
    * hour-level re-sum is exact too and the final table equals the
    * direct batch hour aggregate — the oracle. */
  val streamChainedAgg: QFn = (s, d) =>
    runStream(s, d, OutputMode.Append(), "chain", flush = true) { df =>
      val quarter = df.withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("qn"), dsum2(col("value")).as("qsum"))
      quarter
        .groupBy(window(col("window"), "1 hour"), col("event_type"))
        .agg(sum("qn").as("n"),
          sum(col("qsum").cast(DecimalType(30, 2))).cast("double").as("sum_value"))
    }.select(col("window.start").as("w_start"), col("event_type"),
      col("n"), col("sum_value"))
      .filter(col("w_start") < SentinelGuard)
      .orderBy("w_start", "event_type")

  /** 1-hour windows sliding every 15 minutes — watermark + APPEND
    * (same bounded-state shape as [[streamTumbling]]; the 4× window
    * fan-out makes unbounded Complete-mode state the canonical
    * streaming scale-killer, so eviction matters most here). */
  val streamSliding: QFn = (s, d) =>
    runStream(s, d, OutputMode.Append(), "sliding", flush = true) { df =>
      df.withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n"), dsum2(col("value")).as("sum_value"))
    }.select(col("window.start").as("w_start"), col("n"), col("sum_value"))
      .filter(col("w_start") < SentinelGuard)
      .orderBy("w_start")

  /** Per-user session windows, 30-minute gap — watermark + APPEND:
    * a session is emitted exactly once, when the watermark passes its
    * close, and its state is evicted; only sessions still open within
    * the watermark horizon occupy the store. */
  val streamSession: QFn = (s, d) =>
    runStream(s, d, OutputMode.Append(), "session", flush = true) { df =>
      df.withWatermark("ts", "1 hour")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"), dsum2(col("value")).as("sum_value"))
    }.select(col("session_window.start").as("sess_start"), col("user_id"),
      col("n"), col("sum_value"))
      .filter(col("sess_start") < SentinelGuard)
      .orderBy("user_id", "sess_start")

  /** Append mode + 1-hour watermark: only windows sealed by the final
    * watermark are emitted. The late-row *drop* path is exercised in
    * the spec with a hand-built out-of-order feed; here the contract
    * is "append emits exactly the closed windows". */
  val streamLateData: QFn = (s, d) =>
    runStream(s, d, OutputMode.Append(), "late") { df =>
      df.withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
    }.select(col("window.start").as("w_start"), col("event_type"), col("n"))
      .orderBy("w_start", "event_type")

  /** DISORDERED feed for the oracled late-data key: five files, five
    * micro-batches.
    *   file0 — the "on-time" cohort (ts < S, S = day-truncated min ts
    *           + 15 days) PLUS every max-ts row (the fast arrival that
    *           races the watermark forward to M − 1h),
    *   file1 — a one-row eviction TICK (ts = M, marker event_type):
    *           end-of-batch eviction must run once against the M − 1h
    *           watermark BEFORE the late rows arrive, or they merge
    *           into still-live state and are never counted late,
    *   file2 — the LATE cohort (ts ∈ [S, M)), delivered after the
    *           watermark has already passed most of it,
    *   file3/4 — the usual two flush sentinels.
    * Each cohort is ONE file (one micro-batch): if file0 split, a
    * sub-batch after the max-ts row would itself be late-filtered and
    * the drop set would depend on chunking instead of the advertised
    * contract. */
  private def lateFeed(s: SparkSession, d: String): String = {
    val fp = graft.IndexStore.fingerprint(s"$d/events.parquet")
    graft.IndexStore.cachedDir(s"stream_feed_late_v1_$fp") { tmp =>
      import s.implicits._
      import java.nio.file.{Files, Paths}
      val ev = Tables.events(s, d)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
      val b = ev.agg(
        (date_trunc("day", min(col("ts"))) + expr("INTERVAL 15 DAYS")).as("s"),
        max(col("ts")).as("m")).head()
      val sCut = b.getTimestamp(0); val mTs = b.getTimestamp(1)
      val dir = Paths.get(tmp)
      Files.createDirectories(dir)
      def stageOne(df: DataFrame, idx: Int): Unit = {
        val stage = s"$tmp/_stage$idx"
        df.coalesce(1).sortWithinPartitions("ts", "event_id")
          .write.parquet(stage)
        val part = {
          val l = Files.list(Paths.get(stage))
          try l.iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.head
          finally l.close()
        }
        val target = dir.resolve(f"feed_$idx%03d.parquet")
        Files.move(part, target)
        Files.setLastModifiedTime(target,
          java.nio.file.attribute.FileTime.fromMillis(1000000000000L + idx * 2000L))
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
      }
      stageOne(ev.filter(col("ts") < lit(sCut) || col("ts") === lit(mTs)), 0)
      // a one-row "tick" batch between the fast arrival and the late
      // cohort: state eviction runs at END-of-batch against that
      // batch's operative watermark (M − 1h, set by batch 0's fast
      // arrival), so without this batch the late rows would merge
      // into still-live state and nothing would ever be late
      // (measured in r9: zero numRowsDroppedByWatermark on a 2-batch
      // feed). The tick's ts = M leaves the watermark where it is;
      // its marker event_type is filtered from the result.
      stageOne(s.createDataset(
        Seq(Ev(-3L, mTs, -1L, "__tick__", 0.0, ""))).toDF(), 1)
      stageOne(ev.filter(col("ts") >= lit(sCut) && col("ts") < lit(mTs)), 2)
      stageOne(s.createDataset(
        Seq(Ev(-1L, Sentinel1, -1L, "__flush__", 0.0, ""))).toDF(), 3)
      stageOne(s.createDataset(
        Seq(Ev(-2L, Sentinel2, -1L, "__flush__", 0.0, ""))).toDF(), 4)
    }
  }

  /** LATE DATA with a batch-formulated ORACLE (r8 verdict item 5):
    * the disordered [[lateFeed]] makes the watermark race ahead of a
    * 15-day cohort, so the hourly aggregate's final flushed state
    * must equal the batch aggregate over exactly the rows Spark's
    * late-row filter admits: the on-time cohort, the fast arrival,
    * and the late rows whose window the watermark (M − 1h) had not
    * yet sealed. That drop rule is pure SQL over (S, M), which is
    * what makes an end-state oracle possible where the unflushed
    * `stream_late_data` key (emission timing, not end state) stays
    * contract-exempt. */
  val streamLateDataFinal: QFn = (s, d) =>
    runStream(s, d, OutputMode.Append(), "late_final",
        feedPath = Some(lateFeed(s, d))) { df =>
      df.withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
    }.select(col("window.start").as("w_start"), col("event_type"), col("n"))
      .filter(col("w_start") < SentinelGuard && col("event_type") =!= "__tick__")
      .orderBy("w_start", "event_type")

  /** Exactly-once dedup on event_id with BOUNDED state: the feed
    * duplicates every event (union with itself), and
    * `dropDuplicatesWithinWatermark` restores uniqueness while letting
    * the state store evict ids once the 1-hour watermark passes them —
    * a plain `dropDuplicates` keeps every id ever seen, which on a real
    * stream grows without bound. Duplicates here arrive in the same
    * micro-batch, so they are always within the horizon. The unique
    * stream lands in the sink (append — dedup emits on first sight);
    * the aggregate over it is batch-side, keeping one stateful operator
    * per query. The spec additionally drives the eviction/late-drop
    * path with a hand-built feed. */
  val streamDedup: QFn = (s, d) => {
    val uniq = runStream(s, d, OutputMode.Append(), "dedup") { df =>
      df.union(df)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("event_id")
    }
    uniq.groupBy("event_type")
      .agg(count(lit(1)).as("n"), dsum2(col("value")).as("sum_value"))
      .orderBy("event_type")
  }

  /** Custom state: per-user running purchase count + total via
    * mapGroupsWithState (update mode). The sink accumulates one row
    * per state update; the final state per user is the row with the
    * highest event count — compared against the batch aggregate. */
  val streamStateful: QFn = (s, d) => {
    val updates = runStream(s, d, OutputMode.Update(), "stateful") { df =>
      import df.sparkSession.implicits._
      df.filter(col("event_type") === "purchase").as[Ev]
        .groupByKey(_.user_id)
        .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
          (uid: Long, evs: Iterator[Ev], state: GroupState[(Long, BigDecimal)]) =>
            val (n0, sum0) = state.getOption.getOrElse((0L, BigDecimal(0)))
            var n = n0; var total = sum0
            evs.foreach { e => n += 1; total += BigDecimal(e.value.toString) }
            state.update((n, total))
            (uid, n, total.toDouble)
        }.toDF("user_id", "n_purchases", "total_value")
    }
    // final state = the update with the max purchase count per user
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("n_purchases").desc)
    updates.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("user_id", "n_purchases", "total_value")
      .orderBy("user_id")
  }

  /** The Spark-4 stateful surface: the same per-user running purchase
    * aggregate as [[streamStateful]], expressed as a
    * `StatefulProcessor` run through `transformWithState` (update
    * mode, no timers). State lives in a named `ValueState` — the new
    * API's composable state-variable model (vs. mapGroupsWithState's
    * single opaque value), with TTL available for bounded retention.
    * Requires the RocksDB state store provider — which [[runStream]]
    * pins for every streaming key. */
  val streamStatefulTws: QFn = (s, d) => {
    val updates = runStream(s, d, OutputMode.Update(), "stateful_tws") { df =>
      import df.sparkSession.implicits._
      df.filter(col("event_type") === "purchase").as[Ev]
        .groupByKey(_.user_id)
        .transformWithState[(Long, Long, Double)](new PurchaseProcessor(),
          TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "n_purchases", "total_value")
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("n_purchases").desc)
    updates.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("user_id", "n_purchases", "total_value")
      .orderBy("user_id")
  }

  /** [[TypeCountsProcessor]] through `transformWithState` — per-user
    * event-type counts in a `MapState`. Final state (max count per
    * (user, type) across the update stream) equals the batch
    * group-count, which is the DuckDB oracle. */
  val streamStatefulMap: QFn = (s, d) => {
    val updates = runStream(s, d, OutputMode.Update(), "stateful_map") { df =>
      import df.sparkSession.implicits._
      df.as[Ev]
        .groupByKey(_.user_id)
        .transformWithState[(Long, String, Long)](new TypeCountsProcessor(),
          TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "event_type", "n")
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy(col("n").desc)
    updates.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("user_id", "event_type", "n")
      .orderBy("user_id", "event_type")
  }

  /** [[RecentPurchasesProcessor]] through `transformWithState` —
    * trailing-3 purchase mean per user in a `ListState`. Final
    * update per user equals the batch last-3 aggregate (the feed is
    * time-ordered), which is the DuckDB oracle. */
  val streamStatefulList: QFn = (s, d) => {
    val updates = runStream(s, d, OutputMode.Update(), "stateful_list") { df =>
      import df.sparkSession.implicits._
      df.filter(col("event_type") === "purchase").as[Ev]
        .groupByKey(_.user_id)
        .transformWithState[(Long, Long, Long, Double)](
          new RecentPurchasesProcessor(), TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "n_total", "n_recent", "recent_mean")
    }
    // final state = the max-n_total (monotone version) row per user
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("n_total").desc)
    updates.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("user_id", "n_total", "n_recent", "recent_mean")
      .orderBy("user_id")
  }

  /** Stream-stream inner join: each purchase joined to the same
    * user's clicks in the preceding hour. Both sides are watermarked
    * so the state store can evict; append mode. The oracle is the
    * identical batch interval join. */
  val streamJoin: QFn = (s, d) =>
    runStream(s, d, OutputMode.Append(), "sjoin") { df =>
      val clicks = df.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("click_id"))
        .withWatermark("c_ts", "1 hour")
      val purchases = df.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("purchase_id"), col("value"))
        .withWatermark("p_ts", "1 hour")
      purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"))
    }.select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"))
      .orderBy("purchase_id", "click_id")

  /** LEFT OUTER stream-stream join — the semantics inner joins can't
    * show: an unmatched purchase may only emit (with a null click)
    * once the watermark proves no matching click can still arrive, so
    * null rows surface on WATERMARK ADVANCEMENT, not on data arrival.
    * The flush feed makes this fully oracle-able: the sentinels push
    * both sides' watermarks past every real timestamp, sealing and
    * emitting ALL outer state, so the result equals the batch left
    * join exactly — no tail-horizon carve-out needed. Watermarks are
    * applied BEFORE the type filters (sentinels carry their own
    * event_type, and a filtered-first stream would never see them);
    * sentinel rows ride user_id −1 and drop out at the end. */
  val streamJoinOuter: QFn = (s, d) =>
    runStream(s, d, OutputMode.Append(), "sjoino", flush = true) { df =>
      val clicks = df.filter(col("event_type").isin("click", "__flush__"))
        .withWatermark("ts", "1 hour")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("click_id"))
      val purchases = df.filter(col("event_type").isin("purchase", "__flush__"))
        .withWatermark("ts", "1 hour")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("purchase_id"), col("value"))
      purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"),
        "left_outer")
    }.filter(col("p_user") =!= -1)
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"))
      .orderBy("purchase_id", "click_id")

  /** FULL OUTER stream-stream join — null rows can surface on EITHER
    * side: an unmatched purchase emits (null click) and an unmatched
    * click emits (null purchase), each only once the watermark proves
    * no partner can still arrive. Same sentinel-seal contract as
    * [[streamJoinOuter]]: the flush feed pushes both watermarks past
    * every real timestamp, so state for BOTH sides is sealed and the
    * result equals the batch FULL join exactly. Sentinel rows ride
    * user_id −1 on whichever side is present (a sentinel can only
    * match the other sentinel — real user_ids are positive — so
    * `coalesce` over the two user columns identifies them even when
    * one side is null). */
  val streamJoinFullOuter: QFn = (s, d) =>
    runStream(s, d, OutputMode.Append(), "sjoinfo", flush = true) { df =>
      val clicks = df.filter(col("event_type").isin("click", "__flush__"))
        .withWatermark("ts", "1 hour")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("click_id"))
      val purchases = df.filter(col("event_type").isin("purchase", "__flush__"))
        .withWatermark("ts", "1 hour")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("purchase_id"), col("value"))
      purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"),
        "full_outer")
    }.filter(coalesce(col("p_user"), col("c_user")) =!= -1)
      .select(col("purchase_id"), col("click_id"),
        coalesce(col("p_user"), col("c_user")).as("user_id"))
      .orderBy("purchase_id", "click_id")

  /** RIGHT OUTER stream-stream join — the mirror of
    * [[streamJoinOuter]]: every click emits, with a null purchase if
    * the watermark proves none arrived in [c_ts, c_ts + 1h]. The
    * click side is never null in the output, so sentinel filtering
    * needs only `c_user` (a sentinel purchase can match only the
    * sentinel click). Equals the batch RIGHT join under the flush
    * feed. */
  val streamJoinRightOuter: QFn = (s, d) =>
    runStream(s, d, OutputMode.Append(), "sjoinro", flush = true) { df =>
      val clicks = df.filter(col("event_type").isin("click", "__flush__"))
        .withWatermark("ts", "1 hour")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("click_id"))
      val purchases = df.filter(col("event_type").isin("purchase", "__flush__"))
        .withWatermark("ts", "1 hour")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("purchase_id"), col("value"))
      purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"),
        "right_outer")
    }.filter(col("c_user") =!= -1)
      .select(col("purchase_id"), col("click_id"), col("c_user").as("user_id"))
      .orderBy("purchase_id", "click_id")

  /** LEFT SEMI stream-stream join — existence filtering on a stream:
    * each purchase emits AT MOST ONCE, iff some click by the same
    * user landed in the preceding hour; the click payload never
    * reaches the output (the semi-join contract, which also means
    * click-side state can drop payload columns). Emission happens
    * when the first match arrives OR when the watermark proves the
    * row can still match nothing — either way each purchase appears
    * once, so under the flush feed the result equals the batch
    * EXISTS filter exactly. Sentinels ride user_id −1 as usual. */
  val streamJoinSemi: QFn = (s, d) =>
    runStream(s, d, OutputMode.Append(), "sjoinsemi", flush = true) { df =>
      val clicks = df.filter(col("event_type").isin("click", "__flush__"))
        .withWatermark("ts", "1 hour")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      val purchases = df.filter(col("event_type").isin("purchase", "__flush__"))
        .withWatermark("ts", "1 hour")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("purchase_id"), col("value"))
      purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"),
        "left_semi")
    }.filter(col("p_user") =!= -1)
      .select(col("purchase_id"), col("p_user").as("user_id"))
      .orderBy("purchase_id")

  /** FILE-SOURCE stream — the production ingest shape (a lake
    * directory that accumulates files), distinct from the MemoryStream
    * harness every other key uses: events are staged as parquet files,
    * `readStream` discovers and processes them with
    * `Trigger.AvailableNow` (process-everything-then-stop, the batch
    * backfill trigger), aggregating per type. A FRESH checkpoint per
    * run makes the run deterministic (a reused checkpoint would mark
    * the staged files already-processed and emit nothing); at scale
    * the checkpoint is durable state and `maxFilesPerTrigger` paces
    * ingestion. */
  val streamFileSource: QFn = (s, d) => {
    val src = Tables.sinkPath(s, d, "stream_src")
    // staged parquet stays on real disk (it plays the lake directory);
    // the checkpoint is throwaway harness state → tmpfs (see scratchCkpt)
    val ckpt = scratchCkpt(
      s"fsrc_${d.hashCode & 0x7fffffff}_${s.sparkContext.applicationId}")
    // stage the events as files; clear the previous run's checkpoint
    // (per-(dataset, app) paths — isolated from concurrent runs,
    // no tmpdir growth within one app)
    import scala.reflect.io.Directory
    new Directory(new java.io.File(ckpt)).deleteRecursively()
    val batch = Tables.events(s, d)
    batch.write.mode("overwrite").parquet(src)
    val sinkName = s"fsrc_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = s.readStream.schema(batch.schema).parquet(src)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), dsum2(col("value")).as("sum_value"))
      .writeStream.format("memory").queryName(sinkName)
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    s.table(sinkName).orderBy("event_type")
  }

  /** Incremental ingest with checkpoint RESUME — the property the
    * fresh-checkpoint [[streamFileSource]] key deliberately sidesteps:
    * run 1 processes the first half of the staged files; more files
    * land; run 2 starts from the SAME checkpoint, reads ONLY the new
    * files (the checkpoint's file log marks the rest processed), and
    * merges them into the persisted aggregation state. The final
    * table equals the full-data batch aggregate — the exactly-once
    * incremental contract that makes a 100 TB daily ingest touch only
    * the day's files, ever. */
  val streamIncrementalResume: QFn = (s, d) => {
    val src = Tables.sinkPath(s, d, "incr_src")
    // the resume contract is checkpoint-relative, not medium-relative:
    // run 2 resumes from the same path either way → tmpfs for the bench
    val ckpt = scratchCkpt(
      s"incr_${d.hashCode & 0x7fffffff}_${s.sparkContext.applicationId}")
    import scala.reflect.io.Directory
    new Directory(new java.io.File(src)).deleteRecursively()
    new Directory(new java.io.File(ckpt)).deleteRecursively()
    val e = Tables.events(s, d)
    val split = to_date(col("ts")) < "2024-01-15"
    def run(): Unit = {
      val sinkName = s"incr_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val q = s.readStream.schema(e.schema).parquet(src)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), dsum2(col("value")).as("sum_value"))
        .writeStream.format("memory").queryName(sinkName)
        .outputMode(OutputMode.Complete())
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      lastIncrSink = sinkName
    }
    e.filter(split).write.mode("overwrite").parquet(src)
    run()                                              // half 1 only
    e.filter(!split).write.mode("append").parquet(src) // day's new files land
    run()                                              // resumes: new files + saved state
    s.table(lastIncrSink).orderBy("event_type")
  }
  private var lastIncrSink: String = _

  /** `foreachBatch` sink — the serving-table pattern: each micro-batch
    * of a complete-mode aggregate is written to a parquet table the
    * downstream reader queries (overwrite per batch = last batch wins
    * = batch-equivalent, which is what makes it oracle-able). In
    * production the lambda would MERGE into a lakehouse table or push
    * to an external store — foreachBatch is the one sink that hands
    * the user a full batch DataFrame + epoch id for exactly-once
    * bookkeeping. */
  val streamForeachBatch: QFn = (s, d) => {
    val out = Tables.sinkPath(s, d, "fb_sink")
    val feed = stagedFeed(s, d, flush = false)
    val ckpt = scratchCkpt(s"fb_${java.util.UUID.randomUUID().toString.replace("-", "")}")
    val q = s.readStream.schema(Encoders.product[Ev].schema)
      .option("maxFilesPerTrigger", "1").parquet(feed)
      .groupBy((col("user_id") % 10).as("cohort"))
      .agg(count(lit(1)).as("n"), dsum2(col("value")).as("sum_value"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode("overwrite").parquet(out)
      }
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally {
      q.stop()
      import scala.reflect.io.Directory
      new Directory(new java.io.File(ckpt)).deleteRecursively()
    }
    s.read.parquet(out).orderBy("cohort")
  }

  /** Streaming commit log into the manifest snapshot table
    * ([[graft.operators.SnapshotTable]]) — the lakehouse streaming
    * sink: every micro-batch appends one immutable unit and
    * ATOMICALLY commits a new manifest version (epoch = version), so
    * concurrent readers get snapshot isolation while the stream runs
    * and time travel across epochs after it. foreachBatch's
    * (batch, epoch) pair is the exactly-once bookkeeping handle: a
    * retried epoch overwrites its own unit and re-commits an
    * identical manifest instead of double-appending, and a crash
    * between unit write and manifest rename leaves readers at the
    * previous version. The key returns the per-type aggregate of the
    * LATEST snapshot read back through the manifest chain —
    * batch-equivalent to aggregating the events table directly (the
    * oracle); StreamingSpec asserts the commit history (one version
    * per batch, one unit added per version, monotone row counts). */
  val streamSnapshotSink: QFn = (s, d) => {
    val root = Tables.sinkPath(s, d, "snapsink")
    val feed = stagedFeed(s, d, flush = false)
    val ckpt = scratchCkpt(
      s"snap_${java.util.UUID.randomUUID().toString.replace("-", "")}")
    import scala.reflect.io.Directory
    // fresh table per run: the run IS the commit history under test
    new Directory(new java.io.File(root)).deleteRecursively()
    val q = s.readStream.schema(Encoders.product[Ev].schema)
      .option("maxFilesPerTrigger", "1").parquet(feed)
      .writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         epoch: Long) =>
          graft.operators.SnapshotTable.commitAppend(batch.toDF(), root, epoch)
      }
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally {
      q.stop()
      new Directory(new java.io.File(ckpt)).deleteRecursively()
    }
    import graft.operators.SnapshotTable
    SnapshotTable.readSnapshot(s, root, SnapshotTable.latestVersion(root))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), dsum2(col("value")).as("sum_value"))
      .orderBy("event_type")
  }

  val entries: Seq[(String, QFn)] = Seq(
    "stream_snapshot_sink" -> streamSnapshotSink,
    "stream_join" -> streamJoin,
    "stream_join_outer" -> streamJoinOuter,
    "stream_join_full_outer" -> streamJoinFullOuter,
    "stream_join_right_outer" -> streamJoinRightOuter,
    "stream_join_semi" -> streamJoinSemi,
    "stream_file_source" -> streamFileSource,
    "stream_incremental_resume" -> streamIncrementalResume,
    "stream_foreach_batch" -> streamForeachBatch,
    "stream_tumbling" -> streamTumbling,
    "stream_bidask_spread" -> streamBidaskSpread,
    "stream_asof_enrich" -> streamAsofEnrich,
    "stream_cep_pattern" -> streamCepPattern,
    "stream_static_join" -> streamStaticJoin,
    "stream_chained_agg" -> streamChainedAgg,
    "stream_sliding" -> streamSliding,
    "stream_session" -> streamSession,
    "stream_late_data" -> streamLateData,
    "stream_late_data_final" -> streamLateDataFinal,
    "stream_dedup" -> streamDedup,
    "stream_stateful" -> streamStateful,
    "stream_stateful_tws" -> streamStatefulTws,
    "stream_stateful_map" -> streamStatefulMap,
    "stream_stateful_list" -> streamStatefulList)

  val oracles: Seq[(String, String)] = Seq(
    // the flushed outer join equals the batch LEFT join exactly —
    // the sentinels sealed every pending right-side window
    "stream_join_outer" ->
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'purchase'),
         c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'click')
         SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.user_id AS user_id
         FROM p LEFT JOIN c
           ON c.user_id = p.user_id
          AND c.ts >= p.ts - INTERVAL 1 HOUR
          AND c.ts <= p.ts
         ORDER BY purchase_id, click_id""",
    // full outer under the flush feed = batch FULL join; the nullable
    // long ids come back as pandas float on BOTH sides of the compare
    "stream_join_full_outer" ->
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'purchase'),
         c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'click')
         SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           COALESCE(p.user_id, c.user_id) AS user_id
         FROM p FULL JOIN c
           ON c.user_id = p.user_id
          AND c.ts >= p.ts - INTERVAL 1 HOUR
          AND c.ts <= p.ts
         ORDER BY purchase_id, click_id""",
    "stream_join_right_outer" ->
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'purchase'),
         c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'click')
         SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           c.user_id AS user_id
         FROM p RIGHT JOIN c
           ON c.user_id = p.user_id
          AND c.ts >= p.ts - INTERVAL 1 HOUR
          AND c.ts <= p.ts
         ORDER BY purchase_id, click_id""",
    "stream_join_semi" ->
      """SELECT p.event_id AS purchase_id, p.user_id AS user_id
         FROM events p
         WHERE p.event_type = 'purchase' AND EXISTS (
           SELECT 1 FROM events c
           WHERE c.event_type = 'click' AND c.user_id = p.user_id
             AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 1 HOUR
             AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP))
         ORDER BY purchase_id""",
    "stream_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
         FROM events p JOIN events c
           ON p.event_type = 'purchase' AND c.event_type = 'click'
          AND c.user_id = p.user_id
          AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 1 HOUR
          AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
         ORDER BY purchase_id, click_id""",
    // stream-static join is stateless: flushed windows equal the
    // batch join + hour aggregate over the same profile dim
    "stream_static_join" ->
      """WITH profile AS (
           SELECT user_id, count(*) // 20 AS band FROM events GROUP BY user_id)
         SELECT CAST(date_trunc('hour', CAST(e.ts AS TIMESTAMP)) AS TIMESTAMP) AS w_start,
           p.band, count(*) AS n,
           CAST(sum(CAST(e.value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
         FROM events e JOIN profile p USING (user_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // the flushed streaming quote summary equals the batch namesake
    // key bit-for-bit, so it SHARES that oracle (divergence-proof)
    "stream_bidask_spread" ->
      graft.operators.TimeSeries2.oracles.toMap.apply("ts_bidask_spread"),
    // the flushed temporal join equals the batch as-of exactly: the
    // same correlated-subquery oracle shape the native as-of keys use
    "stream_asof_enrich" ->
      """WITH q AS (
           SELECT user_id AS q_uid, ts AS q_ts, max(value) AS qv
           FROM events WHERE event_type = 'view' GROUP BY 1, 2),
         t AS (
           SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'click')
         SELECT t.event_id, t.user_id, t.ts,
           (SELECT qv FROM q
            WHERE q.q_uid = t.user_id AND q.q_ts <= t.ts
            ORDER BY q.q_ts DESC LIMIT 1) AS mid
         FROM t ORDER BY t.event_id""",
    // the flushed CEP match stream equals the batch lag-window
    // compilation of the same pattern — an independent formulation
    // (window scan vs state machine), per-match rows
    "stream_cep_pattern" ->
      """WITH t AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CAST(CAST(value AS DECIMAL(30,2)) * 100 AS BIGINT) AS vc,
             lag(CAST(CAST(value AS DECIMAL(30,2)) * 100 AS BIGINT), 1) OVER w AS v1,
             lag(CAST(CAST(value AS DECIMAL(30,2)) * 100 AS BIGINT), 2) OVER w AS v2,
             lag(CAST(CAST(value AS DECIMAL(30,2)) * 100 AS BIGINT), 3) OVER w AS v3
           FROM events WHERE event_type = 'click'
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT event_id, user_id, ts, vc - v1 AS rebound_cents,
           v3 - v1 AS depth_cents
         FROM t WHERE v3 > v2 AND v2 > v1 AND vc > v1
         ORDER BY event_id""",
    "stream_tumbling" ->
      """SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS w_start,
           event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    // the batch formulation of the late-drop rule (see streamLateDataFinal):
    // keep on-time rows (ts < S), the fast arrival (ts = M), and late
    // rows whose hourly window the watermark M - 1h had not sealed
    "stream_late_data_final" ->
      """WITH b AS (
           SELECT date_trunc('day', min(CAST(ts AS TIMESTAMP))) + INTERVAL 15 DAY AS s,
                  max(CAST(ts AS TIMESTAMP)) AS m
           FROM events),
         kept AS (
           SELECT CAST(e.ts AS TIMESTAMP) AS ts, e.event_type
           FROM events e, b
           WHERE CAST(e.ts AS TIMESTAMP) < b.s
              OR CAST(e.ts AS TIMESTAMP) = b.m
              OR date_trunc('hour', CAST(e.ts AS TIMESTAMP)) + INTERVAL 1 HOUR
                   > b.m - INTERVAL 1 HOUR)
         SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS w_start,
           event_type, count(*) AS n
         FROM kept GROUP BY 1, 2 ORDER BY 1, 2""",
    "stream_chained_agg" ->
      // the chained 15-min → 1-hour cascade collapses to the direct
      // hour aggregate (exact decimal partials make the re-sum exact)
      """SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS w_start,
           event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "stream_sliding" ->
      """SELECT CAST(to_timestamp((floor(epoch(CAST(ts AS TIMESTAMP))/900) - j) * 900) AS TIMESTAMP) AS w_start,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
         FROM events CROSS JOIN (SELECT unnest([0,1,2,3]) AS j)
         GROUP BY 1 ORDER BY 1""",
    "stream_session" ->
      """WITH marked AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
             CASE WHEN CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP))
                 OVER (PARTITION BY user_id ORDER BY ts) <= INTERVAL 30 MINUTE
               THEN 0 ELSE 1 END AS new_sess
           FROM events),
         sessioned AS (
           SELECT user_id, ts, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
           FROM marked)
         SELECT min(ts) AS sess_start, user_id, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
         FROM sessioned GROUP BY user_id, sess_id
         ORDER BY user_id, sess_start""",
    "stream_dedup" ->
      """SELECT event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "stream_foreach_batch" ->
      """SELECT user_id % 10 AS cohort, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1 ORDER BY cohort""",
    "stream_incremental_resume" ->
      """SELECT event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "stream_file_source" ->
      """SELECT event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    // the latest committed snapshot holds exactly the replayed events,
    // so its aggregate equals the batch aggregate over the table
    "stream_snapshot_sink" ->
      """SELECT event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "stream_stateful" ->
      """SELECT user_id, count(*) AS n_purchases,
           CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS total_value
         FROM events WHERE event_type = 'purchase'
         GROUP BY user_id ORDER BY user_id""",
    "stream_stateful_tws" ->
      """SELECT user_id, count(*) AS n_purchases,
           CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS total_value
         FROM events WHERE event_type = 'purchase'
         GROUP BY user_id ORDER BY user_id""",
    "stream_stateful_map" ->
      """SELECT user_id, event_type, count(*) AS n
         FROM events GROUP BY user_id, event_type
         ORDER BY user_id, event_type""",
    "stream_stateful_list" ->
      """WITH p AS (
           SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n_total
           FROM events WHERE event_type = 'purchase')
         SELECT user_id, n_total, count(*) AS n_recent,
           CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) / count(*)
             AS recent_mean
         FROM p WHERE rn <= 3
         GROUP BY user_id, n_total ORDER BY user_id""")
}
