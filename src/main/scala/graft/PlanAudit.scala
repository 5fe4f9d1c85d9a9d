package graft
import org.apache.spark.sql.SparkSession

/** Audits every registered query's executed plan for scale smells:
  * cartesian products, broadcast-nested-loop joins, and missing
  * codegen — one finding line each. Callable from the spec suite
  * (PlanAuditSpec enforces an empty finding list every `sbt test`)
  * and from the CLI main for ad-hoc runs. */
object PlanAudit {
  // cartesian/BNLJ are legitimate only where the operator IS a cross
  // product or an intentionally-bounded theta join; llm_tfidf crosses
  // a 1-row broadcast count scalar, llm_interleave_sources crosses a
  // <=#sources-row broadcast counts dim — both O(1)-size build sides
  // ts_gapfill crosses the generated hour spine with the <=5-value
  // event-type dim — another O(1)-size build side
  // llm_kmeans broadcasts the k=8-row centroid table — O(1) build side
  val allowCross = Set("join_cross", "join_theta_range", "llm_knn_cosine",
  // ivf_exact is llm_knn_ivf at nProbe=K — same probe-broadcast shape
    "llm_knn_ivf", "llm_knn_ivf_exact",
    "agg_pivot", "llm_tfidf", "llm_interleave_sources",
  // agg_hll_sketch / scan_csv_malformed cross 1-row aggregates —
  // O(1) both sides
  // ts_interpolate shares ts_gapfill's spine × event-type-dim cross;
  // hybrid search crosses the 1-row corpus-stats scalar and the
  // 5-probe broadcast; MMR's top-20 stage is the same probe cross
    "ts_gapfill", "ts_interpolate", "llm_kmeans", "agg_hll_sketch",
  // ivf_pruned keeps llm_knn_ivf's probe × centroid broadcast cross
    "scan_csv_malformed", "llm_hybrid_search", "llm_rerank_mmr",
  // semantic decontamination crosses the broadcast benchmark-sized
  // eval slice against the corpus scan — eval sets stay small no
  // matter how big the corpus, the same justification as knn probes
  // source_drift crosses the 50-row broadcast top-token list and the
  // 1-row corpus total against the sources dim — O(1) build sides
    "llm_knn_ivf_pruned", "llm_semantic_decontaminate", "llm_source_drift",
  // the GLOBAL Quantiles.exactQuantiles path: the constant pseudo-group
  // key folds away, so its broadcast joins (1-row stats, <=nShards
  // offset rows, <=|qs| position rows) surface as BNLJ — every build
  // side is O(1) regardless of data size; the grouped form
  // (agg_percentile_exact) keeps real keys and stays a hash join
    "agg_approx_quantile", "agg_quantile_twopass", "agg_stats")

  /** Keys whose CONSTRUCTION legitimately runs Spark jobs before the
    * driver's own action (r4 verdict item 3): every entry is a
    * documented bounded-driver-state collect or a write-then-read
    * layout the operator exists to demonstrate. Anything not listed
    * here must build its DataFrame without triggering a single job —
    * a construction-time action is how an accidental `.collect()`
    * driver loop sneaks into an operator. */
  val allowConstructionJobs: Map[String, String] = Map(
    // --- bounded iterative driver state (documented collects) ---
    "llm_kmeans" -> "Lloyd rounds materialize K×dim centroids per iter",
    "llm_knn_ivf" -> "k-means quantizer + partitioned list layout write",
    "llm_knn_ivf_exact" -> "same IVF layout path at nProbe=K",
    "llm_knn_ivf_pruned" -> "same IVF layout + centroid collect for pruning",
    "llm_knn_pq" -> "codebook training collects M×K subvector centroids",
    "llm_bpe_train" -> "one 1-row argmax collect per merge round",
    "llm_dedup_cluster" -> "label-propagation rounds converge via count()",
    "llm_embed_neardup" -> ("k-means cells + K-row radius agg + cell-pair " +
      "pruning on the driver (all K-bounded); assignment localCheckpoint"),
    "llm_source_drift" -> ("token counts localCheckpoint'd once, reused by " +
      "top-50/source-total/chi-square consumers"),
    // --- write-then-read: the storage layout IS the operator ---
    "source_csv_roundtrip" -> "stages the CSV it then reads",
    "source_json_roundtrip" -> "stages the JSON it then reads",
    "source_orc_roundtrip" -> "stages the ORC it then reads",
    "source_text_roundtrip" -> "stages the text file it then reads",
    "sink_partitioned_scan" -> "writes the partitioned layout it scans",
    "scan_csv_malformed" -> "stages the malformed CSV it then reads",
    "scan_schema_evolution" -> ("stages two schema generations, then " +
      "mergeSchema-reads them (footer inference is the semantics here)"),
    "join_bucketed_colocated" -> "saves both bucketed tables before the join",
    "join_dpp" -> "writes the partitioned fact layout the DPP scan prunes",
    "join_bloom_prefilter" -> "builds the bounded bloom filter from the dim",
    "join_skew_aqe" -> "stages the skewed fact layout the AQE split needs",
    "etl_compaction" -> "writes the small-file layout it compacts",
    "etl_zorder" -> "writes the interleaved layout it range-scans",
    "etl_cdc_apply" -> "applies the changelog to a staged table",
    "etl_upsert" -> "merges into a staged target table",
    "etl_incremental_agg" -> "maintains a staged running-aggregate table",
    "etl_dynamic_partition_overwrite" ->
      "overwrites hit partitions of a staged layout",
    "etl_gdpr_delete" -> "rewrites the hit buckets of the staged layout",
    "mm_decode_features" -> "stages the binary-asset table it decodes",
    "etl_snapshot_read" ->
      "builds the two-version manifest table it then snapshot-reads",
    "etl_time_travel" -> "same staged manifest table, older version")

  /** Execute every non-streaming registered query at `d` and return
    * one "SMELL key: ..." / "ERROR key: ..." line per finding. Empty
    * result = audit clean. Construction-time Spark jobs (any job
    * started by `fn` itself, before the audit's own collect) are a
    * smell unless the key is in [[allowConstructionJobs]]. */
  def audit(spark: SparkSession, d: String): Seq[String] =
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (name.startsWith("stream_")) Nil
      else try {
        val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobs.incrementAndGet()
        }
        spark.sparkContext.addSparkListener(listener)
        val df =
          try { fn(spark, d) }
          finally {
            // the bus is async: drain before reading the counter
            org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
            spark.sparkContext.removeSparkListener(listener)
          }
        val constructionJobs = jobs.get()
        df.collect()
        val p = df.queryExecution.executedPlan.toString
        val smells = Seq(
          "CartesianProduct" -> p.contains("CartesianProduct"),
          "BroadcastNestedLoopJoin" -> p.contains("BroadcastNestedLoopJoin"),
          "codegen-absent" -> (!p.contains("*(") && !name.startsWith("mm_")),
          s"driver-action-in-construction ($constructionJobs jobs)" ->
            (constructionJobs > 0 && !allowConstructionJobs.contains(name)))
          .collect { case (s, true) => s }
        val crossOk = allowCross.contains(name)
        val bad = smells.filterNot(s =>
          crossOk && (s == "CartesianProduct" || s == "BroadcastNestedLoopJoin"))
        if (bad.nonEmpty) Seq(s"SMELL $name: ${bad.mkString(", ")}") else Nil
      } catch { case e: Throwable =>
        Seq(s"ERROR $name: ${String.valueOf(e.getMessage).take(100)}")
      }
    }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    audit(spark, "/root/testdata/sf0.001").foreach(println)
    println("AUDIT DONE")
    spark.stop()
  }
}
