package graft

import org.apache.spark.sql.functions._

/** LLM-pipeline operators (§2.9): checks for the no-oracle keys and
  * semantic invariants of the oracle'd ones. */
class LlmSpec extends SparkTestBase {

  test("llm_near_dedup finds every pair with exact Jaccard >= 0.7") {
    // ground truth: exact bigram Jaccard on ALL pairs (fine at sf0.001)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), array_distinct(
        expr("transform(sequence(1, size(w)-1), i -> concat(element_at(w,i), '_', element_at(w,i+1)))"))
        .as("g"))
    val truth = docs.as("x").join(docs.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        (size(array_intersect(col("x.g"), col("y.g"))).cast("double") /
          size(array_union(col("x.g"), col("y.g")))).as("j"))
      .filter(col("j") >= 0.7)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "test data should contain at least one near-dup pair")

    val found = operators.LlmSimilarity.llmNearDedup(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = truth -- found
    assert(missed.isEmpty, s"LSH missed high-similarity pairs: $missed")
  }

  test("hashed_bigrams equals the composed split/concat/xxhash64 pipeline") {
    // the native expression must produce exactly the hash SET the
    // interpreted HOF chain produces, row by row (order included:
    // both emit first-occurrence order of distinct grams)
    val both = Tables.documents(spark, sf).select(
      graft.functions.HashedBigrams(col("text")).as("native"),
      expr("""transform(
        array_distinct(transform(sequence(1, size(split(text,' '))-1),
          i -> concat(element_at(split(text,' '),i), '_', element_at(split(text,' '),i+1)))),
        x -> xxhash64(x))""").as("composed"))
    assert(both.filter(col("native") =!= col("composed")).count() == 0)
    // and stays inside whole-stage codegen (the point of the rewrite)
    val df = Tables.documents(spark, sf)
      .select(graft.functions.HashedBigrams(col("text")).as("h"))
    assert(plan(df).contains("*(1)"), s"hashed_bigrams broke codegen:\n${plan(df)}")
    // single-token and empty docs yield empty gram sets, not errors
    import spark.implicits._
    val edge = Seq("", "one", "two words").toDF("text")
      .select(size(graft.functions.HashedBigrams(col("text"))).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(edge == Seq(0, 0, 1), s"edge-case gram counts: $edge")
  }

  test("llm_near_dedup MinHash estimate is close to exact Jaccard") {
    val rows = operators.LlmSimilarity.llmNearDedup(spark, sf)
      .select("est_jaccard", "exact_jaccard").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getDouble(0); val exact = r.getDouble(1)
      assert(math.abs(est - exact) <= 0.3,
        s"estimate too far off: est=$est exact=$exact")
    }
  }

  test("llm_knn_ivf recall@5 >= 0.95 at <= 35% nominal scan") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(operators.LlmSimilarity.llmKnnCosine(spark, sf))
    val ivf = pairs(operators.LlmSimilarity.llmKnnIvf(spark, sf))
    val recall = (brute & ivf).size.toDouble / brute.size
    val nominal = operators.LlmSimilarity.IvfNProbe.toDouble / operators.LlmSimilarity.IvfK
    info(f"IVF recall@5 = $recall (nProbe=${operators.LlmSimilarity.IvfNProbe} of ${operators.LlmSimilarity.IvfK} lists, ${nominal * 100}%.1f%% nominal scan)")
    assert(recall >= 0.95, s"recall below the r4 gate: $recall")
    // scan budget tracks the REAL operator constants, not a literal
    assert(nominal <= 0.35, f"nominal list-scan fraction $nominal%.3f exceeds the 35%% budget")
  }

  test("llm_knn_ivf_pruned: identical to llm_knn_ivf via a pruned scan") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val full = rows(operators.LlmSimilarity.llmKnnIvf(spark, sf))
    operators.LlmSimilarity.collectIvfDiagnostics = true
    val pruned =
      try rows(operators.LlmSimilarity.llmKnnIvfPruned(spark, sf))
      finally operators.LlmSimilarity.collectIvfDiagnostics = false
    assert(pruned == full, "layout change must not change results")
    val (read, total) = operators.LlmSimilarity.lastIvfScan
    val (cand, denom) = operators.LlmSimilarity.lastIvfScanRows
    val frac = cand.toDouble / denom
    info(s"partition-pruned scan read $read of $total list files")
    info(f"measured per-probe row-scan fraction = $frac%.3f (candidates $cand of $denom probe-row pairs)")
    assert(read > 0 && read <= total)
    // the r4 gate: recall >= 0.95 (asserted in the recall test on the
    // identical results) at a nominal list-scan budget <= 35% (gated
    // there against the shared IvfNProbe/IvfK constants).
    // The ROW-weighted fraction is printed, not hard-bounded at 0.35:
    // 64 lists over a 500-vector smoke corpus are unavoidably skewed
    // (~8 rows/list average, 30 non-empty), so row fraction here is a
    // corpus-size artifact; at production N/K (thousands of rows per
    // list) Lloyd balancing pulls it toward the nominal list fraction.
    assert(frac < 0.85, f"row-scan fraction $frac%.3f — pruning is not pruning")
  }

  test("llm_knn_pq: ADC recall@5 against exact L2 is usable") {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val probes = emb.filter(col("vec_id").isin(1L, 2L, 3L, 4L, 5L))
      .select(col("vec_id").as("probe_id"),
        col("embedding").cast("array<double>").as("pv"))
    val w = Window.partitionBy("probe_id").orderBy("d2", "vec_id")
    val truth = emb.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("d2", graft.functions.SqEuclidFD(col("embedding"), col("pv")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = operators.LlmSimilarity.llmKnnPq(spark, sf)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & pq).size.toDouble / truth.size
    info(s"PQ ADC recall@5 = $recall (m=8 subspaces x 16 codes, 32x compression, 100-candidate re-rank)")
    // r4 gate: 100-candidate shortlist lifts recall 0.8 → 0.92;
    // asserted with headroom for corpus regeneration
    assert(recall >= 0.85, s"PQ recall below the r4 gate: $recall")
  }

  test("llm_rerank_mmr: anchored, top-20-bounded, and more diverse than top-5") {
    val knn = operators.LlmSimilarity.llmKnnCosine(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val mmr = operators.LlmSimilarity.llmRerankMmr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val emb = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    def meanPairwise(ids: Seq[Long]): Double = {
      val ps = for (i <- ids.indices; j <- i + 1 until ids.size)
        yield cos(emb(ids(i)), emb(ids(j)))
      ps.sum / ps.size
    }
    mmr.groupBy(_._1).foreach { case (probe, rows) =>
      assert(rows.length == 5, s"probe $probe: ${rows.length} picks")
      // the first MMR pick is the plain top-1 (no penalty yet)
      val top1 = knn.filter(p => p._1 == probe && p._2 == 1).head._3
      assert(rows.minBy(_._2)._3 == top1, s"probe $probe lost its anchor")
      val top5 = knn.filter(_._1 == probe).sortBy(_._2).take(5).map(_._3).toSeq
      val picks = rows.sortBy(_._2).map(_._3).toSeq
      assert(meanPairwise(picks) <= meanPairwise(top5) + 1e-9,
        s"probe $probe: MMR did not diversify")
    }
  }

  test("llm_dedup_cluster: pairs are closed under clustering, one keeper each") {
    val pairs = operators.LlmSimilarity.llmNearDedupExact(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = operators.LlmSimilarity.llmDedupCluster(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    // every near-dup pair ends in the same cluster
    pairs.foreach { case (a, b) =>
      assert(clusters(a)._1 == clusters(b)._1, s"pair ($a,$b) split across clusters")
    }
    // exactly one keeper per cluster, and it's the min doc_id
    clusters.groupBy(_._2._1).foreach { case (cid, members) =>
      val keepers = members.filter(_._2._2 == 1).keys.toSeq
      assert(keepers == Seq(members.keys.min), s"cluster $cid keepers: $keepers")
    }
    // singletons are their own cluster and kept
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    clusters.filterNot(c => inPairs(c._1)).foreach { case (id, (cid, keep)) =>
      assert(cid == id && keep == 1)
    }
  }

  test("llm_simhash: fingerprints are deterministic and chunks decompose") {
    val a = operators.LlmSimilarity.llmSimhash(spark, sf).collect()
    val b = operators.LlmSimilarity.llmSimhash(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq, "not deterministic")
    a.foreach { r =>
      val fp = r.getLong(1)
      val chunks = (2 to 5).map(r.getLong)
      assert(chunks.reduce(_ | _) == fp, "chunk decomposition broken")
    }
  }

  test("exact dedup: copies counted, kept id is minimal") {
    val res = operators.LlmText.llmExactDedup(spark, sf)
    val total = res.agg(sum("n_copies")).collect()(0).getLong(0)
    val nDocs = Tables.documents(spark, sf).count()
    assert(total == nDocs, "dedup groups must partition the corpus")
  }

  test("tfidf weights are positive and ranked descending per doc") {
    val rows = operators.LlmText.llmTfidf(spark, sf)
      .select("doc_id", "rk", "w").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(1)).map(_.getDouble(2))
      assert(byRank.zip(byRank.tail).forall { case (x, y) => x >= y },
        "weights must be non-increasing in rank")
    }
  }

  test("udaf weighted mid equals the two-sums formulation") {
    val bad = operators.UDX.aggUdafWmid(spark, sf)
      .filter(abs(col("wmid") - col("wmid_sums")) > 1e-9)
    assert(bad.count() == 0)
  }

  test("udf_scalar: UDF and native expression agree bit-for-bit") {
    val bad = operators.UDX.udfScalar(spark, sf)
      .filter(col("mid_udf") =!= col("mid_native") ||
        col("spread_udf") =!= col("spread_native"))
    assert(bad.count() == 0)
  }

  test("prefix-filtered jaccard & containment equal the all-pairs truth") {
    // ground truth: EXACT similarity on every same-source pair (all-pairs
    // join — fine at sf0.001). The prefix lemma says the rarest-gram
    // index loses no qualifying pair; this pins it against the rewrite.
    val g = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        graft.functions.HashedBigrams(col("text")).as("hg"))
    val pairs = g.as("x").join(g.as("y"),
        col("x.source") === col("y.source") &&
          col("x.doc_id") =!= col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        size(array_intersect(col("x.hg"), col("y.hg"))).as("shared"),
        size(col("x.hg")).as("sza"), size(col("y.hg")).as("szb"))
    val truthJ = pairs.filter(col("a") < col("b"))
      .filter(col("shared") / (col("sza") + col("szb") - col("shared")) >= 0.3)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotJ = operators.LlmSimilarity.llmNgramJaccard(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotJ == truthJ, s"jaccard mismatch: missed=${truthJ -- gotJ} extra=${gotJ -- truthJ}")

    val truthC = pairs
      .filter(col("shared") / col("sza") >= 0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotC = operators.LlmSimilarity.llmContainment(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotC == truthC, s"containment mismatch: missed=${truthC -- gotC} extra=${gotC -- truthC}")
  }
}
