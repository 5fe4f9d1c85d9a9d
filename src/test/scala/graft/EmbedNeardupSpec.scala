package graft

import org.apache.spark.sql.functions._

/** `llm_embed_neardup`'s angular-bound cell blocking: on a clustered
  * corpus the triangle-inequality prune must (a) return EXACTLY the
  * brute-force pair set — recall completeness is by construction, not
  * probabilistic — and (b) admit fewer than K² cell pairs, i.e. the
  * plan is genuinely blocked, not an all-pairs product in disguise. */
class EmbedNeardupSpec extends SparkTestBase {

  private val Dim = 8
  private val PerCluster = 20

  /** 3 tight clusters around orthogonal axes; deterministic noise. */
  private def corpus() = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until 3 * PerCluster).map { i =>
      val c = i % 3
      val v = Array.tabulate(Dim)(p =>
        (if (p == c) 1.0f else 0.0f) + (rnd.nextFloat() - 0.5f) * 0.1f)
      (i.toLong, v, 0)
    }.toDF("vec_id", "embedding", "label")
  }

  test("angular cell blocking is exact and prunes cross-cluster cells") {
    val emb = corpus().cache()
    try {
      val (pairs, nAdmissible) =
        operators.LlmSimilarity.embedNeardupBlocked(spark, emb, tau = 0.9, K = 3)
      val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      // brute force over all same-label pairs
      val brute = emb.as("x").join(emb.as("y"),
          col("x.label") === col("y.label") && col("x.vec_id") < col("y.vec_id"))
        .withColumn("cos", round(functions.CosineSimF(
          col("x.embedding"), col("y.embedding")), 6))
        .filter(col("cos") >= 0.9)
        .select(col("x.vec_id"), col("y.vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      assert(got == brute,
        s"blocked != brute: missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
      // every within-cluster pair clears τ = 0.9 on this corpus
      assert(got.size == 3 * PerCluster * (PerCluster - 1) / 2)
      // the prune is real: orthogonal clusters (θ ≈ π/2) cannot be
      // admissible at acos(0.9) ≈ 0.45 with tight radii
      assert(nAdmissible < 9, s"no pruning: $nAdmissible of 9 cell pairs admitted")
    } finally emb.unpersist()
  }

  test("benchmark-data output matches the label-blocked brute force") {
    val e = Tables.embeddings(spark, sf)
    val (pairs, _) =
      operators.LlmSimilarity.embedNeardupBlocked(spark, e, tau = 0.3, K = 16)
    val brute = e.as("x").join(e.as("y"),
        col("x.label") === col("y.label") && col("x.vec_id") < col("y.vec_id"))
      .withColumn("cos_sim", round(functions.CosineSimF(
        col("x.embedding"), col("y.embedding")), 6))
      .filter(col("cos_sim") >= 0.3)
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        col("x.label").as("label"), col("cos_sim"))
      .orderBy("a", "b")
    assert(pairs.collect().map(_.toString).toSeq ==
      brute.collect().map(_.toString).toSeq)
  }
}
