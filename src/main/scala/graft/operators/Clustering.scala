package graft.operators

import graft.{QFn, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.SqEuclidFD

/** Distributed Lloyd k-means over the embedding corpus — the
  * clustering step a training pipeline runs for corpus curation
  * (domain balancing, dedup-by-cluster, IVF index build).
  *
  * Shape per iteration (the MLlib shape): centroids live on the
  * driver (k×dim doubles — bounded state, independent of corpus
  * size), are broadcast into a crossJoin for assignment (one corpus
  * scan, the [[graft.functions.SqEuclidFD]] kernel fused into
  * whole-stage codegen), and the update is one (cluster, pos)
  * partial-agg shuffle. Nothing driver-side ever scales with n.
  *
  * Determinism at any executor count: per-dimension sums are exact
  * integer micro-units (`floor(x·1e6)` — identical IEEE value
  * everywhere), centroid = quantized-mean micro-units, argmin ties
  * break on cluster id, and the reported WSSSE is itself a
  * micro-quantized integer sum. The spec (KMeansSpec) asserts the
  * Lloyd monotonicity (WSSSE non-increasing in iterations) and
  * invariance under repartitioning; no SQL oracle — the iterative
  * fixpoint isn't expressible as one DuckDB query (driver records
  * the rows-only check, like the other spec-validated keys).
  */
object Clustering {

  private val K = 8
  private val Dim = 64

  /** One k-means run; returns (cluster, n_points, wssse) — and the
    * centroids used, for the spec. */
  def kmeans(s: SparkSession, d: String, iters: Int, preShuffle: Int = 0)
      : (DataFrame, Array[Array[Double]]) = {
    val base = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val emb = if (preShuffle > 0) base.repartition(preShuffle) else base
    // deterministic seed centroids: k lowest vec_ids of a fixed
    // arithmetic subsample (same spirit as the IVF coarse quantizer)
    var cents: Array[Array[Double]] = base
      .filter(pmod(col("vec_id"), lit(17)) === 3).orderBy("vec_id").limit(K)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

    def assigned(): DataFrame = {
      val centRows = cents.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      import s.implicits._
      val centDf = broadcast(centRows.toDF("cluster", "cent"))
      val w = Window.partitionBy("vec_id").orderBy("d2", "cluster")
      emb.crossJoin(centDf)
        .withColumn("d2", SqEuclidFD(col("embedding"), col("cent")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("vec_id"), col("embedding"), col("cluster"), col("d2"))
    }

    var it = 0
    while (it < iters) {
      // update: exact micro-unit sums per (cluster, dimension)
      val sums = assigned()
        .select(col("cluster"), posexplode(col("embedding")))
        .select(col("cluster"), col("pos"),
          floor(col("col").cast("double") * 1000000.0).cast("long").as("q"))
        .groupBy("cluster", "pos")
        .agg(sum("q").as("sq"), count(lit(1)).as("n"))
        .collect()
      val next = Array.tabulate(K, Dim)((c, p) => cents(c)(p))
      sums.foreach { r =>
        val c = r.getInt(0); val p = r.getInt(1)
        // quantized mean: nearest-integer micro-units via exact
        // integer arithmetic, then the exact double of that integer
        val sq = r.getLong(2); val n = r.getLong(3)
        val half = if (sq >= 0) n / 2 else -(n / 2)
        next(c)(p) = ((sq + half) / n).toDouble / 1000000.0
      }
      cents = next.map(_.toArray)
      it += 1
    }
    val result = assigned()
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_points"),
        (sum(floor(col("d2") * 1000000.0).cast("long")).cast("double")
          / 1000000.0).as("wssse"))
      .orderBy("cluster")
    (result, cents)
  }

  val llmKmeans: QFn = (s, d) => kmeans(s, d, iters = 3)._1

  val entries: Seq[(String, QFn)] = Seq("llm_kmeans" -> llmKmeans)
  val oracles: Seq[(String, String)] = Seq.empty
}
