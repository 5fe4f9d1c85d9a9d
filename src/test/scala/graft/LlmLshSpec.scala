package graft

import org.apache.spark.sql.functions._

/** Contracts for the portable-LSH family (LlmLsh.scala). Both keys
  * are fully oracle-checked (the APPROXIMATE outputs hash-match
  * DuckDB), so these specs pin the properties the oracle can't see:
  * the recall the bucketing promises, the scan fraction that makes it
  * an index rather than a rediscovered brute force, and estimate
  * error. Gates sit under the measured values (sign-LSH twin
  * retrieval 5/5 at a 3–4% scan; portable-minhash recall 1.0 at
  * J ≥ 0.5 with mean |est−exact| ≈ 0.011, max ≈ 0.033 across
  * sf0.001–sf0.1). */
class LlmLshSpec extends SparkTestBase {

  test("sign-LSH retrieves planted high-similarity twins at rank 1 on a small scan") {
    import spark.implicits._
    // corpus = sf0.001 embeddings + a cos≈0.999 twin per probe:
    // deterministic per-dimension perturbation, ids 9001..9005
    val src = Tables.embeddings(spark, sf)
    val twins = src.filter(col("vec_id").isin(1L, 2L, 3L, 4L, 5L))
      .as[(Long, Array[Float], Int)]
      .map { case (id, v, lbl) =>
        (9000L + id, v.zipWithIndex.map { case (x, i) => x + 0.005f * ((i % 3) - 1) }, lbl)
      }
      .toDF("vec_id", "embedding", "label")
    val dir = Tables.sinkPath(spark, sf, "signlsh_twins")
    src.unionByName(twins).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val top = operators.LlmLsh.llmKnnSignLsh(spark, dir).collect()
    val rank1 = top.filter(_.getInt(1) == 1)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    (1L to 5L).foreach { p =>
      assert(rank1.get(p).contains(9000L + p),
        s"probe $p rank-1 was ${rank1.get(p)}, expected twin ${9000L + p}")
    }
    // the twin's cosine must be near-1 (the perturbation is tiny)
    val sims = top.filter(r => r.getInt(1) == 1).map(_.getDouble(3))
    assert(sims.forall(_ >= 0.99), s"twin sims: ${sims.mkString(",")}")

    // index property: candidates scored stay a small corpus fraction
    val n = src.count() + 5
    val cand = operators.LlmLsh.signCandidates(spark, dir).count()
    val frac = cand.toDouble / (5 * n)
    assert(frac <= 0.15, f"scan fraction $frac%.3f — bucketing degenerated")
  }

  test("sign-LSH is deterministic: two independent runs agree row-for-row") {
    val a = operators.LlmLsh.llmKnnSignLsh(spark, sf).collect().toSeq
    val b = operators.LlmLsh.llmKnnSignLsh(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("portable minhash: recall 1.0 on J>=0.7 pairs, estimate error bounded") {
    val port = operators.LlmLsh.llmMinhashPortable(spark, sf).collect()
    val exact = operators.LlmSimilarity.llmNearDedupExact(spark, sf).collect()
    val pp = port.map(r => (r.getLong(0), r.getLong(1))).toSet
    val high = exact.filter(_.getDouble(2) >= 0.7)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(high.nonEmpty, "fixture lost its planted near-dup pairs")
    assert((high -- pp).isEmpty,
      s"missed high-J pairs: ${(high -- pp).take(5)} (banding miss odds at " +
        "J=0.7 are ~1.2%/pair — if a REGENERATED corpus trips this, " +
        "check for a borderline pair before suspecting the engine)")
    val errs = port.map(r => math.abs(r.getDouble(2) - r.getDouble(3)))
    assert(errs.nonEmpty && errs.max <= 0.1,
      s"max |est-exact| = ${errs.max} (measured ~0.03)")
    assert(errs.sum / errs.length <= 0.05,
      s"mean |est-exact| = ${errs.sum / errs.length} (measured ~0.011)")
  }

  test("portable minhash signatures match the native-kernel banding shape (same pair count gate)") {
    // the portable key and the engine-native llm_near_dedup share the
    // algorithm (64 perms, 16×4 bands, est >= 0.35); on the same
    // corpus their emitted pair sets should agree on the planted
    // near-dups even though the hash families differ
    val port = operators.LlmLsh.llmMinhashPortable(spark, sf).collect()
      .filter(_.getDouble(3) >= 0.7).map(r => (r.getLong(0), r.getLong(1))).toSet
    val native = operators.LlmSimilarity.llmNearDedup(spark, sf).collect()
      .filter(_.getDouble(3) >= 0.7).map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(port == native,
      s"portable vs native high-J pair sets diverge: ${(port diff native).take(3)} / ${(native diff port).take(3)}")
  }
}
