package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distinct-payload scale evidence for the MinHash+LSH banding path
  * (r11 verdict #5): the replica ladder covers these keys only with
  * planted word-tag twins (the tag scheme manufactures artificial
  * gram overlaps — the same caveat PhashScaleSpec documented for
  * phash), so this probe synthesizes ≥100k DISTINCT pseudo-random
  * documents — no planted twins, no replica artifact — and drives the
  * PRODUCTION pipeline ([[graft.operators.LlmLsh.portableSignaturesOn]]
  * → [[graft.operators.LlmLsh.minhashBandKeys]] →
  * [[graft.operators.LlmLsh.minhashPairsOn]], the exact code
  * `llm_minhash_portable` runs), asserting the band bucket-size
  * distribution and candidate volume that make the banded join
  * ~linear instead of all-pairs n².
  *
  * Why the bounds hold by design: a band key is 4 consecutive 31-bit
  * signature mins — ~2¹²⁴ key space per band — so two DISTINCT random
  * documents collide in a band only when their gram sets genuinely
  * overlap (P[band match] = J⁴ for Jaccard J; random vocab-8192
  * 32-word docs have J ≈ 0). Candidate volume Σ C(bucket, 2) over
  * 16 bands therefore stays near-zero per doc, and the ≥ 0.35
  * estimate gate passes essentially nothing. */
class MinhashScaleSpec extends SparkTestBase {

  import operators.LlmLsh

  private val N: Int =
    sys.env.getOrElse("SPARK_GRAFT_MINHASH_PROBE_N", "100000").toInt

  /** N distinct 32-word documents over a 8192-word vocab, generated
    * distributedly (one splitmix64 stream per doc_id; generator in the
    * companion so the closure doesn't capture the suite). */
  private def syntheticDocs =
    spark.range(N.toLong).toDF("doc_id")
      .repartition(8)
      .mapPartitions(MinhashScaleSpec.gen)(
        RowEncoder.encoderFor(MinhashScaleSpec.docSchema))

  test(s"minhash banding probe: bounded buckets and ~linear candidates " +
      s"on $N distinct payloads") {
    val t0 = System.nanoTime()
    val sigs = LlmLsh.portableSignaturesOn(syntheticDocs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // band bucket-size distribution through the PRODUCTION band-key
      // extraction (not a re-derived slice expression)
      val buckets = LlmLsh.minhashBandKeys(sigs)
        .groupBy("band", "band_key").count()
      val (maxBucket, nBuckets, candVolume) = {
        val agg = buckets.agg(max("count"), count(lit(1)),
          sum((col("count") * (col("count") - 1) / 2).cast("long")).cast("long"))
          .first()
        (agg.getLong(0), agg.getLong(1), agg.getLong(2))
      }
      val pairs = LlmLsh.minhashPairsOn(sigs)
      val nPairs = pairs.count()
      val secs = (System.nanoTime() - t0) / 1e9
      info(f"N=$N%d docs, wall $secs%.1f s: max band bucket $maxBucket%d " +
        f"across $nBuckets%d buckets, candidate volume $candVolume%d " +
        f"(${candVolume.toDouble / N}%.3f per doc), $nPairs%d pairs at est>=0.35")
      // a band key spans ~2^124 values: a bucket beyond the tens means
      // the signature kernel is badly non-uniform — the failure the
      // banding contract exists to prevent
      assert(maxBucket < 100,
        s"max band bucket $maxBucket — banding collapsing toward all-pairs")
      // Σ C(bucket,2) must stay near-linear in N (all-pairs would be
      // N/2 per doc = ${N/2} here); 2 per doc is enormous headroom for
      // random payloads while still excluding quadratic growth
      assert(candVolume < 2L * N,
        s"candidate volume $candVolume superlinear for N=$N")
      // distinct random docs: genuine Jaccard >= 0.35 twins are
      // vanishingly rare — the verify gate must pass ~nothing
      assert(nPairs < N / 1000,
        s"$nPairs est>=0.35 pairs among $N distinct random docs")
    } finally sigs.unpersist()
  }
}

object MinhashScaleSpec {
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** splitmix64 — deterministic per-doc randomness. */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  val gen: Iterator[Row] => Iterator[Row] = rows =>
    rows.map { r =>
      val id = r.getLong(0)
      val sb = new StringBuilder(256)
      var s = mix(id)
      var i = 0
      while (i < 32) {
        s = mix(s)
        if (i > 0) sb.append(' ')
        sb.append('w').append(java.lang.Long.toString((s >>> 8) % 8192))
        i += 1
      }
      Row(id, sb.toString)
    }
}
