package graft.operators

import graft.{QFn, Tables}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Count–min sketch with DETERMINISTIC, engine-portable hashing —
  * the streaming-sketch family member the approximate keys
  * (agg_approx_distinct, agg_hll_sketch) can't oracle: because the
  * D=4 row hashes are md5-derived exactly the same way in Spark and
  * DuckDB, the whole sketch — and therefore every estimate — is
  * hash-exact and fully oracle-checkable, unlike implementation-
  * specific HLL/datasketch binaries.
  *
  * Fixture: sketch the l_suppkey frequency distribution of lineitem
  * into a D×W = 4×512 counter table, then point-query every distinct
  * supplier and report the CMS estimate next to the true count. The
  * CMS overestimate guarantee (est ≥ true, over by at most the
  * collision mass of the row's bucket) is pinned by SketchesSpec.
  *
  * 100 TB shape: ONE shuffle total — the per-key pre-aggregation
  * (what a streaming sketch's map-side combine does anyway; the
  * counters are definitionally identical to per-row insertion). Every
  * md5 is computed per DISTINCT key, not per row, and the 128-bit
  * digest is sliced into all four 32-bit row hashes, so hash cost is
  * O(keys), not O(rows·D). The counter table is BOUNDED at D·W rows
  * no matter the input size (that bound is the whole point of a
  * sketch) and broadcasts to the probe join for free. */
object Sketches {

  val D = 4    // hash rows
  val W = 512  // buckets per row

  /** Row-r bucket of a string key: hex chars [8r+1, 8r+8] of md5(key)
    * — the four non-overlapping 32-bit words of one digest — read as
    * an integer, mod W. DuckDB twin:
    * ('0x' || substr(md5(k), 8*r+1, 8))::UBIGINT % W. */
  def bucket(md5hex: Column, r: Int): Column =
    conv(substring(md5hex, 8 * r + 1, 8), 16, 10).cast("long") % W

  val aggCms: QFn = (s, d) => {
    val li = Tables.lineitem(s, d)
      .select(col("l_suppkey").cast("string").as("k"))
    val keyed = li.groupBy("k").agg(count(lit(1)).as("true_cnt"))
    def cells: Column = explode(array(
      (0 until D).map(r =>
        struct(lit(r).as("r"), bucket(md5(col("k")), r).as("b"))): _*))
    val sketch = keyed.select(col("true_cnt"), cells.as("c"))
      .groupBy(col("c.r").as("r"), col("c.b").as("b"))
      .agg(sum("true_cnt").as("cnt"))
    keyed.select(col("k"), col("true_cnt"), cells.as("c"))
      .select(col("k"), col("true_cnt"),
        col("c.r").as("r"), col("c.b").as("b"))
      .join(broadcast(sketch), Seq("r", "b"))
      .groupBy("k")
      .agg(min("cnt").as("est"), max("true_cnt").as("true_cnt"))
      .select("k", "est", "true_cnt")
      .orderBy("k")
  }

  val entries: Seq[(String, QFn)] = Seq("agg_cms" -> aggCms)

  val oracles: Seq[(String, String)] = Seq(
    // the oracle keeps the definitional per-ROW insertion form —
    // counter (r, b) = number of rows whose key hashes there — which
    // the Spark side's per-key pre-aggregation must equal exactly
    "agg_cms" ->
      s"""WITH li AS (SELECT l_suppkey::VARCHAR AS k FROM lineitem),
         rs AS (SELECT * FROM (VALUES (0), (1), (2), (3)) t(r)),
         cells AS (SELECT k, r,
             ('0x' || substr(md5(k), 8 * r + 1, 8))::UBIGINT % $W AS b
           FROM li, rs),
         sketch AS (SELECT r, b, count(*) AS cnt FROM cells GROUP BY r, b),
         probes AS (SELECT k, count(*) AS true_cnt FROM li GROUP BY k),
         pb AS (SELECT p.k, p.true_cnt, rs.r,
             ('0x' || substr(md5(p.k), 8 * rs.r + 1, 8))::UBIGINT % $W AS b
           FROM probes p, rs)
         SELECT pb.k AS k, min(s.cnt) AS est, max(pb.true_cnt) AS true_cnt
         FROM pb JOIN sketch s ON pb.r = s.r AND pb.b = s.b
         GROUP BY pb.k ORDER BY k""")
}
