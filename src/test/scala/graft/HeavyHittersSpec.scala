package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.MisraGries.misraGries

/** Misra–Gries `TypedImperativeAggregate` (functions/HeavyHitters
  * .scala): exact regime vs a plain group-count, and the approximate
  * small-k regime's frequency/error guarantees under real partial
  * aggregation + merge (8-partition shuffle forces serialize/merge).
  */
class HeavyHittersSpec extends SparkTestBase {

  private def summarize(k: Int, parts: Int): Map[String, Long] = {
    import spark.implicits._
    // skewed stream: item i appears 2^(9-i) times, i = 0..9 → n = 1023,
    // repartitioned so every task sees an arbitrary slice
    val rows = (0 to 9).flatMap(i => Seq.fill(1 << (9 - i))(s"item$i"))
    val df = rows.toDF("v").repartition(parts)
    df.agg(misraGries(col("v"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select("e.item", "e.cnt").as[(String, Long)].collect().toMap
  }

  test("exact regime: k >= #distinct reproduces exact counts") {
    val got = summarize(k = 16, parts = 8)
    val want = (0 to 9).map(i => s"item$i" -> (1L << (9 - i))).toMap
    assert(got == want)
  }

  test("approximate regime: every item above n/(k+1) survives, counts are lower bounds within n/(k+1)") {
    val n = 1023L; val k = 4
    val truth = (0 to 9).map(i => s"item$i" -> (1L << (9 - i))).toMap
    val got = summarize(k, parts = 8)
    assert(got.size <= k, s"summary exceeded capacity: $got")
    val bound = n / (k + 1)   // 204
    truth.filter(_._2 > bound).foreach { case (item, c) =>
      assert(got.contains(item), s"heavy item $item (freq $c > $bound) missing from $got")
    }
    got.foreach { case (item, est) =>
      val t = truth(item)
      assert(est <= t, s"$item estimate $est exceeds truth $t (must be a lower bound)")
      assert(t - est <= bound, s"$item error ${t - est} exceeds n/(k+1)=$bound")
    }
  }

  test("agg_heavy_hitters key matches exact group counts") {
    val viaSketch = operators.UDX.aggHeavyHitters(spark, sf).collect().toSeq
    val exact = Tables.orders(spark, sf)
      .groupBy("o_orderstatus", "o_orderpriority").agg(count(lit(1)).as("cnt"))
      .orderBy("o_orderstatus", "o_orderpriority")
      .collect().toSeq.map(r => Row(r.get(0), r.get(1), r.get(2)))
    assert(viaSketch == exact)
  }
}
