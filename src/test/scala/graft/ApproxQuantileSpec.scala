package graft

import org.apache.spark.sql.Row

/** `agg_approx_quantile`: percentile_approx's Greenwald–Khanna rank
  * guarantee — each approximate quartile's true rank is within
  * n/accuracy of the target rank. */
class ApproxQuantileSpec extends SparkTestBase {

  test("approximate quartiles honor the GK rank-error bound") {
    val row: Row = operators.Extras.aggApproxQuantile(spark, sf).collect().head
    val approx = row.getSeq[Double](0)
    val n = row.getLong(2)
    val tol = math.ceil(n / 10000.0).toLong  // rank error <= n/accuracy
    val prices = Tables.lineitem(spark, sf)
      .select("l_extendedprice").collect().map(_.getDouble(0)).sorted
    Seq(0.25, 0.5, 0.75).zip(approx).foreach { case (q, a) =>
      // rank of the approximate value in the sorted data
      val rank = prices.count(_ <= a).toLong
      val target = (q * n).toLong
      assert(math.abs(rank - target) <= tol + 1,
        s"q=$q approx=$a rank=$rank target=$target tol=$tol")
    }
  }
}
