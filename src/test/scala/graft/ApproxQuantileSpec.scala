package graft

/** `agg_approx_quantile`: percentile_approx's Greenwald–Khanna rank
  * guarantee — each approximate quartile's true rank is within
  * n/accuracy of the target rank. Also pins the scalar one-row-per-
  * quantile output shape (the result canonicalizer can't sort array
  * cells). */
class ApproxQuantileSpec extends SparkTestBase {

  test("approximate quartiles honor the GK rank-error bound") {
    val rows = operators.Extras.aggApproxQuantile(spark, sf).collect()
    assert(rows.length == 3)
    assert(rows.map(_.getDouble(0)).toSeq == Seq(0.25, 0.5, 0.75))
    val n = rows.head.getLong(3)
    val tol = math.ceil(n / 10000.0).toLong // rank error <= n/accuracy
    val prices = Tables.lineitem(spark, sf)
      .select("l_extendedprice").collect().map(_.getDouble(0)).sorted
    rows.foreach { r =>
      val q = r.getDouble(0)
      val a = r.getDouble(1)
      // rank of the approximate value in the sorted data
      val rank = prices.count(_ <= a).toLong
      val target = (q * n).toLong
      assert(math.abs(rank - target) <= tol + 1,
        s"q=$q approx=$a rank=$rank target=$target tol=$tol")
    }
  }

  test("exact quantile column matches the sorted-data interpolation") {
    val rows = operators.Extras.aggApproxQuantile(spark, sf).collect()
    val prices = Tables.lineitem(spark, sf)
      .select("l_extendedprice").collect().map(_.getDouble(0)).sorted
    rows.foreach { r =>
      val q = r.getDouble(0)
      val exact = r.getDouble(2)
      val pos = q * (prices.length - 1)
      val lo = prices(pos.toInt)
      val hi = prices(math.min(pos.toInt + 1, prices.length - 1))
      val want = lo + (pos - pos.toInt) * (hi - lo)
      assert(math.abs(exact - want) < 1e-4, s"q=$q exact=$exact want=$want")
    }
  }
}
