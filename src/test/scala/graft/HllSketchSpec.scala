package graft

/** `agg_hll_sketch` (DataSketches HLL): the merge property that makes
  * sketches the 100 TB distinct-count answer — unioning per-day
  * sketches must estimate exactly what one pass over the whole data
  * estimates — plus the error contract vs the exact count. */
class HllSketchSpec extends SparkTestBase {

  test("per-day sketch union estimates like a direct sketch, within HLL error of exact") {
    val row = operators.Extras2.aggHllSketch(spark, sf).collect().head
    val merged = row.getLong(0)
    val direct = row.getLong(1)
    val exact = row.getLong(2).toDouble
    assert(merged == direct,
      s"sketch merge is lossy: merged=$merged direct=$direct")
    assert(math.abs(direct - exact) / exact < 0.05,
      s"HLL estimate $direct off exact $exact by >5%")
  }
}
