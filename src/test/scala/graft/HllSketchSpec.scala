package graft

import org.apache.spark.sql.functions._

/** `agg_hll_sketch` (DataSketches HLL): the merge property that makes
  * sketches the 100 TB distinct-count answer — unioning per-day
  * sketches must estimate exactly what one pass over the whole data
  * estimates — plus the error contract vs the exact count. The
  * operator now carries both as its oracle'd contract booleans (r9);
  * this spec re-derives them from raw hll_* calls so a broken
  * in-operator check can't self-certify. */
class HllSketchSpec extends SparkTestBase {

  test("operator output: contract booleans true, exact count positive") {
    val row = operators.Extras2.aggHllSketch(spark, sf).collect().head
    assert(row.getAs[Long]("exact_users") > 0)
    assert(row.getAs[Boolean]("merge_consistent"), "sketch merge is lossy")
    assert(row.getAs[Boolean]("err_ok"), "HLL estimate off exact by >10%")
  }

  test("independent re-derivation: day-union estimates like a direct sketch, within 5% of exact") {
    val e = Tables.events(spark, sf)
    val merged = e.groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .head().getLong(0)
    val Array(direct, exact) = e
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))),
        countDistinct(col("user_id")))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    assert(merged == direct, s"sketch merge is lossy: merged=$merged direct=$direct")
    assert(math.abs(direct - exact.toDouble) / exact < 0.05,
      s"HLL estimate $direct off exact $exact by >5%")
  }
}
