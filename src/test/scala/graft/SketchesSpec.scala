package graft

import org.apache.spark.sql.functions._

/** Count–min sketch (operators/Sketches.scala): the CMS contract —
  * never underestimates, overestimates bounded by collision mass —
  * plus the boundedness that makes it a sketch at all. */
class SketchesSpec extends SparkTestBase {

  test("cms never underestimates and total error is collision-bounded") {
    val r = SparkEntry.queries("agg_cms")(spark, sf).cache()
    val bad = r.filter(col("est") < col("true_cnt")).count()
    assert(bad == 0, s"$bad keys underestimated — CMS guarantee broken")
    // expected overestimate per row-hash is N/W; with D=4 independent
    // rows the min's expected excess is far smaller. Assert the loose
    // per-key bound 3·N/W holds for every key (Markov at p=1/3 per
    // row, all 4 rows simultaneously over is vanishingly unlikely)
    val n = Tables.lineitem(spark, sf).count()
    val bound = 3.0 * n / operators.Sketches.W
    val over = r.withColumn("ex", col("est") - col("true_cnt"))
      .agg(max("ex")).first().getLong(0)
    assert(over <= bound, s"max excess $over above 3N/W = $bound")
    r.unpersist()
  }

  test("sketch is bounded at D*W cells regardless of input size") {
    // rebuild the sketch stage alone and count its rows
    val li = Tables.lineitem(spark, sfData)
      .select(col("l_suppkey").cast("string").as("k"))
    val cells = li.select(explode(array(
      (0 until operators.Sketches.D).map(r => struct(lit(r).as("r"),
        operators.Sketches.bucket(md5(col("k")), r).as("b"))): _*)).as("c"))
      .groupBy(col("c.r"), col("c.b")).count()
    assert(cells.count() <= operators.Sketches.D * operators.Sketches.W)
  }
}
