package graft

import org.apache.spark.sql.functions._

/** Windows (§2.5) + scalar families (§2.7): semantic invariants and the
  * plan properties the scale story depends on. */
class WindowsFunctionsSpec extends SparkTestBase {

  test("win_rank: rank functions are consistent within each partition") {
    val rows = operators.Windows.winRank(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, part) =>
      val rns = part.map(_.getInt(3))
      assert(rns.toSeq == (1 to part.length), "row_number not dense 1..n")
      // rank <= row_number, dense_rank <= rank everywhere
      part.foreach { r =>
        assert(r.getLong(4) <= r.getInt(3) && r.getLong(5) <= r.getLong(4))
      }
    }
  }

  test("win_topk returns at most 5 per segment") {
    val counts = operators.Windows.winTopk(spark, sf)
      .groupBy("c_mktsegment").count().collect()
    counts.foreach(r => assert(r.getLong(1) <= 5))
  }

  test("win_frame_rows: running sum is monotone-consistent with lag") {
    val df = operators.Windows.winFrameRows(spark, sf)
    // last row per user's run_sum == total per user
    val lastPerUser = df.groupBy("user_id")
      .agg(max("run_n").as("n"), max("run_sum").as("max_run"))
    val totals = Tables.events(spark, sf).groupBy("user_id")
      .agg(count(lit(1)).as("n2"), Det.dsum2(col("value")).as("total"))
    val joined = lastPerUser.join(totals, "user_id")
      .filter(col("n") =!= col("n2") || abs(col("max_run") - col("total")) > 1e-9)
    assert(joined.count() == 0)
  }

  test("win_frame_range: rolling window never exceeds 1h of data") {
    // every row's roll_n_1h <= run count of events within [ts-1h, ts]
    val res = operators.Windows.winFrameRange(spark, sf).limit(50).collect()
    val all = Tables.events(spark, sf)
      .select("user_id", "ts", "value").collect()
      .groupBy(_.getLong(0))
    res.foreach { r =>
      val uid = r.getLong(0); val ts = r.getTimestamp(2)
      val lo = new java.sql.Timestamp(ts.getTime - 3600 * 1000)
      val want = all(uid).count { x =>
        val t = x.getTimestamp(1); !t.before(lo) && !t.after(ts)
      }
      assert(r.getLong(4) == want, s"user $uid @$ts: got ${r.getLong(4)} want $want")
    }
  }

  test("scalar families stay in a single codegen stage (no shuffle)") {
    Seq(operators.Functions.fnString, operators.Functions.fnMath,
      operators.Functions.fnCond, operators.Functions.fnJson).foreach { q =>
      val df = q(spark, sf)
      df.collect() // materialize THIS QueryExecution so the AQE final plan exists
      val p = plan(df)
      assert(!p.contains("Exchange") || p.contains("rangepartitioning"),
        s"unexpected shuffle beyond the final sort:\n$p")
      // `*(n)` prefixes mark WholeStageCodegen spans in the tree string
      assert(p.contains("*(1)"), s"expression not codegen'd:\n$p")
    }
  }

  test("fn_array higher-order fold equals explode-based sum") {
    val viaFold = operators.Functions.fnArray(spark, sf)
      .select("doc_id", "sum_len")
    val viaExplode = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id").agg(sum(length(col("w"))).cast("int").as("sum_len2"))
    val bad = viaFold.join(viaExplode, "doc_id")
      .filter(col("sum_len") =!= col("sum_len2"))
    assert(bad.count() == 0)
  }

  test("bround is half-even where round is half-up") {
    val df = spark.range(1).select(
      bround(lit(2.5), 0).as("be"), round(lit(2.5), 0).as("ru"),
      bround(lit(3.5), 0).as("be2"))
    val r = df.collect()(0)
    assert(r.getDouble(0) == 2.0 && r.getDouble(1) == 3.0 && r.getDouble(2) == 4.0)
  }
}
