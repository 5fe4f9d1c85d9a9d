package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the curation-pipeline and interpolation
  * keys (the DuckDB oracle pins exact values; these pin the physics). */
class PipelineSpec extends SparkTestBase {

  test("ts_interpolate: gap bars lie between their bracketing observations") {
    val out = operators.TimeSeries.tsInterpolate(spark, sf)
    // every non-gap bar keeps its observed value; every interpolated
    // value is within [min, max] of the type's observed values
    val byType = operators.TimeSeries.tsGapfill(spark, sf)
      .filter(col("is_gap") === 0)
      .groupBy("event_type")
      .agg(min("filled_value").as("lo"), max("filled_value").as("hi"))
    val bad = out.filter(col("is_gap") === 1 && col("interp_value").isNotNull)
      .join(byType, "event_type")
      .filter(col("interp_value") < col("lo") - 1e-6 ||
        col("interp_value") > col("hi") + 1e-6)
    assert(bad.count() == 0, "interpolation left the observed envelope")
    assert(out.filter(col("is_gap") === 1).count() > 0, "no gaps exercised")
  }

  test("llm_decontaminate flags only training docs, with positive overlap") {
    val rows = operators.LlmText.llmDecontaminate(spark, sf)
    assert(rows.filter(col("doc_id") % 10 === 0).count() == 0,
      "eval docs must not appear as flagged training docs")
    assert(rows.filter(col("n_shared_grams") < 1 || col("n_eval_docs") < 1).count() == 0)
  }

  test("llm_corpus_pipeline pushes the lang gate into the parquet scan") {
    val p = plan(operators.LlmText.llmCorpusPipeline(spark, sf))
    assert(p.contains("PushedFilters: [") && p.contains("In(lang"),
      s"lang gate did not reach the scan:\n${p.take(2000)}")
  }

  test("llm_corpus_pipeline: packs are contiguous and capacity-shaped") {
    val packs = operators.LlmText.llmCorpusPipeline(spark, sf).collect()
    assert(packs.nonEmpty)
    val ids = packs.map(_.getLong(0))
    assert(ids.toSeq == (ids.min to ids.max).toSeq, "pack ids must be contiguous")
    // every pack except the last starts because the previous crossed
    // its 512-token boundary: all but the last hold >= 1 doc and the
    // total token count equals the sum over packs
    assert(packs.forall(_.getLong(1) >= 1))
  }
}
