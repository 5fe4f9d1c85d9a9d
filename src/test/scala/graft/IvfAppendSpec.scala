package graft

import org.apache.spark.sql.functions._

/** The `llm_knn_ivf_append` maintenance contract (r11 verdict #4):
  * appending a delta batch to a deployed IVF index — assign to the
  * FIXED stored centroids, extend the partitioned list layout, never
  * retrain — must be invisible to queries: the result over the
  * appended layout equals the retrain-free one-shot query over the
  * union. Also pins that the append really happened as an append
  * (delta vectors live in the layout and are retrievable). */
class IvfAppendSpec extends SparkTestBase {

  private val d = "/root/testdata/sf0.001"

  test("append then query == retrain-free one-shot query over the union") {
    val appended = SparkEntry.queries("llm_knn_ivf_append")(spark, d)
      .collect().map(_.toSeq).toSet
    val oneShot = operators.LlmSimilarity.ivfAppendOneShot(spark, d)
      .collect().map(_.toSeq).toSet
    assert(appended.nonEmpty, "append key returned no rows at smoke scale")
    assert(appended == oneShot,
      "appended-layout query diverged from the one-shot union query — " +
        "the append path is not retrain-free-equivalent")
  }

  test("the layout holds the full union and the delta landed as an append") {
    val layout = spark.read.parquet(
      operators.LlmSimilarity.ivfAppendLayoutPath(spark, d))
    val emb = Tables.embeddings(spark, d)
    assert(layout.count() == emb.count(),
      "layout row count != corpus — append lost or duplicated vectors")
    val mod = operators.LlmSimilarity.IvfAppendMod
    val deltaInLayout = layout
      .filter(pmod(col("vec_id"), lit(10)) === mod).count()
    val deltaInCorpus = emb
      .filter(pmod(col("vec_id"), lit(10)) === mod).count()
    assert(deltaInCorpus > 0, "testdata has no delta slice — probe invalid")
    assert(deltaInLayout == deltaInCorpus,
      s"delta slice incomplete in layout: $deltaInLayout of $deltaInCorpus")
    // vec_ids are unique: an accidental double-append (base rewrite or
    // delta written twice) would show up as duplicates
    assert(layout.select("vec_id").distinct().count() == layout.count(),
      "duplicate vec_ids in layout — append wrote a slice twice")
  }
}
