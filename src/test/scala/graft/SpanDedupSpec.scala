package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Semantic contract of [[operators.LlmText.llmSpanDedup]] on a
  * hand-built corpus: a wholesale duplicate loses every span, a doc
  * sharing one boilerplate block loses exactly that block, and a
  * short unique doc passes through untouched. (The oracle gate proves
  * engine parity at sf0.01/sf0.1/10×; this pins the SEMANTICS to a
  * corpus where the expected output is derivable by hand.) */
class SpanDedupSpec extends SparkTestBase {

  private def span(tag: String): String =
    (1 to 16).map(i => s"$tag$i").mkString(" ")

  test("span dedup: wholesale dup loses all, partial overlap loses the shared block") {
    val a = span("a"); val b = span("b"); val c = span("c")
    val dShort = "unique tail shorter than one span"
    val docs = Seq(
      (0L, s"$a $b"),      // first occurrence of A and B
      (1L, s"$a $b"),      // wholesale duplicate of doc 0
      (2L, s"$c $b"),      // fresh C + boilerplate B
      (3L, dShort))        // short unique doc
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val rows = docs.map { case (id, t) =>
      Row(id, t, "en", "spec", t.length.toLong) }
    // appId-suffixed via sinkPath so two concurrent JVMs running the
    // suite never interleave overwrite-writes into one directory
    val dir = Tables.sinkPath(spark, "span_spec_docs", "span_spec")
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = operators.LlmText.llmSpanDedup(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (Option(r.getString(1)), r.getLong(2), r.getLong(3))).toMap

    assert(out(0L) == ((Some(s"$a $b"), 2L, 0L)), "first doc keeps everything")
    assert(out(1L) == ((None, 0L, 2L)), "wholesale duplicate loses every span")
    assert(out(2L) == ((Some(c), 1L, 1L)), "only the boilerplate block drops")
    assert(out(3L) == ((Some(dShort), 1L, 0L)), "short unique doc untouched")
  }
}
