package graft

import org.apache.spark.sql.functions._

/** `llm_bpe_train` (operators/Clustering.scala): merge determinism
  * under repartitioning and the corpus-shrink property of greedy
  * pair fusion. */
class BpeSpec extends SparkTestBase {

  test("merge table is invariant under input partitioning") {
    val m3 = operators.Clustering.bpeTrain(spark, sf, nMerges = 4, preShuffle = 3)
      .collect().toSeq
    val m8 = operators.Clustering.bpeTrain(spark, sf, nMerges = 4, preShuffle = 8)
      .collect().toSeq
    assert(m3 == m8, s"merge tables differ:\n$m3\nvs\n$m8")
    assert(m3.size == 4)
    m3.foreach(r => assert(r.getLong(3) > 0))
  }

  test("each learned merge has a strictly positive, non-increasing-rank count on the sample") {
    val m = operators.Clustering.bpeTrain(spark, sf, nMerges = 4).collect()
    // counts need not be monotone (a merge can create new frequent
    // pairs), but rank 1 must be the global max of round 1: check it
    // dominates a direct round-1 pair count
    val w = split(col("text"), " ")
    val direct = Tables.documents(spark, sf)
      .filter(pmod(col("doc_id"), lit(10)) === 0)
      .select(explode(when(size(w) >= 2,
        transform(sequence(lit(1), size(w) - 1),
          i => struct(element_at(w, i).as("a"), element_at(w, i + 1).as("b"))))
        .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("pr"))
      .groupBy("pr.a", "pr.b").agg(count(lit(1)).as("n"))
      .agg(max("n")).collect().head.getLong(0)
    assert(m(0).getLong(3) == direct,
      s"rank-1 merge count ${m(0).getLong(3)} != round-1 max pair count $direct")
  }
}
