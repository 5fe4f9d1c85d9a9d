package graft

import org.apache.spark.sql.functions._

/** The unigram-LM tokenizer family (operators/Unigram.scala):
  * segmentation VALIDITY over the real corpus (every winning path
  * spells the word, pieces all in vocab), a hand-computable win-order
  * case through the production path enumerator, and the cap-slack
  * pin the exhaustive enumeration's cost bound rests on. */
class UnigramSpec extends SparkTestBase {

  private val d = "/root/testdata/sf0.001"
  import spark.implicits._

  test("every distinct corpus word segments back to itself from vocab pieces") {
    val out = SparkEntry.queries("llm_unigram_encode")(spark, d).collect()
    assert(out.nonEmpty)
    // n_pieces >= n_words (a piece never spans words) and every doc
    // got a first-word segmentation
    out.foreach { r =>
      assert(r.getAs[Long]("n_pieces") >= r.getAs[Long]("n_words"), r.toString)
      assert(r.getAs[String]("seg_first") != null, r.toString)
    }
    // validity at the word grain, via the shared kernel
    val vocab = spark.read.parquet(operators.Unigram.unigramVocabPath(spark, d))
    val words = Tables.documents(spark, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct()
    val seg = operators.Unigram.segmentWords(words, vocab).collect()
    assert(seg.length == words.count(),
      "a corpus word found no segmentation — single-char coverage broken")
    val pieces = vocab.select("piece").collect().map(_.getString(0)).toSet
    seg.foreach { r =>
      val w = r.getAs[String]("w"); val segs = r.getAs[String]("segs")
      assert(segs.replace(" ", "") == w, s"'$segs' does not spell '$w'")
      assert(segs.split(" ").length == r.getAs[Int]("np"))
      segs.split(" ").foreach(p => assert(pieces.contains(p), s"'$p' not in vocab"))
    }
  }

  test("win order: score DESC, then fewer pieces, then lexicographic") {
    // hand-built vocab: 'ab' (score -1) beats singles (-2 each), so
    // 'abab' -> 'ab ab' (score -2) over 'a b a b' (-8) and the mixed
    // forms (-5); 'aa' has no multi piece -> 'a a'
    val words = Seq("abab", "aa").toDF("w")
    val vocab = Seq(("a", -2L), ("b", -2L), ("ab", -1L))
      .toDF("piece", "score")
    val got = operators.Unigram.segmentWords(words, vocab)
      .collect().map(r => r.getAs[String]("w") -> (r.getAs[String]("segs"),
        r.getAs[Long]("seg_score"))).toMap
    assert(got("abab") == ("ab ab", -2L), got.toString)
    assert(got("aa") == ("a a", -4L), got.toString)
  }

  test("tie-break: equal score prefers fewer pieces, then segs order") {
    // 'ab' and singles all score -1: 'ab' (np 1) must beat 'a b'
    // (np 2) at the same total only when totals tie — here 'ab' wins
    // on score alone (-1 vs -2); force a pure tie with xy/x/y at 0
    val words = Seq("xy").toDF("w")
    val vocab = Seq(("x", 0L), ("y", 0L), ("xy", 0L)).toDF("piece", "score")
    val got = operators.Unigram.segmentWords(words, vocab).collect()(0)
    assert(got.getAs[String]("segs") == "xy" && got.getAs[Int]("np") == 1,
      s"tie must resolve to fewer pieces: $got")
  }

  test("the word-length cap is slack on the shipped corpus") {
    val maxLen = Tables.documents(spark, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .agg(max(length(col("w")))).collect()(0).getInt(0)
    assert(maxLen <= operators.Unigram.WordLenCap,
      s"corpus word length $maxLen exceeds the enumeration cap — " +
        "raise WordLenCap (cost is tribonacci in length) or pre-split")
  }
}
