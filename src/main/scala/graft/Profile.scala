package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  ($n rows)")
    }
    // warmup
    Tables.documents(spark, d).count()
    val w = split(col("text"), " ")
    val bg = array_distinct(expr("transform(sequence(1, size(split(text,' '))-1), i -> concat(element_at(split(text,' '),i), '_', element_at(split(text,' '),i+1)))"))
    t("docs scan")(Tables.documents(spark, d).count())
    t("bigrams only")(Tables.documents(spark, d).select(bg.as("g")).agg(sum(size(col("g")))).count())
    t("bigrams+hash+sort")(Tables.documents(spark, d)
      .select(sort_array(org.apache.spark.sql.functions.transform(bg, x => xxhash64(x))).as("hg"))
      .agg(sum(size(col("hg")))).count())
    t("full ngram_jaccard")(operators.LlmSimilarity.llmNgramJaccard(spark, d).count())
    // native vs composed gram hashing (the composed HOF chain is
    // CodegenFallback and re-tokenizes per gram — kept here as the
    // regression comparison for HashedBigrams)
    t("grams composed (interpreted)")(Tables.documents(spark, d)
      .select(org.apache.spark.sql.functions.transform(bg, x => xxhash64(x)).as("hg"))
      .select(explode(col("hg"))).count())
    t("grams native (HashedBigrams)")(Tables.documents(spark, d)
      .select(graft.functions.HashedBigrams(col("text")).as("hg"))
      .select(explode(col("hg"))).count())
    t("near_dedup signatures")(operators.LlmSimilarity.minhashSignatures(spark, d).count())
    t("full near_dedup")(operators.LlmSimilarity.llmNearDedup(spark, d).count())
    spark.stop()
  }
}
