package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §2 (normative operator
  * inventory; the reference checkout is empty, see SURVEY.md §0) and §7.
  *
  * `queries` carries one entry per implemented operator; `oracleSql`
  * carries the DuckDB-runnable ANSI twin for every oracle-checkable key.
  */
object SparkEntry {

  /** Flagship query (TPC-H Q1 pricing summary) on sf0.001; the driver
    * smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.aggPricingSummary(spark, "/root/testdata/sf0.001")

  private def registry: Seq[(String, QFn)] =
    operators.Relational.entries ++
      operators.Windows.entries ++
      operators.Functions.entries ++
      operators.UDX.entries ++
      operators.LlmText.entries ++
      operators.LlmSimilarity.entries ++
      operators.LlmLsh.entries ++
      operators.LlmQuantize.entries ++
      operators.Multimodal.entries ++
      operators.Extras.entries ++
      operators.Extras2.entries ++
      operators.Composite.entries ++
      operators.Composite2.entries ++
      operators.SnapshotTable.entries ++
      operators.SnapshotLog.entries ++
      operators.Clustering.entries ++
      operators.Graph.entries ++
      operators.Sketches.entries ++
      operators.TimeSeries.entries ++
      operators.TimeSeries2.entries ++
      operators.LlmCorpus.entries ++
      operators.IndexStoreOp.entries ++
      operators.Unigram.entries ++
      operators.FuzzyJoin.entries ++
      plans.AsOfJoinPlans.entries ++
      streaming.Streaming.entries

  private def oracleRegistry: Seq[(String, String)] =
    operators.Relational.oracles ++
      operators.Windows.oracles ++
      operators.Functions.oracles ++
      operators.UDX.oracles ++
      operators.LlmText.oracles ++
      operators.LlmSimilarity.oracles ++
      operators.LlmLsh.oracles ++
      operators.LlmQuantize.oracles ++
      operators.Multimodal.oracles ++
      operators.Extras.oracles ++
      operators.Extras2.oracles ++
      operators.Composite.oracles ++
      operators.Composite2.oracles ++
      operators.SnapshotTable.oracles ++
      operators.SnapshotLog.oracles ++
      operators.Clustering.oracles ++
      operators.Graph.oracles ++
      operators.Sketches.oracles ++
      operators.TimeSeries.oracles ++
      operators.TimeSeries2.oracles ++
      operators.LlmCorpus.oracles ++
      operators.IndexStoreOp.oracles ++
      operators.Unigram.oracles ++
      operators.FuzzyJoin.oracles ++
      plans.AsOfJoinPlans.oracles ++
      streaming.Streaming.oracles

  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val r = registry
    require(r.map(_._1).distinct.size == r.size, "duplicate query keys")
    r.toMap
  }

  def oracleSql: Map[String, String] = {
    val o = oracleRegistry
    val qs = registry.map(_._1).toSet
    require(o.forall(kv => qs.contains(kv._1)), "oracle for unknown query key")
    require(o.map(_._1).distinct.size == o.size, "duplicate oracle keys")
    o.toMap
  }
}
