package graft

import org.apache.spark.sql.functions._

/** `llm_dedup_cluster`'s connected-components kernel at adversarial
  * diameter (r3 verdict item 7): plain min-label propagation needs
  * diameter(graph) rounds — a path graph makes that linear in the
  * cluster size, i.e. a 1000-link dup chain would be 1000 Spark jobs
  * at 100 TB. The pointer-shortcut round (label := label(label))
  * collapses chains geometrically; this spec pins both the result and
  * the logarithmic round count on a long path. */
class DedupClusterDiameterSpec extends SparkTestBase {

  test("a 64-node path collapses to one cluster in O(log n) rounds, not O(n)") {
    import spark.implicits._
    val n = 64
    val nodes = (0L until n.toLong).toDF("doc_id")
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) =
      operators.LlmSimilarity.connectedComponents(spark, nodes, edges)
    val got = labels.orderBy("doc_id").collect()
    assert(got.length == n)
    assert(got.forall(_.getLong(1) == 0L),
      s"path did not collapse to the min label: ${got.take(5).mkString(",")}")
    // diameter 63: plain propagation would need 63 rounds (+1 to detect
    // the fixpoint); with the shortcut the label horizon at least
    // doubles per round, so well under 16 rounds must suffice
    assert(rounds <= 16, s"expected O(log n) rounds on a path, got $rounds")
    assert(rounds >= 3, s"sanity: a 64-path cannot settle in $rounds rounds")
  }

  test("a 1024-node path, a star, and a two-cluster bridge all settle " +
      "in ≤ 2·log₂(n) rounds (r4 verdict item 6)") {
    import spark.implicits._
    val n = 1024
    val log2n = 10 // log₂(1024)

    // adversarial chain: worst diameter per edge count
    val pathNodes = (0L until n.toLong).toDF("doc_id")
    val pathEdges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a", "b")
    val (pl, pr) =
      operators.LlmSimilarity.connectedComponents(spark, pathNodes, pathEdges)
    assert(pl.collect().forall(_.getLong(1) == 0L),
      "1024-path must collapse to label 0")
    assert(pr <= 2 * log2n, s"1024-path took $pr rounds (> ${2 * log2n})")

    // star centered on the MAX id: every leaf must pull the min label
    // (leaf 0) through the hub, the shape where naive min-push stalls
    val starNodes = (0L until n.toLong).toDF("doc_id")
    val hub = n - 1L
    val starEdges = (0L until hub).map(i => (hub, i)).toDF("a", "b")
    val (sl, sr) =
      operators.LlmSimilarity.connectedComponents(spark, starNodes, starEdges)
    assert(sl.collect().forall(_.getLong(1) == 0L),
      "star must collapse to label 0 through the hub")
    assert(sr <= 2 * log2n, s"star took $sr rounds (> ${2 * log2n})")

    // two dense clusters joined by a single bridge edge: the min label
    // of the left cluster must cross the bridge and flood the right
    val half = n / 2
    val bridgeNodes = (0L until n.toLong).toDF("doc_id")
    val cliqueish = (1 until half).flatMap(i =>
      Seq((0L, i.toLong), (half.toLong, (half + i).toLong)))
    val bridgeEdges = (cliqueish :+ ((half - 1).toLong, half.toLong))
      .toDF("a", "b")
    val (bl, br) =
      operators.LlmSimilarity.connectedComponents(spark, bridgeNodes, bridgeEdges)
    assert(bl.collect().forall(_.getLong(1) == 0L),
      "bridged clusters must merge to label 0")
    assert(br <= 2 * log2n, s"bridge took $br rounds (> ${2 * log2n})")
  }

  test("fused convergence: one action per round, not two (r11 verdict #3)") {
    import spark.implicits._
    // The changed-label tally rides the checkpoint-materialization
    // action via an accumulator; the old separate per-round agg would
    // show up here as ~2 SQL executions per round. Raw Spark JOBS are
    // the wrong unit (AQE materializes each shuffle stage as its own
    // job, ~6/round for the two joins); one ACTION = one
    // SQLExecutionStart event, which nested AQE stage jobs share.
    // Expected: 1 per round (the localCheckpoint) + 1 for the edges
    // checkpoint + 1 for the final collect, with small slack.
    val execs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        case _: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          execs.incrementAndGet(); ()
        case _ => ()
      }
    }
    val nodes = (0L until 128L).toDF("doc_id")
    val edges = (0L until 127L).map(i => (i, i + 1)).toDF("a", "b")
    spark.sparkContext.addSparkListener(listener)
    val rounds =
      try {
        val (labels, r) =
          operators.LlmSimilarity.connectedComponents(spark, nodes, edges)
        assert(labels.collect().forall(_.getLong(1) == 0L))
        // drain the listener bus so every execution-start is counted
        org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
        r
      } finally spark.sparkContext.removeSparkListener(listener)
    val n = execs.get()
    assert(n <= rounds + 3,
      s"$n SQL executions for $rounds rounds — convergence no longer fused?")
    assert(n >= rounds, s"sanity: $n executions cannot cover $rounds rounds")
  }

  test("disjoint components keep distinct minimum labels") {
    import spark.implicits._
    // two triangles + one isolated node
    val nodes = (0L to 6L).toDF("doc_id")
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 4L), (4L, 5L), (5L, 3L))
      .toDF("a", "b")
    val (labels, _) =
      operators.LlmSimilarity.connectedComponents(spark, nodes, edges)
    val m = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(0L, 1L, 2L).forall(m(_) == 0L))
    assert(Seq(3L, 4L, 5L).forall(m(_) == 3L))
    assert(m(6L) == 6L, "isolated node must keep its own label")
  }
}
