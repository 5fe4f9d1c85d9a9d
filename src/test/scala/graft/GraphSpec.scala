package graft

import org.apache.spark.sql.functions._

/** Graph kernels (operators/Graph.scala): hand-built graphs with
  * known answers through the production triangle/PageRank paths, plus
  * conservation invariants on real data. */
class GraphSpec extends SparkTestBase {

  import spark.implicits._

  test("triangle kernel: K4 plus a disjoint square") {
    // K4 has 4 triangles, 6 edges, 12 wedges (4 nodes of degree 3);
    // the square adds 4 edges, 4 wedges, 0 triangles
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val square = Seq((10L, 11L), (11L, 12L), (12L, 13L), (10L, 13L))
    val e = (k4 ++ square).toDF("u", "v")
    val r = operators.Graph.triangleStats(e).collect()(0)
    assert(r.getLong(0) == 10, s"edges: ${r.getLong(0)}")
    assert(r.getLong(1) == 16, s"wedges: ${r.getLong(1)}")
    assert(r.getLong(2) == 4, s"triangles: ${r.getLong(2)}")
  }

  test("connectedComponents contract: endpoints ⊆ nodes labels exactly " +
    "the node set; an endpoint outside it adds a row (documented)") {
    // the r12 own-label fold made edge endpoints CONTRIBUTE rows
    // instead of being restricted by a labels left-join — this pins
    // that membership behavior as an explicit contract (r12 ADVICE):
    // with the precondition satisfied, output ids == nodes exactly
    val nodes = Seq(1L, 2L, 3L, 9L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val (labels, _) = operators.LlmSimilarity.connectedComponents(
      spark, nodes, edges)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
    // precondition violated (endpoint 7 absent from nodes): the row
    // for 7 appears — callers passing a node SUBSET must pre-filter
    // edges; this assertion is the early warning if the behavior
    // ever changes silently
    val (labels2, _) = operators.LlmSimilarity.connectedComponents(
      spark, nodes, edges.unionAll(Seq((3L, 7L)).toDF("a", "b")))
    assert(labels2.filter(col("doc_id") === 7L).count() == 1)
  }

  test("degree-ordered count equals the naive closed-wedge count") {
    // independently count on the sampled co-purchase graph: for each
    // canonical edge pair sharing a node, check closure — the naive
    // a<b<c triple join, built here without the orientation machinery
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 7 === 0)
      .select("l_orderkey", "l_partkey")
    val e = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct().cache()
    val naive = e.as("e1").join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"),
        col("e1.u") === col("e3.u") && col("e2.v") === col("e3.v"))
      .count()
    val r = operators.Graph.triangleStats(e).collect()(0)
    assert(r.getLong(2) == naive,
      s"oriented count ${r.getLong(2)} != naive $naive")
    e.unpersist()
  }

  test("pagerank: mass conservation and uniform-graph fixpoint") {
    // a 4-cycle is regular, so the uniform distribution is the exact
    // fixpoint: every node must hold Scale/4 micro-units (up to the
    // deterministic truncation of the per-iteration integer ops)
    val cyc = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"))
    val und = cyc.toDF("u", "v")
    val ed = und.union(und.select(col("v").as("u"), col("u").as("v")))
    val pr = operators.Graph.pagerankMicro(ed, iters = 3)
      .collect().map(_.getLong(1))
    assert(pr.length == 4)
    val exact = operators.Graph.Scale / 4
    pr.foreach(p => assert(math.abs(p - exact) <= 2,
      s"regular-graph rank $p != $exact"))
  }

  test("kernels are invariant under input partitioning") {
    // integer fixed-point arithmetic means summation order CANNOT
    // change results — pin it by driving the same graph through the
    // kernels at two different partitionings
    val cyc = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"),
      ("a", "c"), ("x", "y"))
    val und = cyc.toDF("u", "v")
    val ed = und.union(und.select(col("v").as("u"), col("u").as("v")))
    val pr3 = operators.Graph.pagerankMicro(ed.repartition(3), iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val pr8 = operators.Graph.pagerankMicro(ed.repartition(8), iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(pr3.sameElements(pr8), "pagerank differs across partitionings")
    val t3 = operators.Graph.triangleStats(und.repartition(3)).collect()(0)
    val t8 = operators.Graph.triangleStats(und.repartition(8)).collect()(0)
    assert(t3 == t8, "triangle stats differ across partitionings")
  }

  test("pagerank on the cs graph: mass conserved within truncation") {
    val r = SparkEntry.queries("graph_pagerank")(spark, sf)
    val total = r.agg(sum("pr_micro")).first().getLong(0)
    val s = operators.Graph.Scale
    // truncating divisions only ever LOSE mass; bound the loss loosely
    assert(total <= s, s"mass above scale: $total")
    assert(total > s - s / 1000, s"lost >0.1% of rank mass: $total")
  }
}
