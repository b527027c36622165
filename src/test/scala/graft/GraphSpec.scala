package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

class GraphSpec extends GraftSpecBase {
  import spark.implicits._

  private def roundAt(x: Double, dec: Int): Double =
    BigDecimal(x).setScale(dec, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("pageRank matches the hand recurrence on a path graph") {
    initLog()
    val pairs = Seq(("a", "b"), ("b", "c"))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val got = Graph.pageRank(edges, iters = 3).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // same recurrence, same per-iteration 9 dp rounding
    val out = Map("a" -> 1, "b" -> 2, "c" -> 1)
    val inNbrs = Map("a" -> Seq("b"), "b" -> Seq("a", "c"), "c" -> Seq("b"))
    var r = Map("a" -> 1.0 / 3, "b" -> 1.0 / 3, "c" -> 1.0 / 3)
    for (_ <- 1 to 3)
      r = r.map { case (v, _) => v -> roundAt(
        0.15 / 3 + 0.85 * inNbrs(v).map(u => r(u) / out(u)).sum, 9) }
    assert(got == r.map { case (k, v) => k -> roundAt(v, 6) })
    // the hub outranks the leaves
    assert(got("b") > got("a") && got("a") == got("c"))
  }

  test("rank mass is conserved on a symmetric graph (no dangling leak)") {
    initLog()
    val df = Graph.transactionPageRank(spark, sf)
    val total = df.agg(sum(col("rank"))).collect().head.getDouble(0)
    assert(math.abs(total - 1.0) < 1e-4, s"rank mass $total")
  }

  test("degree histogram accounts for every node exactly once") {
    initLog()
    val hist = Graph.degreeHistogram(spark, sf)
    val nodesFromHist = hist.agg(sum(col("n_nodes"))).collect().head.getLong(0)
    val nodes = Graph.transactionEdges(spark, sf)
      .select(col("src")).distinct().count()
    assert(nodesFromHist == nodes)
  }
}
