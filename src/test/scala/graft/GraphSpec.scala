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

  test("pageRank fails loudly on an empty edge list") {
    initLog()
    val empty = Seq.empty[(String, String)].toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      Graph.pageRank(empty)
    }
    assert(e.getMessage.contains("empty edge list"))
  }

  test("triangleStats: hand-checked counts and orientation exactness") {
    initLog()
    // K4 has 4 triangles, 12 wedges, clustering 1.0
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b))
      .toDF("u", "v")
    val r = Graph.triangleStats(k4).collect().head
    assert(r.getAs[Long]("n_nodes") == 4L && r.getAs[Long]("n_edges") == 6L)
    assert(r.getAs[Long]("n_triangles") == 4L)
    assert(r.getAs[Long]("n_wedges") == 12L)
    assert(r.getAs[Double]("clustering") == 1.0)
    // a path has wedges but zero triangles
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val p = Graph.triangleStats(path).collect().head
    assert(p.getAs[Long]("n_triangles") == 0L)
    assert(p.getAs[Long]("n_wedges") == 2L)
    // hub + one closing rim edge: triangles only where the rim closes
    val hub = (Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (1L, 2L)))
      .toDF("u", "v")
    assert(Graph.triangleStats(hub).collect().head
      .getAs[Long]("n_triangles") == 1L)
  }

  test("triangleStats equals an unoriented brute force on the corpus graph") {
    initLog()
    val e = Graph.supplierCoEdges(spark, sf)
    val got = Graph.triangleStats(e).collect().head.getAs[Long]("n_triangles")
    val rows = e.collect().map(r => (r.getLong(0), r.getLong(1)))
    val set = rows.toSet
    val brute = (for {
      (a, b) <- rows; (c, d) <- rows
      if a == c && d > b && set.contains((b, d))
    } yield 1).size.toLong
    assert(got == brute)
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

  test("neighborJaccard: square graph predicts both diagonals at 1.0") {
    initLog()
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("u", "v")
    val out = Graph.neighborJaccard(square).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set((1L, 3L), (2L, 4L))) // the unconnected pairs
    assert(out.values.forall { case (c, j) => c == 2L && j == 1.0 })
    // existing edges never surface
    assert(!out.contains((1L, 2L)))
  }

  test("neighborJaccard maxDeg drops hub centers (recall contract)") {
    initLog()
    // star: hub 0 touches 1..4; all evidence flows through the hub
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("u", "v")
    assert(Graph.neighborJaccard(star).count() > 0)
    assert(Graph.neighborJaccard(star, maxDeg = 3).count() == 0)
  }

  test("neighborJaccard hub stress: maxDeg keeps non-hub evidence, " +
      "kills the quadratic wedge fan-out") {
    initLog()
    // two 4-cliques each missing one edge (the prediction targets),
    // plus a hub wired to ALL eight nodes — the 100 TB skew shape.
    // Hub degree 8; removed-edge endpoints degree 3, the rest 4.
    def cliqueMinus(ns: Seq[Long]): Seq[(Long, Long)] =
      (for { a <- ns; b <- ns if a < b } yield (a, b))
        .filterNot(p => p == (ns(0), ns(1)))
    val hub = 100L
    val edges = (cliqueMinus(Seq(1L, 2L, 3L, 4L)) ++
      cliqueMinus(Seq(5L, 6L, 7L, 8L)) ++
      (1L to 8L).map(n => (hub, n))).toDF("u", "v")
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    val full = asMap(Graph.neighborJaccard(edges, k = 1000))
    val capped = asMap(Graph.neighborJaccard(edges, k = 1000, maxDeg = 7))
    // the recall contract: capping only DROPS common-neighbor
    // evidence (wedges centered on hubs) — never invents pairs, never
    // inflates counts
    assert(capped.keySet.subsetOf(full.keySet))
    assert(capped.forall { case (p, (c, _)) => c <= full(p)._1 })
    // the in-clique targets keep their non-hub evidence: (1,2) has
    // common neighbors {3, 4, hub} unguarded (3/(3+3-3) = 1.0),
    // {3, 4} capped; degrees (denominators) stay the FULL graph's —
    // 2/(3+3-2) = 0.5
    assert(full((1L, 2L)) == ((3L, 1.0)))
    assert(capped((1L, 2L)) == ((2L, 0.5)))
    // a cross-clique pair's ONLY witness is the hub: present
    // unguarded, gone capped — this is the documented recall loss
    assert(full.contains((1L, 5L)) && full((1L, 5L))._1 == 1L)
    assert(!capped.contains((1L, 5L)))
    // the wedge fan-out delta the cap buys: Σ_center C(deg, 2) drops
    // by the hub's C(8,2) = 28 of 64 — the quadratic term is the
    // hub's alone, and it carries the least-informative evidence
    val deg = edges.collect().flatMap(r => Seq(r.getLong(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    def wedges(m: Map[Long, Long]) = m.values.map(d => d * (d - 1) / 2).sum
    assert(wedges(deg) == 64L)
    assert(wedges(deg - hub) == 36L)
  }

  test("kCore: cliques survive, chains/stars/pairs peel away") {
    initLog()
    // clique on 10..14 (deg 4) ∪ path 20-21-22-23 ∪ star 30→31,32,33
    val clique = for { a <- 10L to 14L; b <- a + 1 to 14L } yield (a, b)
    val path = Seq((20L, 21L), (21L, 22L), (22L, 23L))
    val star = Seq((30L, 31L), (30L, 32L), (30L, 33L))
    val edges = (clique ++ path ++ star).toDF("u", "v")
    val core2 = Graph.kCore(edges, k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the 2-core is exactly the clique, every member at degree 4;
    // the path peels from both ends, the star from its leaves
    assert(core2 == (10L to 14L).map(_ -> 4L).toMap)
    // k above the clique degree empties the graph
    assert(Graph.kCore(edges, k = 5).count() == 0)
    // triangle is the minimal 2-core
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    assert(Graph.kCore(tri, k = 2).count() == 3)
  }

  test("property: kCore equals the plain-Scala peeling fixpoint") {
    initLog()
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters, Result => ScResult}
    def refKCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
      var es = edges.toSet
      var changed = true
      while (changed) {
        val deg = es.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (n, l) => n -> l.size }
        val keep = deg.filter(_._2 >= k).keySet
        val next = es.filter(e => keep(e._1) && keep(e._2))
        changed = next != es
        es = next
      }
      es.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .collect { case (n, l) if l.size >= k => n -> l.size.toLong }
    }
    val genCase = for {
      n <- Gen.choose(2, 12)
      density <- Gen.choose(1, 9)
      pairs = for { a <- 0 until n; b <- a + 1 until n } yield (a.toLong, b.toLong)
      keep <- Gen.listOfN(pairs.size, Gen.choose(1, 10))
      k <- Gen.choose(1, 5)
    } yield (pairs.zip(keep).collect { case (p, kk) if kk <= density => p }, k)
    val prop = Prop.forAllNoShrink(genCase) { case (edges, k) =>
      edges.isEmpty || {
        val got = Graph.kCore(edges.toDF("u", "v"), k).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == refKCore(edges, k)
      }
    }
    val res: ScResult =
      check(Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: triangle census and link prediction match plain-Scala references") {
    initLog()
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters, Result => ScResult}
    // random undirected simple graphs on up to 12 nodes — small
    // enough that the O(n^3) reference is instant, adversarial enough
    // (hubs, isolated edges, near-cliques) to stress the orientation
    val genGraph = for {
      n <- Gen.choose(2, 12)
      density <- Gen.choose(1, 9)
      pairs = for { a <- 0 until n; b <- a + 1 until n } yield (a.toLong, b.toLong)
      keep <- Gen.listOfN(pairs.size, Gen.choose(1, 10))
    } yield pairs.zip(keep).collect { case (p, k) if k <= density => p }

    val prop = Prop.forAllNoShrink(genGraph) { edges =>
      edges.isEmpty || {
        val set = edges.toSet
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val adj = nodes.map(v => v -> edges.collect {
          case (a, b) if a == v => b
          case (a, b) if b == v => a
        }.toSet).toMap
        val df = edges.toDF("u", "v")
        // triangles: brute-force triple scan
        val triRef = (for {
          (a, b) <- edges; c <- nodes if c > b
          if set((a, c)) && set((b, c))
        } yield 1).size.toLong
        val wedgeRef = nodes.map { v =>
          val d = adj(v).size.toLong; d * (d - 1) / 2 }.sum
        val t = Graph.triangleStats(df).collect().head
        val triOk = t.getAs[Long]("n_triangles") == triRef &&
          t.getAs[Long]("n_wedges") == wedgeRef &&
          t.getAs[Long]("n_edges") == edges.size.toLong
        // link prediction: every unconnected pair with common
        // neighbors, jaccard from the same adjacency
        val predRef = (for {
          a <- nodes; b <- nodes if a < b && !set((a, b))
          common = (adj(a) & adj(b)).size if common > 0
        } yield ((a, b), (common.toLong,
          common.toDouble / (adj(a).size + adj(b).size - common)))).toMap
        val got = Graph.neighborJaccard(df, k = 1000).collect()
          .map(r => ((r.getLong(0), r.getLong(1)),
            (r.getLong(2), r.getDouble(3)))).toMap
        val predOk = got.keySet == predRef.keySet && predRef.forall {
          case (k2, (c, j)) =>
            val (gc, gj) = got(k2)
            gc == c && math.abs(gj - BigDecimal(j).setScale(6,
              BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12
        }
        triOk && predOk
      }
    }
    val res: ScResult =
      check(Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("labelPropagation: two triangles over a bridge -> two communities") {
    initLog()
    // triangles {1,2,3} and {4,5,6}, bridge 3-4. Hand-run of the
    // synchronous recurrence (mode of neighbor labels, tie -> min,
    // all nodes from the SAME snapshot) converges by round 3 to
    // label 1 on the left triangle, label 3 on the right.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("u", "v")
    val labels = Graph.labelPropagation(edges, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("modularitySummary matches the hand-computed rational on the " +
      "bridged triangles") {
    initLog()
    // triangles {1,2,3},{4,5,6} + bridge 3-4, LPA labels -> the two
    // triangles. m=7, within=6, degrees (2,2,3,3,2,2) -> d_c = 7 each,
    // Σd² = 98. Q = (4·7·6 − 98)/(4·49) = 70/196 = 0.357142857…
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("u", "v")
    val labels = Graph.labelPropagation(edges, rounds = 3)
    val row = Graph.modularitySummary(edges, labels).head()
    assert(row.getAs[Long]("m") == 7L)
    assert(row.getAs[Long]("n_communities") == 2L)
    assert(row.getAs[Long]("within_edges") == 6L)
    assert(row.getAs[Long]("deg_sq_sum") == 98L)
    assert(row.getAs[Double]("modularity") == 0.357143)
    // degenerate assignment (everything one community) scores 0
    val one = edges.select(col("u").as("node")).unionByName(
        edges.select(col("v").as("node"))).distinct()
      .select(col("node"), lit(1L).as("label"))
    assert(Graph.modularitySummary(edges, one).head()
      .getAs[Double]("modularity") == 0.0)
  }

  test("graph_lpa_modularity driver lane: one sane, bounded row") {
    initLog()
    // TPC-H co-service is RANDOM — there is no planted community
    // structure, so the honest Q of the LPA assignment sits near 0
    // (measured −0.007 at sf0.01; the planted-structure floor lives
    // in the triangles test above, exact). The lane's value is the
    // deterministic scalar itself: a structural regression moves it,
    // and the DuckDB oracle pins it to 6 decimals every round.
    val row = Graph.lpaModularity(spark, "/root/testdata/sf0.01").head()
    assert(row.getAs[Long]("m") > 0L)
    assert(row.getAs[Long]("n_communities") > 1L)
    val q = row.getAs[Double]("modularity")
    assert(q >= -1.0 && q <= 1.0, s"modularity $q out of range")
    // invariant: within_edges <= m, deg_sq_sum <= (2m)^2
    assert(row.getAs[Long]("within_edges") <= row.getAs[Long]("m"))
    assert(row.getAs[Long]("deg_sq_sum") <=
      4L * row.getAs[Long]("m") * row.getAs[Long]("m"))
  }

  test("labelPropagation is deterministic under re-partitioning") {
    initLog()
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L), (6L, 7L)).toDF("u", "v")
    val a = Graph.labelPropagation(edges, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = Graph.labelPropagation(edges.repartition(5), rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("supplierKnnEdges: bounded density, canonical undirected form") {
    initLog()
    val e = Graph.supplierKnnEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(e.nonEmpty)
    // canonical (u < v), no duplicates
    assert(e.forall { case (u, v) => u < v })
    assert(e.distinct.length == e.length)
    // union-kNN density bound: |E| <= k * |V| (each node CONTRIBUTES
    // at most k picks; union can only merge picks, never add)
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct.length
    assert(e.length <= 8 * nodes, s"${e.length} edges over $nodes nodes")
  }

  test("labelPropagation universe is the edge endpoints; star adopts hub-min") {
    initLog()
    // star: hub 10 with leaves 11..14 — every leaf sees only the hub
    // (adopts 10); the hub sees 4 distinct leaf labels, tie -> min.
    val edges = (11L to 14L).map(l => (10L, l)).toDF("u", "v")
    val r1 = Graph.labelPropagation(edges, rounds = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(10L -> 11L, 11L -> 10L, 12L -> 10L,
      13L -> 10L, 14L -> 10L))
  }
}
