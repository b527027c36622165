package graft

import org.apache.spark.sql.functions._
import graft.operators.Skyline

class SkylineSpec extends GraftSpecBase {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Double, Double)]): Set[Long] =
    pts.filter { case (_, c, g) =>
      !pts.exists { case (_, qc, qg) =>
        qc <= c && qg >= g && (qc < c || qg > g)
      }
    }.map(_._1).toSet

  private def run(pts: Seq[(Long, Double, Double)], nBins: Int = 256): Set[Long] =
    Skyline.skyline(pts.toDF("id", "cost", "gain"), "cost", "gain", nBins)
      .collect().map(_.getLong(0)).toSet

  test("known frontier, dominated points dropped") {
    initLog()
    val pts = Seq((1L, 1.0, 1.0), (2L, 2.0, 3.0), (3L, 3.0, 2.0),
      (4L, 2.0, 1.0), (5L, 1.0, 3.0))
    // (1,3) dominates everything else
    assert(run(pts) == Set(5L))
  }

  test("NULL cost/gain rows are excluded explicitly, others unaffected") {
    initLog()
    val df = Seq[(Long, java.lang.Double, java.lang.Double)](
      (1L, 1.0, 3.0), (2L, null, 9.0), (3L, 0.5, null), (4L, 2.0, 1.0))
      .toDF("id", "cost", "gain")
    val out = Skyline.skyline(df, "cost", "gain")
      .collect().map(_.getLong(0)).toSet
    // the NULL rows neither appear nor dominate: (4) is dominated by
    // (1) only; (2)'s huge gain and (3)'s tiny cost must not count
    assert(out == Set(1L))
  }

  test("duplicate points do not dominate each other: both kept") {
    initLog()
    val pts = Seq((1L, 1.0, 2.0), (2L, 1.0, 2.0), (3L, 2.0, 1.0))
    assert(run(pts) == Set(1L, 2L))
  }

  test("degenerate: all costs equal collapses to the max-gain rows") {
    initLog()
    val pts = Seq((1L, 5.0, 1.0), (2L, 5.0, 3.0), (3L, 5.0, 3.0))
    assert(run(pts) == Set(2L, 3L))
  }

  test("matches brute force on a seeded random cloud, any bin count") {
    initLog()
    val rnd = new scala.util.Random(42)
    val pts = (0L until 300L).map(i =>
      (i, rnd.nextDouble() * 100, rnd.nextDouble() * 100))
    val expect = brute(pts)
    assert(run(pts) == expect)
    assert(run(pts, nBins = 1) == expect)   // prefilter degenerates, still exact
    assert(run(pts, nBins = 7) == expect)
  }

  test("worst case: gain rises with cost, the frontier is everything") {
    initLog()
    // paying more always buys more: no point dominates any other, the
    // frontier IS the dataset and the prefilter may drop nothing
    val pts = (0L until 50L).map(i => (i, i.toDouble, i.toDouble))
    assert(run(pts) == pts.map(_._1).toSet)
  }

  test("cheap-and-high point dominates the whole diagonal") {
    initLog()
    val diag = (1L until 50L).map(i => (i, i.toDouble, 100.0 - i))
    assert(run(diag :+ (0L, 0.0, 100.0)) == Set(0L))
  }
}
