package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends GraftSpecBase {
  import spark.implicits._

  test("binned interval join equals the naive non-equi join, incl. boundaries") {
    initLog()
    // intervals of varying length, some spanning multiple bins
    val intervals = Seq(
      (1L, 100L, 0L, 50L),     // within one bin (width 100)
      (1L, 101L, 40L, 160L),   // spans bins 0-1
      (2L, 102L, 90L, 310L),   // spans bins 0-3 (longer than binWidth)
      (3L, 103L, 200L, 300L)   // bin-aligned edges
    ).toDF("ikey", "interval_id", "w_start", "w_end")
    val probe = Seq(
      (1L, 10L, 0L), (1L, 11L, 40L), (1L, 12L, 49L), (1L, 13L, 50L),
      (1L, 14L, 159L), (1L, 15L, 160L),
      (2L, 20L, 90L), (2L, 21L, 200L), (2L, 22L, 309L), (2L, 23L, 310L),
      (3L, 30L, 199L), (3L, 31L, 200L), (3L, 32L, 299L), (3L, 33L, 300L),
      (9L, 90L, 100L)          // key with no intervals
    ).toDF("pkey", "row_id", "t")

    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("row_id", "interval_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val naive = pairs(probe.join(intervals,
      col("pkey") === col("ikey") &&
        col("t") >= col("w_start") && col("t") < col("w_end")))
    for (width <- Seq(100L, 64L, 1000L)) {
      val binned = RangeJoin.binnedIntervalJoin(probe, intervals,
        "pkey", "ikey", "t", "w_start", "w_end", width)
      assert(pairs(binned) == naive, s"binWidth=$width")
      // no duplicate (row, interval) pairs from bin replication
      assert(binned.count() == naive.size, s"dup rows at binWidth=$width")
    }
    // sanity on the fixture itself: inclusive start, exclusive end
    assert(naive.contains((11L, 101L)) && naive.contains((10L, 100L)))
    assert(!naive.contains((13L, 100L)) && !naive.contains((15L, 101L)))
  }

  test("property: binned == naive for random intervals, keys, and widths") {
    initLog()
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    import org.scalacheck.Test.{Result => ScResult}
    val genCase = for {
      nIv <- Gen.choose(0, 30)
      nPr <- Gen.choose(0, 60)
      ivs <- Gen.listOfN(nIv, for {
        k <- Gen.choose(0L, 4L)
        s <- Gen.choose(-500L, 500L)
        len <- Gen.choose(0L, 400L)
      } yield (k, s, s + len))
      prs <- Gen.listOfN(nPr, for {
        k <- Gen.choose(0L, 4L)
        t <- Gen.choose(-600L, 900L)
      } yield (k, t))
      width <- Gen.oneOf(1L, 7L, 64L, 100L, 1000L)
    } yield (ivs, prs, width)

    val prop = Prop.forAllNoShrink(genCase) { case (ivs, prs, width) =>
      val intervals = ivs.zipWithIndex
        .map { case ((k, s, e), i) => (k, i.toLong, s, e) }
        .toDF("ikey", "interval_id", "w_start", "w_end")
      val probe = prs.zipWithIndex
        .map { case ((k, t), i) => (k, i.toLong, t) }
        .toDF("pkey", "row_id", "t")
      val naive = probe.join(intervals,
          col("pkey") === col("ikey") &&
            col("t") >= col("w_start") && col("t") < col("w_end"))
        .select("row_id", "interval_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val binned = RangeJoin.binnedIntervalJoin(probe, intervals,
          "pkey", "ikey", "t", "w_start", "w_end", width)
        .select("row_id", "interval_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      binned.toSet == naive && binned.length == naive.size
    }
    val res: ScResult =
      check(Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("range join plans as an equi-join on (key, bin), not nested-loop") {
    initLog()
    val df = RangeJoin.errorNeighborhood(spark, sf)
    val names = df.queryExecution.executedPlan.toString()
    assert(!names.contains("BroadcastNestedLoopJoin") &&
      !names.contains("CartesianProduct"), names)
    assert(names.contains("SortMergeJoin") || names.contains("ShuffledHashJoin")
      || names.contains("BroadcastHashJoin"), names)
  }
}
