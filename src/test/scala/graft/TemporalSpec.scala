package graft

import org.apache.spark.sql.functions._
import graft.operators.Temporal

class TemporalSpec extends GraftSpecBase {
  import spark.implicits._

  private val W = 604800000000L // week in µs
  private val D = 86400000000L  // day in µs

  // (user_id, event_id, event_type, t_us, value)
  private def ev(rows: (Long, Long, String, Long, Double)*) =
    rows.toDF("user_id", "event_id", "event_type", "t_us", "value")

  test("scd2: runs collapse, intervals abut, open run has null valid_to") {
    initLog()
    val out = Temporal.scd2IntervalsFrames(ev(
      (1L, 1L, "A", 1000L, 0.0), (1L, 2L, "A", 2000L, 0.0),
      (1L, 3L, "B", 3000L, 0.0), (1L, 4L, "A", 4000L, 0.0),
      (2L, 5L, "B", 1500L, 0.0)))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5)))).toMap
    // user 1: A A | B | A  ->  three versions, A's repeat stays one run
    assert(out((1L, 1L)) == (("A", 1000L, 2L, 3000L)))
    assert(out((1L, 2L)) == (("B", 3000L, 1L, 4000L)))
    assert(out((1L, 3L)) == (("A", 4000L, 1L, -1L)))
    assert(out((2L, 1L)) == (("B", 1500L, 1L, -1L)))
    assert(out.size == 4)
  }

  test("scd2: ts ties break on event_id, so run order is deterministic") {
    initLog()
    val out = Temporal.scd2IntervalsFrames(ev(
      (3L, 6L, "A", 1000L, 0.0), (3L, 7L, "B", 1000L, 0.0)))
      .orderBy(col("version")).collect()
    assert(out.map(_.getString(2)).toSeq == Seq("A", "B"))
    // zero-width interval for the superseded state at the same ts
    assert(out(0).getLong(5) == 1000L)
    assert(out(1).isNullAt(5))
  }

  test("transition matrix counts lagged pairs and row-normalizes") {
    initLog()
    val out = Temporal.transitionMatrixFrames(ev(
      (1L, 1L, "A", 1000L, 0.0), (1L, 2L, "A", 2000L, 0.0),
      (1L, 3L, "B", 3000L, 0.0), (1L, 4L, "A", 4000L, 0.0),
      (3L, 6L, "A", 9000L, 0.0), (3L, 7L, "B", 9500L, 0.0)))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("A", "A")) == ((1L, 0.333333)))
    assert(out(("A", "B")) == ((2L, 0.666667)))
    assert(out(("B", "A")) == ((1L, 1.0)))
    assert(out.size == 3)
  }

  test("cohort retention: first-week cohort, one cell per active offset") {
    initLog()
    val out = Temporal.cohortRetentionFrames(ev(
      (1L, 1L, "A", 0L, 0.0), (1L, 2L, "A", 1L * W, 0.0),
      (1L, 3L, "A", 3L * W, 0.0), (1L, 4L, "A", 3L * W + 5L, 0.0),
      (2L, 5L, "A", 1L * W, 0.0)))
      .collect().map(r =>
        (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L))
  }

  test("rolling 7d distinct actives: trailing coverage, capped at max day") {
    initLog()
    val out = Temporal.rollingDistinctUsersFrames(ev(
      (1L, 1L, "A", 0L, 0.0), (1L, 2L, "A", 2L * D, 0.0),
      (2L, 3L, "A", 2L * D + 7L, 0.0)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // user 1 active d0,d2 covers d0..d2 (dedup'd); user 2 covers d2;
    // days past max observed day (2) are dropped
    assert(out == Map(0L -> 1L, 1L -> 1L, 2L -> 2L))
  }

  test("merge upsert tags insert/update/unchanged by snapshot diff") {
    initLog()
    val out = Temporal.mergeUpsertFrames(ev(
      (1L, 1L, "A", 1000L, 4.0),                            // base only
      (4L, 2L, "A", 9000L, 7.0),                            // delta only
      (5L, 3L, "A", 1000L, 1.0), (5L, 4L, "A", 9000L, 1.0), // same value
      (6L, 5L, "A", 1000L, 1.0), (6L, 6L, "A", 9000L, 2.0), // changed
      // latest-per-key: base resolves by (t_us, event_id) argmax
      (7L, 7L, "A", 1000L, 5.0), (7L, 8L, "A", 1000L, 3.0)),
      cutoffUs = 5000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getString(2)))).toMap
    assert(out(1L) == ((4.0, "unchanged")))
    assert(out(4L) == ((7.0, "insert")))
    assert(out(5L) == ((1.0, "unchanged")))
    assert(out(6L) == ((2.0, "update")))
    assert(out(7L) == ((3.0, "unchanged"))) // event_id 8 wins the tie
    assert(out.size == 5)
  }

  test("pathTopK: time-ordered heads, maxLen cap, deterministic top-k ties") {
    initLog()
    val out = Temporal.pathTopKFrames(ev(
      // users 1,2 walk A>B>C (different times, same order)
      (1L, 1L, "A", 1000L, 0.0), (1L, 2L, "B", 2000L, 0.0),
      (1L, 3L, "C", 3000L, 0.0),
      (2L, 4L, "A", 100L, 0.0), (2L, 5L, "B", 5000L, 0.0),
      (2L, 6L, "C", 9000L, 0.0),
      // user 3: same events ARRIVE out of id order; ts ties break by id
      (3L, 8L, "B", 1000L, 0.0), (3L, 7L, "A", 1000L, 0.0),
      // user 4: a 5-step walk capped at maxLen 3
      (4L, 9L, "X", 1L, 0.0), (4L, 10L, "Y", 2L, 0.0),
      (4L, 11L, "Z", 3L, 0.0), (4L, 12L, "Q", 4L, 0.0),
      (4L, 13L, "R", 5L, 0.0)), maxLen = 3, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // A>B>C twice; the n=1 paths tie and 'A>B' sorts before 'X>Y>Z'
    assert(out.toSeq == Seq(("A>B>C", 2L), ("A>B", 1L)))
  }

  test("interval coverage: overlaps merge, gaps split, touching abuts merge") {
    initLog()
    // hold = 100µs. user 1: events at 0, 50 (overlap), 150 (touches
    // 50+100 — touching merges: 150 > 150 is false), 400 (gap).
    // islands: [0,250) and [400,500) → covered 350, longest 250.
    // user 2: one event → one island of exactly hold.
    val out = Temporal.intervalCoverageFrames(ev(
      (1L, 1L, "A", 0L, 0.0), (1L, 2L, "A", 50L, 0.0),
      (1L, 3L, "A", 150L, 0.0), (1L, 4L, "A", 400L, 0.0),
      (2L, 5L, "A", 1000L, 0.0)), holdUs = 100L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((2L, 350L, 250L)))
    assert(out(2L) == ((1L, 100L, 100L)))
  }

  test("interval coverage rides ONE user shuffle (windows + groupBys reuse it)") {
    initLog()
    val df = Temporal.intervalCoverage(spark, sf)
    df.collect()
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def all(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => all(a.executedPlan)
      case q: QueryStageExec => all(q.plan)
      case o => o.children.flatMap(all)
    })
    val shuffles = all(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[ShuffleExchangeExec])
    assert(shuffles == 1, s"expected 1 shuffle, got $shuffles")
  }

  test("decayedActivity equals a sequential recomputation at sf") {
    initLog()
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("t_us"),
        col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val anchor = ev.map(_._2).max
    val hl = 604800000000L
    def rnd(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // the cents×dyadic design makes the sum order-independent EXACT,
    // so this sequential recomputation must match BIT-FOR-BIT after
    // round(4) — no tolerance
    val expect = ev.groupBy(_._1).map { case (t, rows) =>
      val ws = rows.map { case (_, us, _) =>
        math.pow(0.5, math.min((anchor - us) / hl, 30L).toDouble) }
      (t, rows.size.toLong,
        rows.zip(ws).map { case ((_, _, v), w) => math.rint(v * 100) * w }
          .sum / 100, ws.sum)
    }
    val got = Temporal.decayedActivity(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    expect.foreach { case (t, n, dsum, dcnt) =>
      val (gn, gs, gc) = got(t)
      assert(gn == n)
      assert(gs == rnd(dsum), s"$t decayed_sum")
      assert(gc == rnd(dcnt), s"$t decayed_count")
      // weights are genuinely < 1 for old events: decay is active
      assert(gc < n.toDouble)
    }
  }
}
