package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.EditAnalytics

class EditAnalyticsSpec extends GraftSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("editSizeByWindow: reference semantics on known rows") {
    initLog()
    val events = Seq(
      // window [00:00, 00:05) for type a: |10.0| + |20.0| = 30.0
      (1L, ts("2024-01-01 00:01:00"), 1L, "a", 10.0, "{}"),
      (2L, ts("2024-01-01 00:04:59"), 1L, "a", 20.0, "{}"),
      // next window for a
      (3L, ts("2024-01-01 00:05:00"), 2L, "a", 5.0, "{}"),
      // error rows are filtered (the reference's bot/non-main analog)
      (4L, ts("2024-01-01 00:02:00"), 3L, "error", 99.0, "{}"),
      (5L, ts("2024-01-01 00:03:00"), 4L, "b", 7.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EditAnalytics.editSizeByWindow(events)
      .orderBy("event_type", "win_start").collect()
    assert(out.length == 3)
    val a0 = out(0)
    assert(a0.getAs[String]("event_type") == "a")
    assert(a0.getAs[Long]("win_start") == ts("2024-01-01 00:00:00").getTime * 1000)
    assert(a0.getAs[Long]("win_end") == ts("2024-01-01 00:05:00").getTime * 1000)
    assert(a0.getAs[Double]("edit_size") == 30.0)
    assert(a0.getAs[Long]("n_edits") == 2L)
    assert(out(1).getAs[Double]("edit_size") == 5.0)
    assert(out(2).getAs[String]("event_type") == "b")
  }

  test("filterProject pushes filter and prunes columns at the scan") {
    initLog()
    val plan = EditAnalytics.filterProject(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:"), plan.take(500))
    assert(plan.contains("l_discount"), "discount predicate should reach the scan")
    // pruned read schema: none of the untouched columns
    assert(!plan.contains("l_returnflag"), "untouched column must be pruned")
  }

  test("sessionWindow groups by 30-min inactivity gap") {
    initLog()
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 7L, "a", 1.0, "{}"),
      (2L, ts("2024-01-01 00:20:00"), 7L, "a", 2.0, "{}"),  // same session
      (3L, ts("2024-01-01 01:30:00"), 7L, "a", 3.0, "{}"),  // new session
      (4L, ts("2024-01-01 00:00:00"), 8L, "a", 4.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EditAnalytics.sessionWindow(events)
      .orderBy("user_id", "sid").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 2L)
    assert(out(0).getAs[Double]("session_value") == 3.0)
    assert(out(1).getAs[Long]("n_events") == 1L)
    assert(out(2).getAs[Long]("user_id") == 8L)
  }

  test("sliding windows assign each event to exactly two windows") {
    initLog()
    val events = Seq((1L, ts("2024-01-01 00:07:00"), 1L, "a", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EditAnalytics.slidingWindow(events).collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[Long]("win_start")).sorted.toSeq ==
      Seq(ts("2024-01-01 00:00:00").getTime * 1000,
        ts("2024-01-01 00:05:00").getTime * 1000))
  }
}
