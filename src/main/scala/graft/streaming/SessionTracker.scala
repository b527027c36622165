package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via flatMapGroupsWithState: gap-based user
  * sessions emitted when 30 minutes of inactivity pass (by event-time
  * timeout). This is the arbitrary-state escape hatch the reference's
  * WindowFunction would need for non-window state; Spark's managed
  * GroupState gives fault-tolerant per-key state with watermark-driven
  * timeouts — no hand-rolled state backend.
  *
  * State per user: (session start µs, last event µs, count, value sum).
  */
object SessionTracker {

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, t_us: Long,
      value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  final case class SessionOut(user_id: Long, session_start: Long,
      session_end: Long, n_events: Long, session_value: Double)

  val GapUs: Long = 1800L * 1000000L

  def trackSessions(ds: Dataset[Ev]): Dataset[SessionOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (evs.isEmpty && state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.start, s.last, s.n, s.sum))
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.t_us))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.t_us - s.last <= GapUs =>
                  cur = Some(SessionState(s.start, math.max(s.last, e.t_us),
                    s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed ::= SessionOut(user, s.start, s.last, s.n, s.sum)
                  cur = Some(SessionState(e.t_us, e.t_us, 1L, e.value))
                case None =>
                  cur = Some(SessionState(e.t_us, e.t_us, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last / 1000L + GapUs / 1000L)
            }
            closed.reverseIterator
          }
      }
  }

  /** Wire the tracker over a streaming edit-event frame with a
    * watermark (required for event-time timeouts).
    */
  def fromEvents(spark: SparkSession, events: Dataset[org.apache.spark.sql.Row]): Dataset[SessionOut] = {
    import spark.implicits._
    // The watermark column must survive into the stateful operator's
    // input — project it along, don't select it away.
    val typed = events
      .withColumn("t_us", unix_micros(col("ts")))
      .withWatermark("ts", "30 minutes")
      .select(col("user_id").cast("long"), col("ts"), col("t_us"),
        col("value").cast("double"))
      .as[Ev]
    trackSessions(typed)
  }
}
