package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-touch attribution — the unbounded twin of
  * [[graft.operators.Temporal.lastTouchAttribution]]: per user, keep
  * the latest non-purchase touch in managed state (THREE fields: its
  * time, id, type); every purchase emits immediately, credited to
  * that touch if it falls inside the lookback window, else "(none)".
  *
  * This is the state-ENRICHMENT pattern (a stream joining against its
  * own reduced history) that windowed joins can't express: the
  * relevant touch may be arbitrarily old, so a stream-stream interval
  * join would need an unbounded buffer — the per-key argmax state is
  * the bounded reduction of exactly what attribution needs.
  *
  * Ordering contract: within a micro-batch events process in
  * (t_us, kind, event_id) order — touches before equal-timestamp
  * purchases, matching the batch operator's window order. ACROSS
  * batches attribution is emit-on-arrival: a touch arriving in a
  * LATER batch than a purchase it precedes in event time cannot
  * retro-credit the already-emitted purchase (append semantics; the
  * batch op is the replay-correct reference). State never grows:
  * one struct per user, no timeout.
  */
object StreamAttribution {

  final case class Ev(user_id: Long, t_us: Long, event_id: Long,
      event_type: String, value: Double)
  final case class TouchState(t_us: Long, event_id: Long,
      touch_type: String)
  final case class Attr(user_id: Long, purchase_id: Long, t_us: Long,
      value: Double, touch_type: String)

  def attribute(ds: Dataset[Ev],
      lookbackUs: Long = 604800000000L): Dataset[Attr] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, Attr](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (u: Long, evs: Iterator[Ev], state: GroupState[TouchState]) =>
          val sorted = evs.toSeq.sortBy(e =>
            (e.t_us, if (e.event_type == "purchase") 1 else 0, e.event_id))
          var st = state.getOption
          val out = Seq.newBuilder[Attr]
          sorted.foreach { e =>
            if (e.event_type == "purchase") {
              val credited = st
                .filter(s => s.t_us >= e.t_us - lookbackUs)
                .map(_.touch_type).getOrElse("(none)")
              out += Attr(u, e.event_id, e.t_us, e.value, credited)
            } else if (st.forall(s =>
                s.t_us < e.t_us ||
                  (s.t_us == e.t_us && s.event_id < e.event_id))) {
              st = Some(TouchState(e.t_us, e.event_id, e.event_type))
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }
}
