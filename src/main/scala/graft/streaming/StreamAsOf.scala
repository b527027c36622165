package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAM-STREAM as-of join: each left event matched to the latest
  * right row of the same key with rightTime <= leftTime — the
  * streaming face of [[graft.plans.AsOfJoinPlan]]. Structured
  * Streaming's built-in stream-stream join cannot express "latest
  * prior" (it is an equi/range join, not an argmax), so this is the
  * `flatMapGroupsWithState` case the build rules reserve for genuinely
  * custom state.
  *
  * Correctness contract (watermark-driven): a left event at time t is
  * emitted only once the MERGED stream's watermark passes t, which
  * guarantees every right row with time <= t has been ingested into
  * state — so the emitted match is exactly the batch as-of answer,
  * independent of arrival order (spec proves batch parity under
  * out-of-order multi-batch arrival). Until then the left row waits in
  * state with an event-time timeout at t.
  *
  * State per key is BOUNDED: pending lefts drain as the watermark
  * advances, and of the rights at-or-below the watermark only the
  * LATEST is retained (older ones can never win an argmax for any
  * future left, whose t must be >= watermark).
  *
  * Tie contract (same as [[graft.plans.AsOfJoinPlan]]): give the right
  * side unique (key, time) — among equal-time right rows the retained
  * one follows arrival order, which is not a data property.
  */
object StreamAsOf {

  /** Unioned input row: tag 0 = right (carries value), 1 = left. */
  final case class In(k: Long, ts: java.sql.Timestamp, t_us: Long,
      tag: Int, left_id: Long, right_val: Double)

  final case class AsOfState(
      rights: List[(Long, Double)],     // (t_us, value), ascending
      pending: List[(Long, Long)])      // (t_us, left_id), unordered

  final case class Out(k: Long, left_id: Long, t_us: Long,
      matched_t: Option[Long], matched_val: Option[Double])

  /** left: (k LONG, ts TIMESTAMP, left_id LONG); right: (k LONG,
    * ts TIMESTAMP, right_val DOUBLE). `delay` is each side's bounded
    * out-of-orderness.
    */
  def join(left: DataFrame, right: DataFrame, delay: String): Dataset[Out] = {
    import left.sparkSession.implicits._
    val l = left
      .withWatermark("ts", delay)
      .select(col("k").cast("long"), col("ts"),
        unix_micros(col("ts")).as("t_us"), lit(1).as("tag"),
        col("left_id").cast("long"), lit(0.0).as("right_val"))
    val r = right
      .withWatermark("ts", delay)
      .select(col("k").cast("long"), col("ts"),
        unix_micros(col("ts")).as("t_us"), lit(0).as("tag"),
        lit(-1L).as("left_id"), col("right_val").cast("double"))
    l.unionByName(r).as[In]
      .groupByKey(_.k)
      .flatMapGroupsWithState[AsOfState, Out](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(process)
  }

  private def process(k: Long, rows: Iterator[In],
      state: GroupState[AsOfState]): Iterator[Out] = {
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val s0 = state.getOption.getOrElse(AsOfState(Nil, Nil))
    // ingest this batch
    var rights = s0.rights
    var pending = s0.pending
    rows.foreach { in =>
      if (in.tag == 0) rights = (in.t_us, in.right_val) :: rights
      else pending = (in.t_us, in.left_id) :: pending
    }
    rights = rights.sortBy(_._1)
    // emit every left the watermark has passed: all rights <= its time
    // are guaranteed present. (Strict <, so a boundary-equal right
    // still in flight cannot be missed.)
    val (ready, stillPending) = pending.partition(_._1 < wmUs)
    val out = ready.sortBy(p => (p._1, p._2)).map { case (t, id) =>
      rights.takeWhile(_._1 <= t).lastOption match {
        case Some((ht, v)) => Out(k, id, t, Some(ht), Some(v))
        case None => Out(k, id, t, None, None)
      }
    }
    // prune state: of rights strictly below the watermark keep only
    // the latest (any future left has t >= wm, so older ones lost the
    // argmax forever); keep everything newer.
    val (old, fresh) = rights.partition(_._1 < wmUs)
    val kept = old.lastOption.toList ::: fresh
    if (stillPending.isEmpty && kept.isEmpty) {
      state.remove()
    } else {
      state.update(AsOfState(kept, stillPending))
      // wake when the watermark passes the earliest pending left (or
      // keep a horizon timeout so lone right-state keys eventually
      // clear); timeout must sit strictly above the current watermark.
      val wakeUs = stillPending.map(_._1).minOption
        .getOrElse(wmUs + 3600L * 1000000L)
      state.setTimeoutTimestamp(math.max(wakeUs / 1000L + 1L,
        state.getCurrentWatermarkMs() + 1L))
    }
    out.iterator
  }
}
