package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming half-life decayed counters — the unbounded twin of
  * [[graft.operators.Temporal.decayedActivity]]: per key, a running
  * decay-weighted mass ("recent activity counts more") maintained
  * incrementally in managed GroupState and re-emitted every
  * micro-batch (update mode).
  *
  * Semantics: weights are 0.5^(pMax − p(t)) where p(t) is the
  * event's HALF-LIFE PERIOD (floorDiv of event-time micros) and pMax
  * the newest period THIS KEY has seen. Periods — not raw age — make
  * the state composable: advancing the anchor is one multiply
  * (acc · 0.5^Δp), and a late event folds in with its exact relative
  * weight, so arrival ORDER cannot change the result beyond FP
  * rounding (spec: stream ≡ batch recomputation on the same rows).
  * The batch op anchors at max t_us rather than its period — the two
  * agree on ranking and scale, not bit-for-bit; the streaming twin's
  * own parity contract is the spec'd one.
  *
  * No clamp here (unlike the batch op, whose clamp buys ORACLE
  * exactness): pow(0.5, huge) underflows cleanly to 0.0, and a clamp
  * WOULD break order-independence at its boundary (a term decayed in
  * two 20-period steps reaches 0.5^40 while one late fold would clamp
  * at 0.5^30). State per key is three scalars — no growth with stream
  * length, no timeout needed.
  */
object StreamDecay {

  final case class Ev(event_type: String, t_us: Long, cents: Long)
  final case class DecayState(maxP: Long, acc: Double, n: Long)
  final case class DecayOut(event_type: String, anchor_period: Long,
      decayed_sum: Double, n_events: Long)

  private def w(dp: Long): Double = math.pow(0.5, dp.toDouble)

  def fold(s0: DecayState, evs: Iterator[Ev], halfLifeUs: Long): DecayState = {
    var s = s0
    evs.foreach { e =>
      val p = Math.floorDiv(e.t_us, halfLifeUs)
      // empty-state sentinel handled apart: p − Long.MinValue would
      // overflow and 0.0 · pow(...) would poison the fold with NaN
      if (s.maxP == Long.MinValue) s = DecayState(p, 0.0, s.n)
      else if (p > s.maxP) s = DecayState(p, s.acc * w(p - s.maxP), s.n)
      s = s.copy(acc = s.acc + e.cents * w(s.maxP - p), n = s.n + 1)
    }
    s
  }

  def decayedCounters(ds: Dataset[Ev],
      halfLifeUs: Long = 604800000000L): Dataset[DecayOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.event_type)
      .mapGroupsWithState[DecayState, DecayOut](
        GroupStateTimeout.NoTimeout) {
        (k: String, evs: Iterator[Ev], state: GroupState[DecayState]) =>
          val s = fold(
            state.getOption.getOrElse(DecayState(Long.MinValue, 0.0, 0L)),
            evs, halfLifeUs)
          state.update(s)
          DecayOut(k, s.maxP, s.acc / 100, s.n)
      }
  }

  /** The batch reference recomputation the spec checks against: same
    * period-anchor semantics, sequential over all rows at once.
    */
  def batchReference(rows: Seq[Ev], halfLifeUs: Long): Map[String, DecayOut] =
    rows.groupBy(_.event_type).map { case (k, evs) =>
      val s = fold(DecayState(Long.MinValue, 0.0, 0L),
        evs.iterator, halfLifeUs)
      k -> DecayOut(k, s.maxP, s.acc / 100, s.n)
    }
}
