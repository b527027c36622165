package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Temporal/state modeling over an event log — the dimension-history
  * and behavioral-analytics layer (reference events are Wikipedia
  * edit streams, DataStreamJob.java:52-91; these are their batch
  * history twins): SCD2 validity intervals, state-transition counts,
  * cohort retention, rolling distinct actives, and CDC upsert-merge.
  *
  * Shared scale shape: every operator partitions on the entity key
  * (`user_id`) first, and every later stage groups on a superset of
  * that key — Spark recognizes `hashpartitioning(user_id)` as
  * satisfying any clustering that CONTAINS user_id, so the per-user
  * windows, the interval grouping, and the merge join all reuse that
  * one exchange layout (plan-spec'd). Per-task state is bounded by
  * one user's history, never by the corpus.
  *
  * The `*Frames` overloads run over any (user_id, event_id,
  * event_type, t_us[, value]) frame — `event_id` is the ts
  * tie-break, `t_us` epoch microseconds.
  */
object Temporal {

  private val DayUs = 86400000000L
  private val WeekUs = 7L * DayUs

  /** Events with µs epoch and a deterministic per-user ordering key
    * (`ts` ties are broken by `event_id`).
    */
  private def ordered(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t_us"), col("value"))

  def scd2Intervals(spark: SparkSession, dir: String): DataFrame =
    scd2IntervalsFrames(ordered(spark, dir))

  /** SCD2 (type-2 slowly-changing dimension) interval build: collapse
    * each user's event-type sequence into runs of constant state and
    * emit one row per run with `[valid_from_us, valid_to_us)` — the
    * open (current) run carries a NULL `valid_to_us`. This is the
    * standard dimension-history materialization a warehouse derives
    * from a change log.
    *
    * Runs are identified with the gaps-and-islands trick: a change
    * flag (`state != lag(state)`) running-summed into a version
    * number. All three stages — the two windows and the run groupBy —
    * cluster on user_id(+run), so the whole operator costs ONE
    * shuffle; per-task sort state is one user's events.
    */
  def scd2IntervalsFrames(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us"), col("event_id"))
    val runs = ev
      .select(col("user_id"), col("event_id"), col("t_us"),
        col("event_type").as("state"))
      .withColumn("chg",
        when(lag(col("state"), 1).over(w).isNull
          || col("state") =!= lag(col("state"), 1).over(w), 1L)
          .otherwise(0L))
      .withColumn("version", sum(col("chg")).over(w))
    val wv = Window.partitionBy(col("user_id")).orderBy(col("version"))
    runs
      .groupBy(col("user_id"), col("version"), col("state"))
      .agg(min(col("t_us")).as("valid_from_us"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to_us",
        lead(col("valid_from_us"), 1).over(wv))
  }

  def transitionMatrix(spark: SparkSession, dir: String): DataFrame =
    transitionMatrixFrames(ordered(spark, dir))

  /** First-order state-transition (Markov) matrix: for each observed
    * `prev -> next` event-type pair, the count and the row-normalized
    * probability. One user-keyed window shuffle to form the lagged
    * pairs, then the pair counts are |types|² rows — the normalizing
    * per-prev window is dimension-sized at any corpus scale.
    */
  def transitionMatrixFrames(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us"), col("event_id"))
    ev
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        round(col("n") / sum(col("n"))
          .over(Window.partitionBy(col("prev_type"))), 6))
  }

  def cohortRetention(spark: SparkSession, dir: String): DataFrame =
    cohortRetentionFrames(ordered(spark, dir))

  /** Weekly cohort retention: users are cohorted by their first
    * active week; each later active week contributes to that
    * cohort's `offset_wk` cell. The classic triangle every growth
    * dashboard draws.
    *
    * One shuffle total for the corpus-scale part: a single
    * groupBy(user_id) computes the cohort week AND the distinct
    * active-week set (the collect_set state is bounded by the
    * calendar, ~52/year, not by event volume — partials combine
    * map-side), then explodes to (cohort, offset) cells whose count
    * IS distinct users, since (user, week) is unique post-set.
    */
  def cohortRetentionFrames(ev: DataFrame): DataFrame =
    ev
      .select(col("user_id"),
        floor(col("t_us") / lit(WeekUs)).cast("long").as("wk"))
      .groupBy(col("user_id"))
      .agg(min(col("wk")).as("cohort_wk"),
        collect_set(col("wk")).as("wks"))
      .select(col("cohort_wk"), explode(col("wks")).as("wk"))
      .groupBy(col("cohort_wk"),
        (col("wk") - col("cohort_wk")).cast("long").as("offset_wk"))
      .agg(count(lit(1)).as("n_users"))

  def rollingDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    rollingDistinctUsersFrames(ordered(spark, dir))

  /** Rolling 7-day distinct actives per day (the DAU/WAU family).
    * Exact sliding-window COUNT DISTINCT does not decompose as an
    * algebraic window agg, so: dedup to (user, active-day) — bounded
    * at |users|×|days| — then each active day COVERS the next 7
    * calendar days (map-side explode of a 7-element sequence), dedup
    * (user, covered-day) again, and count. Every stage is
    * hash-partial + one shuffle; nothing holds per-window user sets
    * in task state (the failure mode of the naive
    * `collect_set over RANGE window` shape at scale).
    */
  def rollingDistinctUsersFrames(ev: DataFrame,
      windowDays: Int = 7): DataFrame = {
    val days = ev
      .select(col("user_id"),
        floor(col("t_us") / lit(DayUs)).cast("long").as("day"))
      .distinct()
    val maxDay = days.agg(max(col("day")).as("max_day"))
    days
      .select(col("user_id"),
        explode(sequence(col("day"),
          col("day") + (windowDays - 1))).as("day"))
      .distinct()
      .crossJoin(broadcast(maxDay))
      // trailing windows that would end past the observed range are
      // partial leading edges, not real days — drop them
      .filter(col("day") <= col("max_day"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active_7d"))
  }

  def mergeUpsert(spark: SparkSession, dir: String): DataFrame =
    mergeUpsertFrames(ordered(spark, dir),
      cutoffUs = 1705363200000000L /* 2024-01-16T00:00Z */)

  /** CDC upsert-merge (the batch MERGE INTO): the pre-cutoff half of
    * the log collapses to a per-user base snapshot (latest value),
    * the post-cutoff half to a delta snapshot, and the merge is a
    * full-outer coalesce tagged `insert` / `update` / `unchanged`
    * (a delete marker would slot into the same CASE; the log has
    * none). Latest-per-key is the algebraic argmax
    * `max(struct(t_us, event_id, value))` — map-side combined, no
    * per-key sort. Both snapshots and the join cluster on user_id:
    * the join reuses the aggregates' partitioning with no exchange
    * of its own.
    */
  def pathTopK(spark: SparkSession, dir: String): DataFrame =
    pathTopKFrames(ordered(spark, dir))

  /** Top-k behavioral paths: each user's first `maxLen` event types in
    * time order (ties broken by event_id), joined with '>', counted
    * across users — the sequence-mining summary behind funnel design
    * (which journeys actually happen, not just the one we planned).
    *
    * ONE corpus shuffle: the per-user ordered head is an ordered
    * collect inside the user groupBy (`sort_array(collect_list(...))`
    * then slice) — agg state is one user's history, the same
    * boundedness contract as the rest of the family, with no separate
    * row_number window pass. Path counting then aggregates path
    * strings (≤ |types|^maxLen distinct, in practice a short head) and
    * the top-k is TakeOrderedAndProject.
    */
  def pathTopKFrames(ev: DataFrame, maxLen: Int = 8, k: Int = 20): DataFrame =
    ev
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("t_us"), col("event_id"),
        col("event_type")))).as("h"))
      .select(concat_ws(">",
        transform(slice(col("h"), 1, maxLen), s => s.getField("event_type")))
        .as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(k)

  /** Interval union (gaps-and-islands merge): each event opens a
    * `holdUs`-long activity interval; overlapping/touching intervals
    * per user merge into islands. Output per user: island count,
    * total covered time, and the longest unbroken stretch — the
    * "true session coverage" numbers double-counted by naive
    * per-event sums.
    *
    * Classic cummax formulation: an interval starts a NEW island iff
    * its start exceeds the running max end of everything before it;
    * the island ordinal is the running sum of those breaks. Both
    * windows and the island groupBy cluster on user_id — the whole
    * operator is ONE shuffle, per-task state one user's events.
    */
  def intervalCoverage(spark: SparkSession, dir: String,
      holdUs: Long = 1800000000L): DataFrame =
    intervalCoverageFrames(ordered(spark, dir), holdUs)

  def intervalCoverageFrames(ev: DataFrame, holdUs: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("s"), col("event_id"))
    val islands = ev
      .select(col("user_id"), col("event_id"), col("t_us").as("s"),
        (col("t_us") + holdUs).as("e"))
      .withColumn("prev_max_e",
        max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("prev_max_e").isNull || col("s") > col("prev_max_e"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("brk")).over(w))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("s")).as("is_s"), max(col("e")).as("is_e"))
    islands
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("is_e") - col("is_s")).as("covered_us"),
        max(col("is_e") - col("is_s")).as("longest_us"))
  }

  /** Exponential time-decay aggregate (half-life weighting): per
    * event type, the decay-weighted value mass and effective sample
    * size, anchored at the corpus max timestamp — the feature-store
    * freshness aggregate ("recent counts more").
    *
    * Engineered so the sum is EXACT and ORDER-INDEPENDENT — no FP
    * association drift across partitionings or engines (the first cut
    * relied on round(4) and a sf0.001 run promptly landed on a
    * half-up midpoint; "round and hope" is not a determinism
    * strategy):
    *  - decay is QUANTIZED to whole half-life periods (integer
    *    division on epoch micros — `div` / `//`, exact both engines),
    *    clamped at 30, so the weight 0.5^k is a power of two with
    *    k ≤ 30 — every weight is a dyadic rational ≥ 2^-30 (the clamp
    *    costs nothing semantically: 30 half-lives ≈ weight 1e-9);
    *  - 2-decimal values become exact integer CENTS (round(v·100));
    *  - each term cents·2^-k needs ≤ 14+30 mantissa bits, and every
    *    partial sum is a multiple of 2^-30 below 2^53·2^-30 ≈ 8.4e6
    *    (corpus Σ|cents| stays under that through the oracle scales),
    *    so EVERY intermediate double is exactly representable —
    *    Σ is the same real number in any summation order, on any
    *    IEEE-754 engine, compensated or not. The /100 and round(4)
    *    at the end are then single deterministic ops.
    *
    * Scale shape: one scalar agg (the anchor — a single broadcast
    * row) + one map-side-combined groupBy; the corpus shuffles once.
    */
  def decayedActivity(spark: SparkSession, dir: String,
      halfLifeUs: Long = 604800000000L): DataFrame = {
    val ev = ordered(spark, dir)
    val anchor = ev.agg(max(col("t_us")).as("__anchor"))
    ev.crossJoin(broadcast(anchor))
      .withColumn("__k",
        least(expr("(__anchor - t_us) div " + halfLifeUs), lit(30L)))
      .withColumn("__w", pow(lit(0.5), col("__k").cast("double")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(round(col("value") * 100) * col("__w")) / 100, 4)
          .as("decayed_sum"),
        round(sum(col("__w")), 4).as("decayed_count"))
  }

  /** Last-touch attribution: each purchase is credited to the user's
    * most recent NON-purchase event at-or-before it within a lookback
    * window (purchases with no touch in window land in the "(none)"
    * bucket) — the marketing/behavior query behind "which surface
    * drives conversions".
    *
    * Shape: the as-of union trick (AsOf.scala convention) — touches
    * and purchases ride ONE user-keyed window ordered by
    * (t_us, kind, event_id) with kind sorting touches before
    * equal-timestamp purchases; the running `max(struct(t_us,
    * event_id, type))` carries the latest touch (nulls ignored), so
    * there is no join at all: one shuffle for the window, then a
    * touch-type-sized aggregate. Tie-breaks are total (event_id
    * unique) ⇒ deterministic cross-engine.
    */
  def lastTouchAttribution(spark: SparkSession, dir: String,
      lookbackUs: Long = 604800000000L): DataFrame = {
    val tagged = ordered(spark, dir)
      .withColumn("__kind",
        when(col("event_type") === "purchase", 1).otherwise(0))
      .withColumn("__touch", when(col("__kind") === 0,
        struct(col("t_us"), col("event_id"), col("event_type"))))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us"), col("__kind"), col("event_id"))
    val attributed = tagged
      .withColumn("__last", max(col("__touch")).over(w))
      .filter(col("__kind") === 1)
      .select(col("value"),
        when(col("__last").isNotNull &&
            col("__last.t_us") >= col("t_us") - lookbackUs,
          col("__last.event_type"))
          .otherwise(lit("(none)")).as("touch_type"))
    val total = attributed.agg(count(lit(1)).as("__total"))
    attributed.groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value")), 2).as("attributed_value"))
      .crossJoin(broadcast(total))
      .select(col("touch_type"), col("n_purchases"),
        col("attributed_value"),
        round(col("n_purchases").cast("double") / col("__total"), 6)
          .as("share"))
  }

  def mergeUpsertFrames(ev: DataFrame, cutoffUs: Long): DataFrame = {
    def latest(df: DataFrame, valName: String): DataFrame =
      df.groupBy(col("user_id"))
        .agg(max(struct(col("t_us"), col("event_id"),
          round(col("value"), 2).as("v"))).as("m"))
        .select(col("user_id"), col("m.v").as(valName))
    val base = latest(ev.filter(col("t_us") < cutoffUs), "base_value")
    val delta = latest(ev.filter(col("t_us") >= cutoffUs), "delta_value")
    base.join(delta, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("delta_value"), col("base_value")).as("value"),
        when(col("base_value").isNull, lit("insert"))
          .when(col("delta_value").isNull, lit("unchanged"))
          .when(col("delta_value") === col("base_value"), lit("unchanged"))
          .otherwise(lit("update")).as("op"))
  }
}
