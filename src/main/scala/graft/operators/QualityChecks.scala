package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-quality validation and shuffle-key diagnostics — the checks a
  * pipeline runs BEFORE committing 100 TB to a training mixture:
  * declarative row-level expectations (Deequ/Great-Expectations
  * shape) and key-distribution skew profiling (the number that says
  * whether the next join needs salting).
  */
object QualityChecks {

  /** Declarative expectation suite: each rule is a boolean Column; a
    * row VIOLATES a rule unless the predicate evaluates TRUE (SQL
    * three-valued logic — a NULL predicate is a violation, which is
    * what a quality gate wants: unknown is not ok).
    *
    * Scale shape: R rules compile to R conditional sums inside ONE
    * aggregate over ONE scan — adding a rule costs one more codegen'd
    * when(), never another pass. The agg is algebraic (map-side
    * combined to a single row per task), the explode that turns the
    * one result row into per-rule rows is driver-trivial. This is the
    * only correct shape at 100 TB: the naive per-rule `df.filter.
    * count()` loop is R full scans.
    */
  def expectations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty)
    // rule names become v_$name agg aliases: a duplicate would plan
    // duplicate columns and die later with a confusing
    // ambiguous-reference error (or silently mis-pair the explode)
    require(rules.map(_._1).distinct.size == rules.size,
      s"duplicate rule names: ${rules.map(_._1).diff(rules.map(_._1).distinct).distinct.mkString(", ")}")
    val aggs = count(lit(1)).as("n_rows") +:
      rules.map { case (name, pred) =>
        sum(when(pred, 0L).otherwise(1L)).as(s"v_$name")
      }
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("n_rows"), explode(array(rules.map { case (name, _) =>
        struct(lit(name).as("rule"), col(s"v_$name").as("n_violations"))
      }: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("n_rows"),
        col("r.n_violations").as("n_violations"),
        round(col("r.n_violations").cast("double") / col("n_rows"), 6)
          .as("violation_rate"))
      .orderBy(col("rule"))
  }

  /** Driver contract: six invariants of the lineitem table. */
  def lineitemExpectations(spark: SparkSession, dir: String): DataFrame =
    expectations(Tables.lineitem(spark, dir), Seq(
      "quantity_range" -> col("l_quantity").between(1, 50),
      "price_positive" -> (col("l_extendedprice") > 0),
      "discount_range" -> col("l_discount").between(0.0, 0.11),
      "tax_nonneg" -> (col("l_tax") >= 0),
      "shipdate_range" -> col("l_shipdate")
        .between(lit("1992-01-01").cast("date"), lit("1998-12-31").cast("date")),
      "returnflag_domain" -> col("l_returnflag").isin("A", "N", "R")))

  /** Key-distribution profile for a prospective shuffle/join key —
    * row/key counts, the hot-key ceiling, count quantiles, top-1
    * share, max/avg skew ratio, and Shannon entropy. These are the
    * numbers that decide salting (skew_ratio), AQE skew thresholds
    * (max_cnt), and reduce-side memory (p99_cnt) before launching a
    * 100 TB join.
    *
    * Scale shape: one shuffle (the per-key count, map-side combined)
    * + one single-row reduce over n_keys count rows. Entropy needs no
    * second pass: H = ln(N) - Σ cnt·ln(cnt) / N, and Σ cnt·ln(cnt)
    * is a plain algebraic sum. The count quantiles use the exact
    * sort-based `percentile` when `exact` (deterministic, oracle-
    * matchable); `exact=false` swaps in the approx_percentile sketch
    * — the 100 TB mode, where n_keys itself is billions (same
    * exact/approx convention as [[Profile.profile]]).
    */
  def keySkew(df: DataFrame, keyCol: String, exact: Boolean = true): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("cnt"))
    val (p50, p99) =
      if (exact) (expr("percentile(cnt, 0.5)"), expr("percentile(cnt, 0.99)"))
      else (expr("approx_percentile(cnt, 0.5, 10000)").cast("double"),
        expr("approx_percentile(cnt, 0.99, 10000)").cast("double"))
    counts
      .agg(sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_cnt"), avg(col("cnt")).as("avg"),
        p50.as("p50"), p99.as("p99"),
        sum(col("cnt").cast("double") * log(col("cnt").cast("double")))
          .as("s_clnc"))
      .select(col("n_rows"), col("n_keys"), col("max_cnt"),
        round(col("avg"), 4).as("avg_cnt"),
        round(col("p50"), 4).as("p50_cnt"),
        round(col("p99"), 4).as("p99_cnt"),
        round(col("max_cnt").cast("double") / col("n_rows"), 6)
          .as("top1_share"),
        round(col("max_cnt").cast("double") * col("n_keys") / col("n_rows"), 4)
          .as("skew_ratio"),
        round(log(col("n_rows").cast("double")) -
          col("s_clnc") / col("n_rows"), 4).as("entropy"))
  }

  /** Driver contract: skew profile of lineitem's part-key — the fact
    * table's most join-critical distribution.
    */
  def lineitemKeySkew(spark: SparkSession, dir: String): DataFrame =
    keySkew(Tables.lineitem(spark, dir), "l_partkey")

  /** PRE-FLIGHT join-cardinality estimate — the "will this 100 TB
    * join explode?" check [[keySkew]] (single table) cannot answer:
    * the EXACT output row count of `left ⋈ right` on `key` is
    * Σ_k cnt_L(k)·cnt_R(k), computable from the two per-key COUNT
    * tables — whose join is bounded by DISTINCT keys, never by the
    * fact rows — before a single fact row shuffles. Reports the
    * exact output rows, both input sizes, the matched-key count, the
    * amplification factor out/max(in), and the single worst key's
    * contribution — the numbers that decide broadcast vs shuffle vs
    * salt vs "don't run this".
    *
    * Scale shape: one groupBy per side (map-combined, distinct-key-
    * sized results) + one join of the two COUNT tables + a one-row
    * aggregate. Integer arithmetic throughout except the two ROUND(6)
    * ratios (one correctly-rounded division each — rung 1); products
    * are exact while cnt_L·cnt_R < 2⁶³ per key and Σ < 2⁶³ — beyond
    * any join this check would approve anyway.
    */
  def joinCardinality(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    val lc = left.groupBy(col(leftKey).as("k"))
      .agg(count(lit(1)).as("cl"))
    val rc = right.groupBy(col(rightKey).as("k"))
      .agg(count(lit(1)).as("cr"))
    val prod = lc.join(rc, Seq("k"))
      .select(col("k"), (col("cl") * col("cr")).as("out_k"))
    // input totals via count-star over the inputs, NOT Σ over the
    // count tables: the zero-column count scan is nearly free, while
    // a second consumption of lc/rc re-runs the per-key aggregate
    // (measured at 100×/300×: the Σ-reuse form was 1.1-2× SLOWER)
    val totals = left.agg(count(lit(1)).as("left_rows"))
      .crossJoin(broadcast(right.agg(count(lit(1)).as("right_rows"))))
    prod
      .agg(count(lit(1)).as("matched_keys"),
        coalesce(sum(col("out_k")), lit(0L)).as("out_rows"),
        coalesce(max(col("out_k")), lit(0L)).as("max_key_out"))
      .crossJoin(broadcast(totals))
      .select(col("left_rows"), col("right_rows"), col("matched_keys"),
        col("out_rows"), col("max_key_out"),
        when(greatest(col("left_rows"), col("right_rows")) > 0L,
          round(col("out_rows").cast("double") /
            greatest(col("left_rows"), col("right_rows")).cast("double"), 6))
          .otherwise(lit(0.0)).as("amplification"),
        when(col("out_rows") > 0L,
          round(col("max_key_out").cast("double") /
            col("out_rows").cast("double"), 6))
          .otherwise(lit(0.0)).as("top_key_share"))
  }

  /** Driver contract `dq_join_cardinality`: the pre-flight numbers
    * for lineitem ⋈ orders on the order key — the engine's canonical
    * fact-to-fact join.
    */
  def lineitemOrdersJoinCard(spark: SparkSession, dir: String): DataFrame =
    joinCardinality(Tables.lineitem(spark, dir), "l_orderkey",
      Tables.orders(spark, dir), "o_orderkey")

  /** Referential-integrity gate: for each declared FK → PK edge, the
    * child row count, orphan count (child keys with no parent), and
    * orphan rate — the check that must pass before any inner join is
    * trusted (an inner join silently DROPS orphans; this gate makes
    * the loss visible first).
    *
    * Scale shape, per FK: the parent side collapses to its DISTINCT
    * key set before the join (parent payload never moves), then ONE
    * shuffled left join + a single-row count agg. No broadcast hint:
    * at 100 TB the parent key set may itself be huge — AQE picks
    * broadcast when stats allow. NULL child keys count as orphans
    * (same three-valued-logic stance as [[expectations]]: unknown is
    * not ok).
    */
  def referentialIntegrity(
      fks: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(fks.nonEmpty)
    require(fks.map(_._1).distinct.size == fks.size, "duplicate fk names")
    fks.map { case (name, child, childKey, parent, parentKey) =>
      val pk = parent.select(col(parentKey).as("__pk")).distinct()
        .withColumn("__hit", lit(1L))
      child.select(col(childKey).as("__pk"))
        .join(pk, Seq("__pk"), "left")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("n_orphans"))
        .select(lit(name).as("fk"), col("n_rows"), col("n_orphans"),
          round(col("n_orphans").cast("double") / col("n_rows"), 6)
            .as("orphan_rate"))
    }.reduce(_.unionByName(_))
  }

  /** Profile drift between two versions of a table: per column, the
    * deltas of null count, exact ndv and numeric bounds, plus a
    * changed-flag for string bounds — the cross-VERSION member of the
    * DQ gate family (expectations = row rules, key_skew =
    * distribution, referential = cross-table). A silent upstream
    * change (new null source, id-space jump, price re-scale) shows
    * here before any query goes wrong.
    *
    * Both sides ride [[Profile.profile]]'s exact lane (drift needs
    * comparable numbers — HLL++ estimate noise would masquerade as
    * ndv drift); each profile is ONE pass, the join is
    * column-count-sized. Doubles subtract the same stored values on
    * both engines ⇒ exact oracle.
    */
  def profileDrift(old: DataFrame, cur: DataFrame): DataFrame = {
    def side(df: DataFrame, p: String) =
      Profile.profile(df, exact = true).select(col("col_name"),
        col("n_nulls").as(s"${p}_nulls"), col("n_distinct").as(s"${p}_ndv"),
        col("min_num").as(s"${p}_mn"), col("max_num").as(s"${p}_mx"),
        col("min_str").as(s"${p}_mns"), col("max_str").as(s"${p}_mxs"))
    side(old, "a").join(side(cur, "b"), Seq("col_name"))
      .select(col("col_name"),
        (col("b_nulls") - col("a_nulls")).as("d_nulls"),
        (col("b_ndv") - col("a_ndv")).as("d_ndv"),
        round(col("b_mn") - col("a_mn"), 6).as("d_min_num"),
        round(col("b_mx") - col("a_mx"), 6).as("d_max_num"),
        when(!(col("a_mns") <=> col("b_mns")) ||
             !(col("a_mxs") <=> col("b_mxs")), 1L).otherwise(0L)
          .as("str_bounds_changed"))
  }

  /** Driver contract: drift across the q_snapshot_diff synthetic
    * version pair of orders (rows dropped, prices nudged).
    */
  def ordersProfileDrift(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val v1 = o.filter(col("o_orderkey") % 10 =!= 0)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    val v2 = o.filter(col("o_orderkey") % 10 =!= 1)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 7 === 0, round(col("o_totalprice") + 1.0, 2))
          .otherwise(col("o_totalprice")).as("o_totalprice"),
        col("o_orderpriority"))
    profileDrift(v1, v2)
  }

  /** Driver contract: the three join edges every TPC-H-shaped query
    * crosses, plus the events→customer edge (which has REAL orphans —
    * event user_ids outrange the customer table).
    */
  def referentialGate(spark: SparkSession, dir: String): DataFrame =
    referentialIntegrity(Seq(
      ("lineitem_orders", Tables.lineitem(spark, dir), "l_orderkey",
        Tables.orders(spark, dir), "o_orderkey"),
      ("orders_customer", Tables.orders(spark, dir), "o_custkey",
        Tables.customer(spark, dir), "c_custkey"),
      ("lineitem_part", Tables.lineitem(spark, dir), "l_partkey",
        Tables.part(spark, dir), "p_partkey"),
      ("events_customer", Tables.events(spark, dir), "user_id",
        Tables.customer(spark, dir), "c_custkey")))
}
