package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Batch analytics core — the general query surface of the engine.
  * Each query is a pure (SparkSession, sfDir) => DataFrame with a
  * DuckDB oracle twin in SparkEntry.oracleSql.
  *
  * Scale notes are per query; the common rules: dims broadcast,
  * facts shuffle once on their aggregation/join keys, doubles that
  * cross an FP-association boundary are rounded in BOTH engines.
  */
object BatchQueries {

  /** TPC-H Q1 shape: multi-aggregate scan — one shuffle carrying only
    * partial aggregates (4 groups).
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3 shape: 3-way join + agg + deterministic top-N
    * (tie-broken on the key). Orders/lineitem shuffle on orderkey;
    * the filtered customer side is small enough for AQE to broadcast.
    */
  def topRevenueOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("revenue"))
      .select(col("l_orderkey"),
        col("o_orderdate").cast("date").as("order_date"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape: 6-table star join; nation/region/supplier are
    * broadcast (dims), customer/orders/lineitem shuffle on their keys.
    */
  def regionalVolume(spark: SparkSession, dir: String): DataFrame = {
    val n = broadcast(Tables.nation(spark, dir))
    val r = broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA"))
    val s = broadcast(Tables.supplier(spark, dir))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    Tables.customer(spark, dir)
      .join(o, col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .join(s, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("revenue"))
  }

  /** Explicit broadcast dimension join: supplier ⋈ nation ⋈ region. */
  def supplierByRegion(spark: SparkSession, dir: String): DataFrame =
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_supp"),
        round(sum(col("s_acctbal")), 2).as("total_bal"))

  /** Semi/anti join: EXISTS and NOT EXISTS as left_semi/left_anti —
    * no row multiplication, the build side ships only the key column.
    */
  def customersWithWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val keys = Tables.orders(spark, dir).select(col("o_custkey"))
    val withO = c.join(keys, col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("n")).select(lit("with_orders").as("grp"), col("n"))
    val without = c.join(keys, col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n")).select(lit("no_orders").as("grp"), col("n"))
    withO.unionByName(without)
  }

  /** Distinct aggregation: exact countDistinct (expands to a two-phase
    * partial-distinct shuffle — the approx twin is q_approx_distinct).
    */
  def distinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))

  /** Analytic rank: top-3 orders per priority. Raw stored doubles order
    * identically in any engine (no arithmetic), so no rounding needed.
    */
  def topOrdersPerPriority(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("rn"), col("o_orderkey"),
        col("o_totalprice"))
  }

  /** Running (cumulative) sum per partition: quantities are integral
    * doubles so the running sum is FP-exact in any fold order.
    */
  def runningQuantity(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        round(sum(col("l_quantity")).over(w), 1).as("running_qty"))
  }

  /** ROLLUP sub-totals with explicit grouping-null labels. */
  def rollupQuantities(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 1).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))

  /** UNION + dedup (users seen in errors or purchases). */
  def unionDistinctUsers(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.filter(col("event_type") === "error").select(col("user_id"))
      .unionByName(
        e.filter(col("event_type") === "purchase").select(col("user_id")))
      .distinct()
  }

  /** JSON field extraction + aggregation over events.props.
    * Par.ensure: the per-row JSON parse is the cost and it runs
    * BEFORE the partial agg, so its parallelism is the scan's split
    * count — the readability scan-starvation fix applies (no-op on
    * ample splits).
    */
  def jsonExtractAgg(spark: SparkSession, dir: String): DataFrame =
    Par.ensure(Tables.events(spark, dir))
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"))

  /** GROUP BY + HAVING: repeat customers. */
  def repeatCustomers(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_spent"))
      .filter(col("n_orders") >= 5)

  /** argmax per group via max_by over a (value, id) struct — the struct
    * tie-break makes it deterministic (oracle uses the equivalent
    * row_number formulation).
    */
  def topEventPerType(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        max_by(col("event_id"), struct(col("value"), col("event_id")))
          .as("top_event"),
        max(col("value")).as("top_value"))

  /** Conditional (pivot-style) aggregation per user. */
  def userActivity(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        round(sum(when(col("event_type") === "purchase", col("value"))
          .otherwise(lit(0.0))), 2).as("purchase_value"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("n_errors"),
        count(lit(1)).as("n"))

  /** Approximate distinct (HLL) — the 100 TB path for q_distinct_agg;
    * rows-only check (sketch internals are engine-specific).
    */
  def approxDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))

  /** True pivot: event_type values become columns (explicit value list
    * so the plan is single-pass — no dynamic-distinct pre-query).
    */
  def pivotUserActivity(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(round(sum(col("value")), 2))

  /** Exact interpolated percentiles per group (the sort-based exact
    * form; at 100 TB the approx_percentile sketch replaces it).
    */
  def pricePercentiles(spark: SparkSession, dir: String): DataFrame =
    // one percentile aggregate for both quantiles (r17): the two-call
    // form sorted the per-group buffer twice; the array form computes
    // both from one buffer, bit-identically. (The old unprojected
    // percentile_approx column was pruned by Catalyst — dropping it
    // from the source changes nothing.)
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(expr("percentile(o_totalprice, array(0.5D, 0.95D))").as("qs"))
      .select(col("o_orderpriority"),
        round(element_at(col("qs"), 1), 4).as("median"),
        round(element_at(col("qs"), 2), 4).as("p95"))

  /** CUBE grouping sets over two dimensions. */
  def cubeQuantities(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 1).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))

  /** Correlated-subquery shape: orders above their customer's average
    * order value. Composed as agg + self-join (the decorrelated plan
    * Spark itself would produce; one shuffle on custkey).
    */
  def aboveAverageOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val avgs = o.groupBy(col("o_custkey").as("ck"))
      .agg(avg(col("o_totalprice")).as("cust_avg"))
    o.join(avgs, col("o_custkey") === col("ck"))
      .filter(col("o_totalprice") > col("cust_avg"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_above"),
        round(max(col("o_totalprice")), 2).as("max_price"))
  }

  /** Row-level string functions: upper/substring/concat/length/LIKE. */
  def customerNameFacts(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_name").like("%7%"))
      .select(
        col("c_custkey"),
        upper(col("c_mktsegment")).as("segment_u"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        concat(col("c_name"), lit("#"), col("c_nationkey").cast("string"))
          .as("tagged"),
        length(col("c_name")).cast("long").as("name_len"))

  /** Calendar extraction + aggregation (year/month rollup of orders). */
  def ordersByMonth(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"))

  /** Outer join preserving unmatched left rows (order count per
    * customer including zeros).
    */
  def ordersPerCustomerOuter(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        round(sum(coalesce(col("o_totalprice"), lit(0.0))), 2).as("spent"))

  /** Set operations: INTERSECT / EXCEPT between user populations. */
  def userSetOps(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val clickers = e.filter(col("event_type") === "click").select(col("user_id"))
    val buyers = e.filter(col("event_type") === "purchase").select(col("user_id"))
    clickers.intersect(buyers)
      .agg(count(lit(1)).as("n")).select(lit("both").as("grp"), col("n"))
      .unionByName(clickers.except(buyers)
        .agg(count(lit(1)).as("n")).select(lit("click_only").as("grp"), col("n")))
  }

  /** The textual SQL surface: TPC-H Q4 shape with a correlated EXISTS,
    * run through spark.sql over temp views — Catalyst decorrelates it
    * into the same semi-join the DataFrame API would build.
    */
  def latePriorityOrders(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_v")
    spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders_v
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem_v
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin)
  }

  /** Funnel / conversion: users whose first signup precedes a later
    * purchase, per cohort day — self-correlation of the event stream
    * (one shuffle on user_id; the cohort agg reuses it).
    */
  def signupPurchaseFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val firstSignup = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("signup_us"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
    firstSignup.join(purchases, Seq("user_id"), "left_outer")
      .groupBy(col("user_id"), col("signup_us"))
      .agg(sum(when(col("p_us") > col("signup_us"), 1L).otherwise(0L))
        .as("n_after"))
      .groupBy(floor(col("signup_us") / lit(86400000000L)).cast("long").as("cohort_day"))
      .agg(count(lit(1)).as("n_signups"),
        sum(when(col("n_after") > 0, 1L).otherwise(0L)).as("n_converted"))
  }

  /** Time-series delta: day-over-day change in summed value per event
    * type via lag over an ordered daily aggregate.
    */
  def dailyDeltas(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"))
      .agg(round(sum(col("value")), 2).as("total"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    daily.withColumn("prev_total", lag(col("total"), 1).over(w))
      .withColumn("delta", round(col("total") - coalesce(col("prev_total"),
        lit(0.0)), 2))
      .select(col("event_type"), col("day"), col("total"), col("delta"))
  }

  /** Histogram: fixed-width value buckets per event type. */
  def valueHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"),
        floor(col("value") / 25.0).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))

  /** RANGE-framed trailing window: 30-day running quantity per
    * supplier — the frame is defined by the time VALUE, not row
    * position, so ties and gaps behave correctly.
    */
  def trailing30dQuantity(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("t_us"))
      .rangeBetween(-30L * 86400000000L, 0L)
    Tables.lineitem(spark, dir)
      .withColumn("t_us", unix_micros(col("l_shipdate")))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        round(sum(col("l_quantity")).over(w), 1).as("qty_30d"))
  }

  /** Rank statistics: percent_rank / cume_dist over a unique ordering
    * (tie-broken on the key so both are exact single-division
    * fractions, FP-identical across engines).
    */
  def orderRankStats(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_orderkey"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
  }

  /** Global (no-group) scalar aggregate over the fact table. */
  def lineitemStats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        round(min(col("l_extendedprice")), 2).as("min_price"),
        round(max(col("l_extendedprice")), 2).as("max_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"))

  /** Hot-key profiler: the top-k keys by row count plus their share of
    * the table — the query you run BEFORE a big join to decide whether
    * [[Skew]] salting is needed. Two-phase agg (map-side combine) →
    * TakeOrdered top-k; the global count is a broadcast one-row cross
    * join (no driver-side action, no second shuffle of the data).
    */
  def heavyHitterUsers(spark: SparkSession, dir: String, k: Int = 15): DataFrame = {
    val ev = Tables.events(spark, dir)
    val totals = ev.agg(count(lit(1)).as("__total"))
    ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_rows"))
      .crossJoin(broadcast(totals))
      .withColumn("share_pct",
        round(col("n_rows") * 100.0 / col("__total"), 4))
      .drop("__total")
      .orderBy(col("n_rows").desc, col("user_id"))
      .limit(k)
  }

  /** Explicit GROUPING SETS through the SQL surface (finer control
    * than rollup/cube: exactly the named sets, nothing else). Same
    * single-shuffle expand-aggregate plan as rollup.
    */
  def quantityGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("gs_lineitem")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
           CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           COUNT(*) AS n_rows
         FROM gs_lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                 (l_returnflag), ())""")
  }

  /** Statistical aggregates per group: sample stddev/variance and the
    * quantity↔price correlation. All algebraic (sum/sum-of-squares
    * decomposable) → map-side partials, one shuffle. Rounded to 4 on
    * both engines: Spark and DuckDB accumulate in different orders and
    * (for stddev) different formulations; agreement at 4 decimals is
    * the contract.
    */
  def priceStats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_corr"),
        count(lit(1)).as("n_rows"))

  /** Array aggregation: per-customer sorted order-key list. Emitted as
    * a joined STRING (deterministic, engine-portable compare); the
    * in-engine form is the sorted array itself. collect_list is the
    * one aggregate with no map-side combine shrinkage — its output is
    * its input — so at 100 TB budget the shuffle for the full group
    * payload, or pre-aggregate cardinality first.
    */
  def ordersPerCustomerArray(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(array_join(sort_array(collect_list(col("o_orderkey"))), ",")
        .as("order_keys"),
        count(lit(1)).as("n_orders"))

  /** ntile quartiles per priority bucket → per-quartile totals.
    * Unique (totalprice, orderkey) ordering makes tile assignment
    * deterministic across engines.
    */
  def priceQuartiles(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .groupBy(col("o_orderpriority"), col("quartile"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"))
  }

  /** Latest-row-per-key compaction (the CDC/ingest dedup shape): keep
    * each user's most recent event. row_number + rank-1 filter lets
    * WindowGroupLimit prune to one row per key per partition BEFORE
    * the shuffle — at 100 TB the shuffle carries |keys| rows, not
    * |events|.
    */
  def latestEventPerUser(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), unix_micros(col("ts")).as("t_us"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** TPC-H Q14 shape: monthly promo revenue share. `part` is the
    * broadcast dim (star-schema ratio); lineitem shuffles ONCE on the
    * month key carrying two partial sums — the conditional numerator
    * rides the same aggregate pass as the denominator, not a second
    * scan. Share = ratio of the ROUNDED sums (both engines divide
    * identical doubles — FP-deterministic).
    */
  def promoRevenueShare(spark: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(Tables.part(spark, dir)),
        col("l_partkey") === col("p_partkey"))
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .groupBy(col("ship_month"))
      .agg(
        round(sum(when(col("p_type") === "PROMO", rev).otherwise(0.0)), 4)
          .as("promo_revenue"),
        round(sum(rev), 4).as("total_revenue"))
      .withColumn("promo_share",
        round(col("promo_revenue") * 100.0 / col("total_revenue"), 4))
  }

  /** Unpivot (melt): wide per-group aggregate columns back to tall
    * (group, metric, value) rows — the inverse of [[pivotUserActivity]].
    * Map-side row expansion over an aggregate-sized input; no extra
    * shuffle beyond the aggregate itself.
    */
  def unpivotQuantities(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price")), "metric", "value")

  /** Multiset set-ops: INTERSECT ALL / EXCEPT ALL preserve
    * multiplicities (the bag semantics ANSI defines and most engines
    * implement as a count-tracking aggregate, not a dedup). Output is
    * re-aggregated per user so the compare is deterministic.
    */
  def userMultisetOps(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def ids(t: String) =
      ev.filter(col("event_type") === t).select(col("user_id"))
    val both = ids("click").intersectAll(ids("purchase"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .withColumn("op", lit("intersect_all"))
    val only = ids("click").exceptAll(ids("purchase"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .withColumn("op", lit("except_all"))
    both.unionByName(only).select(col("op"), col("user_id"), col("n"))
  }

  /** Snapshot diff (the CDC/reconciliation shape): given two versions
    * of a keyed table, classify every key as added / removed / changed
    * via ONE full outer join on the key with a value-hash compare —
    * never a row-by-row driver loop. Snapshots are derived
    * deterministically from `orders` here; any two keyed DataFrames
    * work. At 100 TB both sides shuffle once on the key; if the
    * snapshots are co-bucketed ([[Bucketing]]) the diff is
    * exchange-free.
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val snapA = o.filter(col("o_orderkey") % 10 =!= 0)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    val snapB = o.filter(col("o_orderkey") % 10 =!= 1)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 7 === 0, round(col("o_totalprice") + 1.0, 2))
          .otherwise(col("o_totalprice")).as("o_totalprice"),
        col("o_orderpriority"))
    diffSnapshots(snapA, snapB, "o_orderkey")
  }

  def diffSnapshots(old: DataFrame, cur: DataFrame, key: String): DataFrame = {
    val valueCols = old.columns.filterNot(_ == key).sorted
    def sig(df: DataFrame) = md5(concat_ws("",
      valueCols.map(c => df(c).cast("string")): _*))
    val a = old.select(old(key).as("k"), sig(old).as("sig_a"))
    val b = cur.select(cur(key).as("k"), sig(cur).as("sig_b"))
    a.join(b, Seq("k"), "full_outer")
      .withColumn("status",
        when(col("sig_a").isNull, lit("added"))
          .when(col("sig_b").isNull, lit("removed"))
          .when(col("sig_a") =!= col("sig_b"), lit("changed")))
      .filter(col("status").isNotNull)
      .select(col("k").as(key), col("status"))
  }

  /** LATERAL correlated subquery through the SQL surface: each
    * BUILDING-segment customer joined to its top-2 orders by price.
    * Catalyst decorrelates the ORDER BY + LIMIT inner query into a
    * window-rank over a single join — the same plan the DataFrame
    * row_number form produces, so the per-customer probe never runs
    * row-at-a-time.
    */
  def topOrdersLateral(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("lat_customer")
    Tables.orders(spark, dir).createOrReplaceTempView("lat_orders")
    spark.sql(
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM lat_customer c
        |JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM lat_orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey
        |  LIMIT 2) t
        |WHERE c.c_mktsegment = 'BUILDING'""".stripMargin)
  }

  /** Set-returning function through the SQL surface (LATERAL VIEW
    * explode): token-length histogram per language. The generator runs
    * map-side (no shuffle until the aggregate), so at 100 TB the
    * explode adds zero exchange — only the (lang, len) aggregate
    * shuffles, and that is histogram-sized.
    */
  def tokenLengthHistogram(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir).createOrReplaceTempView("lv_documents")
    spark.sql(
      """SELECT lang, CAST(length(tok) AS BIGINT) AS tok_len, COUNT(*) AS n
        |FROM lv_documents
        |LATERAL VIEW explode(split(text, ' ')) t AS tok
        |GROUP BY lang, length(tok)""".stripMargin)
  }

  /** Per-group z-score outlier detection — the anomaly pre-filter a
    * cleaning pipeline runs before aggregates trust the data: events
    * whose value sits more than `threshold` sample standard deviations
    * from their event type's mean. The per-type stats are a
    * groups-sized aggregate broadcast back onto the stream, so the
    * corpus is scanned once and NEVER shuffles — outlier tagging is
    * map-side. FP note: mean/stddev summation order differs between
    * engines (and Spark runs), perturbing z by ~1e-12; the corpus'
    * minimum |z - threshold| margin is ~1e-4 at sf0.1, so the
    * threshold comparison is stable (measured, not assumed).
    */
  def valueOutliers(spark: SparkSession, dir: String,
      threshold: Double = 2.5): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    val stats = ev.groupBy(col("event_type"))
      .agg(avg(col("value")).as("__m"), stddev_samp(col("value")).as("__sd"))
    ev.join(broadcast(stats), Seq("event_type"))
      .withColumn("z", (col("value") - col("__m")) / col("__sd"))
      .filter(abs(col("z")) > threshold)
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("z"), 4).as("z"))
  }

  /** Time-series gap filling: densify each event type's daily series
    * over its own [min, max] day span (calendar rows generated with
    * `sequence` + explode), zero-filling silent days. The calendar side
    * is aggregate-sized (types × days), so the final join broadcasts
    * it against the daily aggregate — no extra fact shuffle beyond the
    * daily groupBy.
    */
  def denseDailySeries(spark: SparkSession, dir: String): DataFrame = {
    val day = expr("unix_micros(ts) div 86400000000").as("day")
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), day, col("value"))
      .groupBy(col("event_type"), col("day"))
      .agg(round(sum(col("value")), 2).as("total"),
        count(lit(1)).as("n_events"))
    val cal = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    cal.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("total"), lit(0.0)).as("total"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  /** Robust (median/IQR) scaling profile per group — the Tukey-fence
    * twin of [[valueOutliers]]' z-score: exact quartiles, the IQR,
    * and how many rows fall outside `[q1 - 1.5·IQR, q3 + 1.5·IQR]`.
    * Robust statistics are the curation default when value columns
    * are heavy-tailed (z-scores drown in their own outliers).
    *
    * Exact `percentile` sorts each group's values inside the agg —
    * correct here and at any group COUNT that fits a task (TPC-H
    * return flags: 3 groups of n/3 each — at 100 TB the
    * approx_percentile sketch replaces it, same plan otherwise). The
    * fences are rounded to 6dp on BOTH engines before the outlier
    * comparison, so a last-ulp interpolation difference between
    * engines cannot flip a boundary row.
    */
  def robustScaledPrices(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_extendedprice"))
    // ONE percentile aggregate for all three quartiles (r17, guide
    // §1.2 per-task work): three separate percentile() calls each
    // collected and sorted the full per-group value buffer — 3×
    // memory and 3 sorts for numbers the array form computes from a
    // single buffer, bit-identically (same sort, same interpolation).
    val stats = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))")
        .as("qs"))
      .select(col("l_returnflag"),
        element_at(col("qs"), 1).as("q1"),
        element_at(col("qs"), 2).as("median"),
        element_at(col("qs"), 3).as("q3"))
      .select(col("l_returnflag"),
        round(col("median"), 6).as("median"),
        round(col("q3") - col("q1"), 6).as("iqr"),
        round(col("q1") - (col("q3") - col("q1")) * 1.5, 6).as("lo_fence"),
        round(col("q3") + (col("q3") - col("q1")) * 1.5, 6).as("hi_fence"))
    li.join(broadcast(stats), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"), col("median"), col("iqr"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("l_extendedprice") < col("lo_fence")
          || col("l_extendedprice") > col("hi_fence"), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** Per-group OLS fit (the `regr_*` aggregate family): slope,
    * intercept, R² and point count of extendedprice ~ quantity. All
    * four are single-pass algebraic aggregates (co-moment merging) —
    * one shuffle on the group key, map-side combined; the 100 TB
    * trend-fit needs no ML library round-trip.
    */
  def linearFit(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4)
          .as("slope"),
        round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4)
          .as("intercept"),
        round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6)
          .as("r2"),
        regr_count(col("l_extendedprice"), col("l_quantity")).as("n_points"))
}
