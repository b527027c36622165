package graft

import org.apache.spark.sql.functions._
import graft.operators.BatchQueries
import graft.sources.Tables

class BatchQueriesSpec extends GraftSpecBase {

  test("pricingSummary: group count and additivity") {
    initLog()
    val out = BatchQueries.pricingSummary(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 6)
    val totalOrders = out.map(_.getAs[Long]("count_order")).sum
    val filtered = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp")).count()
    assert(totalOrders == filtered)
  }

  test("topRevenueOrders: at most 10 rows, descending, tie-broken") {
    initLog()
    val out = BatchQueries.topRevenueOrders(spark, sf).collect()
    assert(out.length <= 10)
    val revs = out.map(_.getAs[Double]("revenue")).toSeq
    assert(revs == revs.sorted.reverse)
  }

  test("semi+anti partition the customer table") {
    initLog()
    val out = BatchQueries.customersWithWithoutOrders(spark, sf).collect()
    val total = out.map(_.getAs[Long]("n")).sum
    assert(total == Tables.customer(spark, sf).count())
  }

  test("rollup grand total equals table count") {
    initLog()
    val out = BatchQueries.rollupQuantities(spark, sf)
    val grand = out.filter(col("returnflag") === "ALL" &&
      col("linestatus") === "ALL").collect()
    assert(grand.length == 1)
    assert(grand(0).getAs[Long]("n") == Tables.lineitem(spark, sf).count())
  }

  test("broadcast join plan actually broadcasts the dims") {
    initLog()
    val plan = BatchQueries.supplierByRegion(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      plan.take(800))
  }

  test("asof join matches a windowed self-check") {
    initLog()
    // every matched orderkey's orderdate must be <= the event ts
    val j = graft.operators.AsOf.eventsAsOfOrders(spark, sf)
      .filter(col("o_orderkey").isNotNull)
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("k2"), col("o_orderdate"))
    val e = Tables.events(spark, sf)
      .select(col("event_id").as("e2"), col("ts"))
    val bad = j.join(o, j("o_orderkey") === o("k2"))
      .join(e, j("event_id") === e("e2"))
      .filter(unix_micros(col("o_orderdate")) > unix_micros(col("ts")))
      .count()
    assert(bad == 0L)
  }

  test("distinct vs approx distinct within rsd") {
    initLog()
    val exact = BatchQueries.distinctUsers(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_users")).toMap
    val approx = BatchQueries.approxDistinctUsers(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("approx_users")).toMap
    exact.foreach { case (k, v) =>
      assert(math.abs(approx(k) - v).toDouble / v < 0.1, s"$k: $v vs ${approx(k)}")
    }
  }

  test("diffSnapshots classifies added/removed/changed, ignores identical") {
    initLog()
    import spark.implicits._
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "tag", "v")
    val cur = Seq((2L, "b", 20.0), (3L, "c", 31.0), (4L, "d", 40.0))
      .toDF("k", "tag", "v")
    val d = BatchQueries.diffSnapshots(old, cur, "k").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }
}
