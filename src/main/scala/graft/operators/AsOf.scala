package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** As-of (most-recent-prior) join — an operator Spark lacks natively.
  *
  * Composed from built-ins (preference (a) from the build rules): tag
  * and union both sides, sort within each key by time, and carry the
  * last seen right-side row forward with `last(_, ignoreNulls=true)`.
  * This costs exactly ONE shuffle on (key) + a per-partition sort —
  * no per-row range probe, no broadcast of the big side, no skew
  * amplification — so it scales to fact-fact as-of joins at 100 TB
  * (both sides shuffle-partitioned on the key, sorted once).
  *
  * Deterministic tie-breaks: at equal timestamps the right side sorts
  * before the left (tag 0 < 1) so an order AT the event time matches;
  * among equal-time right rows the largest o_orderkey wins.
  */
object AsOf {

  /** Each event joined to the latest order (by o_orderdate <= ts) of
    * the same customer (events.user_id = orders.o_custkey); events
    * with no prior order keep nulls.
    */
  def eventsAsOfOrders(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id").as("k"), unix_micros(col("ts")).as("t"),
        lit(1).as("tag"), col("event_id"),
        lit(null).cast("long").as("o_orderkey"),
        lit(null).cast("double").as("o_totalprice"))
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey").cast("long").as("k"),
        unix_micros(col("o_orderdate")).as("t"),
        lit(0).as("tag"), lit(null).cast("long").as("event_id"),
        col("o_orderkey"), col("o_totalprice"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("tag"), col("o_orderkey").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)
    e.unionByName(o)
      .withColumn("m_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .withColumn("m_totalprice", last(col("o_totalprice"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("k").as("user_id"),
        col("m_orderkey").as("o_orderkey"),
        col("m_totalprice").as("o_totalprice"))
  }

  /** FORWARD as-of: each event joined to the EARLIEST subsequent order
    * (o_orderdate >= ts) of the same customer — the "next action
    * after" correlation (time-to-conversion, next restock after a
    * stock-out). Same one-shuffle union+window shape as the backward
    * form, mirrored: events sort BEFORE same-time orders (tag 0 < 1,
    * so an order AT the event time matches) and `first(_,
    * ignoreNulls)` scans the (currentRow, unboundedFollowing) frame.
    * Ties among equal-time orders break to the smallest o_orderkey.
    */
  def eventsAsOfNextOrders(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id").as("k"), unix_micros(col("ts")).as("t"),
        lit(0).as("tag"), col("event_id"),
        lit(null).cast("long").as("o_orderkey"),
        lit(null).cast("double").as("o_totalprice"))
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey").cast("long").as("k"),
        unix_micros(col("o_orderdate")).as("t"),
        lit(1).as("tag"), lit(null).cast("long").as("event_id"),
        col("o_orderkey"), col("o_totalprice"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("tag"), col("o_orderkey").asc_nulls_first)
      .rowsBetween(0, Window.unboundedFollowing)
    e.unionByName(o)
      .withColumn("m_orderkey", first(col("o_orderkey"), ignoreNulls = true).over(w))
      .withColumn("m_totalprice", first(col("o_totalprice"), ignoreNulls = true).over(w))
      .filter(col("tag") === 0)
      .select(col("event_id"), col("k").as("user_id"),
        col("m_orderkey").as("o_orderkey"),
        col("m_totalprice").as("o_totalprice"))
  }
}
