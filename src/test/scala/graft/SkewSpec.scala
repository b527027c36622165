package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.sources.Tables

class SkewSpec extends GraftSpecBase {

  test("salted join result equals the plain join") {
    initLog()
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(orders, Seq("l_orderkey"))
      .agg(count(lit(1)), round(sum(col("l_quantity") * col("o_totalprice")), 2))
      .head
    val salted = Skew.saltedJoin(li, orders, "l_orderkey", "l_linenumber")
      .agg(count(lit(1)), round(sum(col("l_quantity") * col("o_totalprice")), 2))
      .head
    assert(plain.getLong(0) == salted.getLong(0))
    assert(plain.getDouble(1) == salted.getDouble(1))
  }

  test("salted distinct count equals exact distinct count") {
    initLog()
    val e = Tables.events(spark, sf)
    val exact = e.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedDistinctCount(e, "event_type", "user_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact == salted)
  }
}
