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

  test("bloom-prefiltered join equals the plain join; filter prunes the probe") {
    initLog()
    // selective build side: BUILDING customers only (~1/5 of keys)
    val build = Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_name"))
    val probe = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    def summarize(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)), round(sum(col("o_totalprice")), 2)).head
    val plain = summarize(probe.join(build, col("o_custkey") === col("c_custkey")))
    val bloomed = summarize(Skew.bloomPrefilteredJoin(probe, build,
      "o_custkey", "c_custkey", expectedKeys = 20000L))
    assert(plain.getLong(0) == bloomed.getLong(0))
    assert(plain.getDouble(1) == bloomed.getDouble(1))
    // the probe side is actually pruned before the join (no false
    // negatives means count can only shrink vs the full probe)
    val joined = Skew.bloomPrefilteredJoin(probe, build, "o_custkey", "c_custkey",
      expectedKeys = 20000L)
    assert(joined.queryExecution.executedPlan.toString()
      .contains("bloom_might_contain"))
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val bf = build.stat.bloomFilter("c_custkey", 20000L, 0.01)
    val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
    val kept = probe.filter(column(graft.functions.BloomMightContain(
      expression(col("o_custkey")), bos.toByteArray))).count()
    val total = probe.count()
    assert(kept < total, s"bloom kept $kept of $total - no pruning")
  }

  test("bloom might_contain: string keys and codegen/interpreted parity") {
    initLog()
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val keys = Seq("alpha", "bravo", "charlie").toDF("k")
    val bf = keys.stat.bloomFilter("k", 100L, 0.01)
    val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
    val probe = Seq("alpha", "charlie", "zulu", "echo").toDF("k")
    val got = probe.filter(column(graft.functions.BloomMightContain(
      expression(col("k")), bos.toByteArray))).collect().map(_.getString(0)).toSet
    assert(Set("alpha", "charlie").subsetOf(got))  // no false negatives
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
