package graft

import org.apache.spark.sql.functions._
import graft.plans.AsOfJoinPlan
import graft.sources.Tables

class AsOfJoinPlanSpec extends GraftSpecBase {
  import spark.implicits._

  test("custom exec: correct as-of semantics on known rows") {
    initLog()
    val quotes = Seq(              // (key, t, px)
      (1L, 10L, 100.0), (1L, 20L, 101.0), (1L, 30L, 102.0),
      (2L, 15L, 200.0)).toDF("qk", "qt", "px")
    val trades = Seq(              // (key, t)
      (1L, 5L),    // before any quote -> null
      (1L, 20L),   // exactly at quote -> 101.0
      (1L, 25L),   // between -> 101.0
      (1L, 99L),   // after all -> 102.0
      (2L, 16L),   // -> 200.0
      (3L, 50L))   // no quotes for key -> null
      .toDF("tk", "tt")
    val out = AsOfJoinPlan.asof(trades, quotes, "tk", "qk", "tt", "qt")
      .select(col("tk"), col("tt"), col("px"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    assert(out == Set(
      (1L, 5L, null), (1L, 20L, 101.0), (1L, 25L, 101.0),
      (1L, 99L, 102.0), (2L, 16L, 200.0), (3L, 50L, null)))
  }

  test("custom exec: null-time right rows are skipped, not merge-wedging") {
    initLog()
    // Null right times sort FIRST within the key group (Ascending =
    // nulls first). A sentinel of MaxValue would park the merge on the
    // null row and drop every real match for the key; the exec must
    // consume-and-skip them instead.
    val quotes = Seq(
      (1L, Option.empty[Long], -1.0),      // null time, head of group
      (1L, Some(10L), 100.0), (1L, Some(20L), 101.0),
      (2L, Option.empty[Long], -2.0))      // key with ONLY null times
      .toDF("qk", "qt", "px")
    val trades = Seq(
      (1L, Some(15L)),                     // -> 100.0
      (1L, Some(25L)),                     // -> 101.0
      (1L, Option.empty[Long]),            // null left time -> no match
      (2L, Some(50L)))                     // only-null-time key -> null
      .toDF("tk", "tt")
    val out = AsOfJoinPlan.asof(trades, quotes, "tk", "qk", "tt", "qt")
      .select(col("tk"), col("tt"), col("px"))
      .collect().map(r => ((r.getLong(0),
        if (r.isNullAt(1)) -99L else r.getLong(1)),
        if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    assert(out == Map(
      (1L, 15L) -> 100.0, (1L, 25L) -> 101.0,
      (1L, -99L) -> null, (2L, 50L) -> null))
  }

  test("asof rejects ambiguous column names instead of picking the first") {
    initLog()
    val l = Seq((1L, 2L)).toDF("k", "t")
    val amb = Seq((1L, 2L, 3L)).toDF("k", "t", "t2")
      .select(col("k"), col("t"), col("t2").as("t"))
    val e = intercept[IllegalArgumentException] {
      AsOfJoinPlan.asof(l, amb, "k", "k", "t", "t")
    }
    assert(e.getMessage.contains("ambiguous"))
  }

  test("custom exec agrees with the composed union+window as-of join") {
    initLog()
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_ev"))
    // unique (key, time) on the right: keep max orderkey per (cust, date)
    val o = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"), unix_micros(col("o_orderdate")).as("t_ord"))
      .agg(max(col("o_orderkey")).as("ok"))
    val custom = AsOfJoinPlan.asof(e, o, "user_id", "o_custkey", "t_ev", "t_ord")
      .select(col("event_id"), col("ok"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // composed reference answer via window trick on the same inputs
    val tagged = e.select(col("user_id").as("k"), col("t_ev").as("t"),
        lit(1).as("tag"), col("event_id"), lit(null).cast("long").as("ok"))
      .unionByName(o.select(col("o_custkey").as("k"), col("t_ord").as("t"),
        lit(0).as("tag"), lit(null).cast("long").as("event_id"), col("ok")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("k"))
      .orderBy(col("t"), col("tag"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val composed = tagged
      .withColumn("m", last(col("ok"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("m"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(custom.size == composed.size)
    val diffs = custom.collect { case (id, v) if composed(id) != v => id }
    assert(diffs.isEmpty, s"${diffs.take(5)} differ")
  }

  test("property: custom exec matches a plain-Scala as-of reference") {
    initLog()
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters, Result => ScResult}
    val genKey = Gen.frequency(9 -> Gen.choose(0L, 5L).map(Option(_)),
      1 -> Gen.const(Option.empty[Long]))
    val genTime = Gen.frequency(9 -> Gen.choose(0L, 50L).map(Option(_)),
      1 -> Gen.const(Option.empty[Long]))
    val genCase = for {
      nl <- Gen.choose(0, 40)
      nr <- Gen.choose(0, 40)
      ls <- Gen.listOfN(nl, Gen.zip(genKey, genTime))
      rs <- Gen.listOfN(nr, Gen.zip(genKey, genTime))
    } yield (ls, rs)

    val prop = Prop.forAllNoShrink(genCase) { case (ls, rs) =>
      // unique (key, time) on the right — the exec's documented
      // contract for deterministic tie resolution
      val right = rs.distinctBy(r => (r._1, r._2)).zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong + 1000) }
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong) }
      val lDf = left.toDF("lk", "lt", "lid")
      val rDf = right.toDF("rk", "rt", "payload")
      val got = AsOfJoinPlan.asof(lDf, rDf, "lk", "rk", "lt", "rt")
        .select(col("lid"), col("payload"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      val want = left.map { case (k, t, lid) =>
        val m = (k, t) match {
          case (Some(kk), Some(tt)) => right
            .filter(r => r._1.contains(kk) && r._2.exists(_ <= tt))
            .sortBy(_._2.get).lastOption.map(_._3).getOrElse(-1L)
          case _ => -1L   // null key or null time matches nothing
        }
        lid -> m
      }.toMap
      got == want
    }
    val res: ScResult =
      check(Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("custom exec plan: one exchange per side, merge has no extra state") {
    initLog()
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_ev"))
    val o = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"),
        unix_micros(col("o_orderdate")).as("t_ord"))
    val df = AsOfJoinPlan.asof(e, o, "user_id", "o_custkey", "t_ev", "t_ord")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p.take(400))
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 2, p)
    assert(df.count() == e.count(), "left-preserving")
  }
}
