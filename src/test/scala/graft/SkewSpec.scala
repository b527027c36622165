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

  test("AQE splits a skewed join at runtime (documented 100TB fallback)") {
    initLog()
    import spark.implicits._
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.execution.SparkPlan
    // one mega-key (0) holding ~90% of rows + a uniform tail
    val skewed = spark.range(300000)
      .select(when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val dim = spark.range(5000).select(col("id").as("k"), (col("id") * 2).as("v"))
    val conf = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "100KB",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.map { case (key, _) => key -> spark.conf.getOption(key) }
    conf.foreach { case (key, v) => spark.conf.set(key, v) }
    try {
      val joined = skewed.join(dim, Seq("k"))
      // collect() drives THIS queryExecution so AQE finalizes the very
      // plan we inspect (count() would plan and adapt a separate one)
      // 270001 rows carry the mega-key 0; 499 tail keys land in the dim
      assert(joined.collect().length == 270500)
      def find(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
        case a: AdaptiveSparkPlanExec => find(a.executedPlan)
        case q: QueryStageExec => find(q.plan)
        case other => other.children.flatMap(find)
      })
      val smjs = find(joined.queryExecution.executedPlan)
        .collect { case j: SortMergeJoinExec => j }
      assert(smjs.exists(_.isSkewJoin),
        joined.queryExecution.executedPlan.toString.take(800))
    } finally saved.foreach {
      case (key, Some(v)) => spark.conf.set(key, v)
      case (key, None) => spark.conf.unset(key)
    }
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

  test("CMS hot keys: never undercounts, bounded overshoot, finds real hitters") {
    initLog()
    val e = Tables.events(spark, sf)
    val n = e.count()
    val exact = e.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val est = Skew.cmsHotKeys(e, "user_id", k = 15).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.nonEmpty && est.size <= 15)
    est.foreach { case (u, c) =>
      assert(c >= exact(u), s"CMS must never undercount (user $u)")
      assert(c <= exact(u) + (3 * 0.001 * n).toLong + 1,
        s"overshoot beyond 3·eps·N (user $u: $c vs ${exact(u)})")
    }
    // sampled candidates should substantially overlap the exact top-15
    val top = exact.toSeq.sortBy { case (u, c) => (-c, u) }.take(15)
      .map(_._1).toSet
    assert((est.keySet & top).size >= 8,
      s"only ${(est.keySet & top).size} of 15 true hitters surfaced")
  }
}
