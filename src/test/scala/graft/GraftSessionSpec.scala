package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class GraftSessionSpec extends GraftSpecBase {

  test("GraftSession.local: nanos events readable, SQL functions live, confs set") {
    initLog()
    val prior = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = GraftSession.local(2, "graft-session-spec")
      assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
      assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
      assert(s.conf.get("spark.sql.shuffle.partitions") == "2")
      // the nanos-timestamp feed reads through Tables.events
      val n = graft.sources.Tables.events(s, sf).limit(5).count()
      assert(n == 5)
      // extension-registered native functions are available in SQL
      assert(s.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D))")
        .head().getDouble(0) == 11.0)
      val sh = s.sql(
        "SELECT shingle_hashes(split('a b c d', ' '), 2, 0), " +
          "shingle_hashes(split('a b c d', ' '), 2, 1)").head()
      assert(sh.getSeq[Long](0).size == 3)
      assert(sh.getSeq[Long](0) != sh.getSeq[Long](1), "independent lanes")
      // the as-of planner strategy rides the extension too
      assert(s.sessionState.planner.strategies
        .contains(graft.plans.AsOfJoinStrategy))
    } finally {
      SparkSession.setActiveSession(prior)
      SparkSession.setDefaultSession(prior)
    }
  }
}
