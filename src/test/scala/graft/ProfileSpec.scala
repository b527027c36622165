package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Profile

class ProfileSpec extends GraftSpecBase {
  import spark.implicits._

  private val planted = Seq(
    (Some(1L), Some("bb"), Some(2.5), Some(Timestamp.valueOf("2020-01-01 00:00:00"))),
    (Some(2L), Some("aa"), Some(2.5), Some(Timestamp.valueOf("2020-01-03 00:00:00"))),
    (Some(2L), None, Some(-1.0), None),
    (None, Some("cc"), None, Some(Timestamp.valueOf("2020-01-02 00:00:00"))))
    .toDF("id", "name", "price", "ts")

  test("profile: nulls, exact ndv, and type-routed min/max") {
    initLog()
    val out = Profile.profile(planted, exact = true).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size == 4)
    val id = out("id")
    assert(id.getLong(1) == 1L && id.getLong(2) == 2L)
    assert(id.getDouble(3) == 1.0 && id.getDouble(4) == 2.0)
    assert(id.isNullAt(5) && id.isNullAt(6))
    val name = out("name")
    assert(name.getLong(1) == 1L && name.getLong(2) == 3L)
    assert(name.isNullAt(3) && name.isNullAt(4))
    assert(name.getString(5) == "aa" && name.getString(6) == "cc")
    val price = out("price")
    assert(price.getLong(1) == 1L && price.getLong(2) == 2L)
    assert(price.getDouble(3) == -1.0 && price.getDouble(4) == 2.5)
    val ts = out("ts")
    assert(ts.getLong(1) == 1L && ts.getLong(2) == 3L)
    // timestamps surface as epoch micros in the numeric lane
    assert(ts.getDouble(3) == 1577836800000000.0)
    assert(ts.getDouble(4) == 1578009600000000.0)
  }

  test("approx profile: ndv close, everything else identical") {
    initLog()
    val exact = Profile.profile(planted, exact = true).collect()
      .map(r => r.getString(0) -> r).toMap
    // approx (HLL++) is the DEFAULT — the 100 TB-safe lane
    val approx = Profile.profile(planted).collect()
      .map(r => r.getString(0) -> r).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a.getLong(2) - e.getLong(2)) <= 1)
      assert(a.getLong(1) == e.getLong(1))
      Seq(3, 4).foreach(i => assert(a.isNullAt(i) == e.isNullAt(i) &&
        (e.isNullAt(i) || a.getDouble(i) == e.getDouble(i))))
      Seq(5, 6).foreach(i => assert(a.isNullAt(i) == e.isNullAt(i) &&
        (e.isNullAt(i) || a.getString(i) == e.getString(i))))
    }
  }

  test("profile survives date, boolean, binary, and nested columns") {
    initLog()
    // every type family in one table: dates route to epoch days,
    // booleans to the numeric lane, binary/array/struct keep null count
    // + ndv with null value lanes, maps keep only the null count
    val df = spark.sql("""
      SELECT DATE'2024-03-05' AS d, true AS f, CAST('ab' AS BINARY) AS b,
             array(1, 2) AS a, map('k', 1) AS m, named_struct('x', 1) AS s
      UNION ALL
      SELECT DATE'2024-03-07', false, NULL, NULL, NULL, NULL""")
    val out = Profile.profile(df, exact = true).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size == 6)
    val d = out("d")
    assert(d.getLong(1) == 0L && d.getLong(2) == 2L)
    assert(d.getDouble(3) == java.time.LocalDate.of(2024, 3, 5).toEpochDay.toDouble)
    assert(d.getDouble(4) == java.time.LocalDate.of(2024, 3, 7).toEpochDay.toDouble)
    val f = out("f")
    assert(f.getDouble(3) == 0.0 && f.getDouble(4) == 1.0)
    Seq("b", "a", "s").foreach { k =>
      val r = out(k)
      assert(r.getLong(1) == 1L && r.getLong(2) == 1L)
      assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
    }
    val m = out("m")
    assert(m.getLong(1) == 1L && m.isNullAt(2))
    assert(m.isNullAt(3) && m.isNullAt(4) && m.isNullAt(5) && m.isNullAt(6))
  }

  test("default (approx) profile plans NO Expand; exact lane does") {
    initLog()
    def hasExpand(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("Expand")
    assert(!hasExpand(Profile.profile(planted)),
      "HLL++ lane must be a plain single-projection aggregate")
    assert(hasExpand(Profile.profile(planted, exact = true)),
      "exact lane is expected to ride the countDistinct Expand")
  }

  test("profile on orders: key column is unique and null-free") {
    initLog()
    val orders = graft.sources.Tables.orders(spark, sf)
    val n = orders.count()
    val out = Profile.profile(orders, exact = true).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("o_orderkey").getLong(1) == 0L)
    assert(out("o_orderkey").getLong(2) == n)
    assert(out.values.forall(_.getLong(1) == 0L))
  }
}
