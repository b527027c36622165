package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityChecks

class QualityChecksSpec extends GraftSpecBase {
  import spark.implicits._

  test("expectations: violation counts, NULL predicate counts as violation") {
    initLog()
    val df = Seq[(java.lang.Long, String)](
      (5L, "a"), (50L, "b"), (null, "c"), (-1L, "a"), (200L, null))
      .toDF("qty", "flag")
    val out = QualityChecks.expectations(df, Seq(
      "qty_range" -> col("qty").between(1, 100),
      "flag_known" -> col("flag").isin("a", "b")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // qty: 5 ok, 50 ok, null -> violation, -1 violation, 200 violation
    assert(out("qty_range") == ((5L, 3L, 0.6)))
    // flag: a,b,a ok; c violation; null -> violation
    assert(out("flag_known") == ((5L, 2L, 0.4)))
  }

  test("expectations rejects duplicate rule names up front") {
    initLog()
    val df = Seq((1L, "a")).toDF("qty", "flag")
    val e = intercept[IllegalArgumentException] {
      QualityChecks.expectations(df, Seq(
        "r1" -> (col("qty") > 0), "r1" -> col("flag").isin("a")))
    }
    assert(e.getMessage.contains("duplicate rule names") &&
      e.getMessage.contains("r1"))
  }

  test("expectations is a single scan: one aggregate, no join/union fan-out") {
    initLog()
    val df = QualityChecks.lineitemExpectations(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), "per-rule UNION means R scans")
    assert(!plan.contains("Join"), "per-rule joins mean R scans")
    // exactly one source scan feeds all rules
    assert("Scan parquet".r.findAllIn(plan).size == 1, plan.take(800))
    assert(df.count() == 6)
  }

  test("referentialIntegrity: planted orphans counted, NULL key is orphan") {
    initLog()
    val child = Seq[(java.lang.Long, String)](
      (1L, "x"), (2L, "y"), (9L, "orphan"), (null, "nullkey"))
      .toDF("fk_id", "payload")
    val parent = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("pk_id", "name")
    val out = QualityChecks.referentialIntegrity(Seq(
      ("child_parent", child, "fk_id", parent, "pk_id"))).collect().head
    assert(out.getAs[String]("fk") == "child_parent")
    assert(out.getAs[Long]("n_rows") == 4L)
    assert(out.getAs[Long]("n_orphans") == 2L) // id 9 + the NULL key
    assert(out.getAs[Double]("orphan_rate") == 0.5)
    val dup = intercept[IllegalArgumentException] {
      QualityChecks.referentialIntegrity(Seq(
        ("e", child, "fk_id", parent, "pk_id"),
        ("e", child, "fk_id", parent, "pk_id")))
    }
    assert(dup.getMessage.contains("duplicate fk names"))
  }

  test("keySkew: exact stats on a hand-checked distribution") {
    initLog()
    // key a: 4 rows, b: 2, c: 1, d: 1  (n=8, k=4)
    val df = Seq("a", "a", "a", "a", "b", "b", "c", "d").toDF("k")
    val r = QualityChecks.keySkew(df, "k").collect().head
    assert(r.getAs[Long]("n_rows") == 8L)
    assert(r.getAs[Long]("n_keys") == 4L)
    assert(r.getAs[Long]("max_cnt") == 4L)
    assert(r.getAs[Double]("avg_cnt") == 2.0)
    assert(r.getAs[Double]("p50_cnt") == 1.5) // interpolated (1,1,2,4)
    assert(r.getAs[Double]("top1_share") == 0.5)
    assert(r.getAs[Double]("skew_ratio") == 2.0) // 4 / (8/4)
    // H = ln8 - (4ln4 + 2ln2)/8 ; uniform-over-keys would be ln4
    val h = math.log(8) - (4 * math.log(4) + 2 * math.log(2)) / 8
    assert(math.abs(r.getAs[Double]("entropy") -
      BigDecimal(h).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      < 1e-9)
  }

  test("keySkew approx mode matches exact on a small distribution") {
    initLog()
    val df = Seq("a", "a", "a", "a", "b", "b", "c", "d").toDF("k")
    val exact = QualityChecks.keySkew(df, "k").collect().head
    val approx = QualityChecks.keySkew(df, "k", exact = false).collect().head
    // sketch with accuracy 10000 is exact at this cardinality except
    // that approx_percentile returns an OBSERVED value, not an
    // interpolation — p50 of (1,1,2,4) is 1.0 vs 1.5
    assert(approx.getAs[Long]("max_cnt") == exact.getAs[Long]("max_cnt"))
    assert(approx.getAs[Double]("entropy") == exact.getAs[Double]("entropy"))
    assert(approx.getAs[Double]("p99_cnt") == 4.0)
  }

  test("profileDrift: planted null/ndv/bounds drift surfaces per column") {
    initLog()
    val v1 = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("id", "name")
    val v2 = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"),
      (null, "b"), (9L, "z"))
      .toDF("id", "name")
    val out = QualityChecks.profileDrift(v1, v2).collect()
      .map(r => r.getString(0) -> r).toMap
    val id = out("id")
    assert(id.getLong(1) == 1L)            // one new null
    assert(id.getLong(2) == 0L)            // ndv 3 -> 3
    assert(id.getDouble(4) == 6.0)         // max 3 -> 9
    assert(id.getLong(5) == 0L)
    val name = out("name")
    assert(name.getLong(2) == 0L)          // {a,b,c} -> {a,b,z}: 3 -> 3
    assert(name.getLong(5) == 1L)          // max str c -> z
    assert(name.isNullAt(3) && name.isNullAt(4))
  }

  test("joinCardinality: exact Σ cnt_L·cnt_R, hot-key share, and the " +
      "zero-match edge") {
    initLog()
    import spark.implicits._
    // hot: 100×50 = 5000 out; cold: 3×2 = 6; lonely keys match nothing
    val left = (Seq.fill(100)("hot") ++ Seq.fill(3)("cold") ++
      Seq.fill(7)("only_left")).toDF("k1")
    val right = (Seq.fill(50)("hot") ++ Seq.fill(2)("cold") ++
      Seq.fill(9)("only_right")).toDF("k2")
    val r = QualityChecks.joinCardinality(left, "k1", right, "k2").head()
    assert(r.getAs[Long]("left_rows") == 110L)
    assert(r.getAs[Long]("right_rows") == 61L)
    assert(r.getAs[Long]("matched_keys") == 2L)
    assert(r.getAs[Long]("out_rows") == 5006L)
    assert(r.getAs[Long]("max_key_out") == 5000L)
    // the estimate IS the real join's count
    assert(left.join(right, col("k1") === col("k2")).count() == 5006L)
    assert(r.getAs[Double]("amplification") ==
      math.rint(5006.0 / 110.0 * 1e6) / 1e6)
    assert(r.getAs[Double]("top_key_share") ==
      math.rint(5000.0 / 5006.0 * 1e6) / 1e6)
    // disjoint keys: everything zero, no divide-by-zero anywhere
    val z = QualityChecks.joinCardinality(
      Seq("a").toDF("k1"), "k1", Seq("b").toDF("k2"), "k2").head()
    assert(z.getAs[Long]("out_rows") == 0L)
    assert(z.getAs[Double]("amplification") == 0.0)
    assert(z.getAs[Double]("top_key_share") == 0.0)
  }
}
