package graft

import org.apache.spark.sql.functions._
import graft.operators.Fuzzy

class FuzzySpec extends GraftSpecBase {
  import spark.implicits._

  test("fuzzyPairs finds substitution, insertion and deletion neighbors") {
    initLog()
    val df = Seq("abc", "abd", "ab", "xbc", "xyz", "abcd").toDF("name")
    val got = Fuzzy.fuzzyPairs(df, "name").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("ab", "abc"), ("ab", "abd"),          // deletion
      ("abc", "abd"), ("abc", "xbc"),        // substitution
      ("abc", "abcd"), ("abcd", "abd")))     // insertion
  }

  test("shared deletion variant at distance 2 is filtered (ab/ba)") {
    initLog()
    // both generate variants "a" and "b", but levenshtein(ab, ba) = 2
    val got = Fuzzy.fuzzyPairs(Seq("ab", "ba").toDF("name"), "name").count()
    assert(got == 0)
  }

  test("deletion blocking is exact: equals brute-force levenshtein join") {
    initLog()
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters, Result => ScResult}
    // short strings over a tiny alphabet maximize near-collisions
    val gen = Gen.listOfN(30, Gen.choose(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
    val prop = Prop.forAllNoShrink(gen) { xs =>
      val df = xs.toDF("name")
      val fast = Fuzzy.fuzzyPairs(df, "name").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      val names = df.select(col("name")).distinct()
      val brute = names.as("a").crossJoin(names.as("b"))
        .filter(col("a.name") < col("b.name") &&
          levenshtein(col("a.name"), col("b.name")) <= 1)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      fast == brute
    }
    val res: ScResult = check(
      Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }

  test("maxBucket drops hot variant blocks (recall cap, no false pairs)") {
    initLog()
    // ten strings all one deletion away from "aa" -> variant "aa" is hot
    val df = (0 until 10).map(i => s"a${i}a").toDF("name")
    val all = Fuzzy.fuzzyPairs(df, "name").count()
    val capped = Fuzzy.fuzzyPairs(df, "name", maxBucket = 2).count()
    assert(capped <= all)
  }
}
