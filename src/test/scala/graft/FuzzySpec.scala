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

  test("jaroWinkler matches hand-computed classics and edge cases") {
    initLog()
    val cases = Seq(
      ("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("JELLYFISH", "SMELLYFISH"),
      ("abc", "abc"), ("", ""), ("a", ""), ("abc", "xyz"))
    val got = cases.toDF("a", "b")
      .select(Fuzzy.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(_.getDouble(0))
    // MARTHA/MARHTA: jaro = (6/6+6/6+5/6)/3 = 17/18; prefix 3 ->
    // jw = j + 3*0.1*(1-j)
    val jMartha = (1.0 + 1.0 + 5.0 / 6) / 3
    assert(math.abs(got(0) - (jMartha + 3 * 0.1 * (1 - jMartha))) < 1e-12)
    // DIXON/DICKSONX: m=4, t=0 -> jaro=(4/5+4/8+4/4)/3; prefix 2
    val jDixon = (4.0 / 5 + 4.0 / 8 + 1.0) / 3
    assert(math.abs(got(1) - (jDixon + 2 * 0.1 * (1 - jDixon))) < 1e-12)
    // JELLYFISH/SMELLYFISH: m=8, t=0 -> jaro=(8/9+8/10+8/8)/3 = 0.896
    // but prefix 0 -> no boost
    val jJelly = (8.0 / 9 + 8.0 / 10 + 1.0) / 3
    assert(math.abs(got(2) - jJelly) < 1e-12)
    assert(got(3) == 1.0 && got(4) == 1.0) // identical / both empty
    assert(got(5) == 0.0 && got(6) == 0.0) // one empty / no matches
  }

  test("jaroWinkler counts codepoints, not UTF-16 code units") {
    initLog()
    // Two non-BMP codepoints (each a surrogate pair in UTF-16). As
    // codepoints: [R,S] vs [R,R] has ls=lt=2, window 0, m=1, t=0 ->
    // jaro = (1/2 + 1/2 + 1)/3 = 2/3, below the 0.7 boost gate.
    // Code-UNIT iteration would see length-4 strings with window 1
    // and both surrogate halves of R matching -> a different value.
    val rocket = new String(Character.toChars(0x1F680))
    val star = new String(Character.toChars(0x1F31F))
    val got = Seq(
      (rocket + star, rocket + star),
      (rocket + star, rocket + rocket))
      .toDF("a", "b")
      .select(Fuzzy.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(_.getDouble(0))
    assert(got(0) == 1.0)
    assert(math.abs(got(1) - 2.0 / 3) < 1e-12)
  }

  test("jaro_winkler registers for SQL and stays codegen'd") {
    initLog()
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA') AS jw").collect().head
    assert(math.abs(r.getDouble(0) - 0.9611111111111111) < 1e-12)
    // the expression must not force a fallback out of whole-stage
    // codegen (non-literal input so constant folding can't pre-eval)
    val df = spark.range(10)
      .select(Fuzzy.jaroWinkler(
        concat(lit("name"), col("id")), lit("name1")).as("jw"))
    // the `*(n)` prefix marks a WholeStageCodegen stage in the simple
    // plan string; the Project carrying jaro_winkler must sit inside one
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("Project") && l.contains("jaro_winkler") &&
        l.trim.startsWith("*")), plan.take(500))
    assert(df.collect().length == 10)
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
