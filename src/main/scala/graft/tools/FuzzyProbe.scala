package graft.tools

import org.apache.spark.sql.functions._

/** Stage attribution for the dedup_fuzzy lanes (§1 measure-first):
  * times each prefix of the FastSS pipeline so the expensive stage is
  * identified before touching it.
  * Usage: runMain graft.tools.FuzzyProbe [sfDir] [reps]
  */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.localFor(cpus, dir, "graft-fuzzy-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(2000000L).selectExpr("sum(id * 2)").collect()
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"FZ $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s  n=$n")
    }
    (1 to reps).foreach { i =>
      println(s"-- rep $i")
      val df = graft.sources.Tables.customer(spark, dir)
      val names = df.select(col("c_name").as("name")).distinct()
      t("names.distinct") { names.count() }
      val variants = names
        .select(col("name"),
          explode(sequence(lit(0), length(col("name")))).as("pos"))
        .select(col("name"), when(col("pos") === 0, col("name"))
          .otherwise(concat(
            expr("substring(name, 1, pos - 1)"),
            expr("substring(name, pos + 1, 2147483647)"))).as("v"))
        .distinct()
      t("variants.distinct") { variants.count() }
      val cand = variants.as("a").join(variants.as("b"),
          col("a.v") === col("b.v") && col("a.name") < col("b.name"))
        .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
      t("candidates (pre-distinct)") { cand.count() }
      val pairs = cand.distinct()
      t("pairs.distinct") { pairs.count() }
      t("levenshtein filter") {
        pairs.filter(levenshtein(col("name_a"), col("name_b")) <= 1).count()
      }
      t("full lane (noop)") {
        graft.operators.Fuzzy.customerNamePairs(spark, dir)
          .write.format("noop").mode("overwrite").save(); 0L
      }
    }
    spark.stop()
  }
}
