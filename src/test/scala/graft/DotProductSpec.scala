package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Vectors

class DotProductSpec extends GraftSpecBase {
  import spark.implicits._

  test("native dot == HOF dot, bit-exact, float and double inputs") {
    initLog()
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, 0.6f)))
      .toDF("a", "b")
    val r = df.select(
      Vectors.dot(col("a"), col("b")).as("native"),
      Vectors.dotHof(col("a"), col("b")).as("hof")).collect()
    r.foreach { row =>
      assert(row.getDouble(0) == row.getDouble(1)) // identical fold order
    }
    val d = Seq((Array(1.5, 2.5), Array(2.0, 4.0))).toDF("a", "b")
      .select(Vectors.dot(col("a"), col("b"))).head.getDouble(0)
    assert(d == 13.0)
  }

  test("participates in whole-stage codegen (no interpreted fallback)") {
    initLog()
    // parquet-backed input: literals would constant-fold to a
    // LocalTableScan and hide the codegen path
    val df = graft.sources.Tables.embeddings(spark, sf)
      .select(Vectors.dot(col("embedding"), col("embedding")).as("d"))
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val hasCodegen = df.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w
    }.nonEmpty
    assert(hasCodegen, df.queryExecution.executedPlan.toString)
    assert(df.head.getDouble(0) > 0.0)
  }

  test("MinShingleHash matches a plain-Scala reference implementation") {
    initLog()
    import graft.functions.MinShingleHash
    import org.apache.spark.unsafe.types.UTF8String
    def ref(tokens: Seq[String], n: Int): Long = {
      val hs = tokens.map(t => MinShingleHash.fnv1a(UTF8String.fromString(t)))
      val k = math.min(n, tokens.length)
      val base = 0x9e3779b97f4a7c15L
      hs.sliding(k).map(w => w.foldLeft(0L)((acc, h) => acc * base + h))
        .reduce((a, b) => if (java.lang.Long.compareUnsigned(a, b) < 0) a else b)
    }
    val texts = Seq(
      "alpha bravo charlie delta echo foxtrot golf hotel india juliet",
      "one two three",                     // shorter than n
      "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.fingerprintsFast(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == ref(t.split(" ").toSeq, 8), s"doc $i")
    }
    // shared 8-token window between docs 0 and 2 can yield equal mins
    // only via a genuinely shared shingle; a changed tail must differ
    assert(got(0L) != got(1L))
  }

  test("null array yields null") {
    initLog()
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(Vectors.dot(col("a"), col("b")).as("d"))
    assert(df.head.isNullAt(0))
  }

  test("GraftExtensions registers dot_product / cosine_sim for SQL") {
    initLog()
    val prior = spark // force base session creation first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // fresh session on the same context, with extensions applied
      val s2 = SparkSession.builder().master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
          "cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").head()
      assert(r.getDouble(0) == 11.0)
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    } finally {
      SparkSession.setActiveSession(prior)
      SparkSession.setDefaultSession(prior)
    }
    // runtime registration path on an existing session
    GraftExtensions.register(prior)
    assert(prior.sql("SELECT dot_product(array(2.0D), array(3.0D))")
      .head().getDouble(0) == 6.0)
  }

  test("SQL min_shingle_hash / minhash_sig equal their Column forms") {
    initLog()
    GraftExtensions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val df = Seq("alpha bravo charlie delta echo foxtrot golf hotel india")
      .toDF("text").select(split(col("text"), " ").as("toks"))
    val viaSql = df.createOrReplaceTempView("fp_docs")
    val sqlRow = spark.sql(
      """SELECT min_shingle_hash(toks, 8) AS fp,
         minhash_sig(toks, 4, 16) AS sig FROM fp_docs""").head()
    val colRow = df.select(
      column(graft.functions.MinShingleHash(expression(col("toks")), 8)).as("fp"),
      column(graft.functions.MinHashSig(expression(col("toks")), 4, 16)).as("sig"))
      .head()
    assert(sqlRow.getLong(0) == colRow.getLong(0))
    assert(sqlRow.getSeq[Long](1) == colRow.getSeq[Long](1))
    // non-literal n must fail with a clear message
    val err = intercept[Exception] {
      spark.sql("SELECT min_shingle_hash(toks, CAST(rand()*4 AS INT)) FROM fp_docs")
        .head()
    }
    assert(err.getMessage.contains("integer literal"))
  }
}
