package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.DotProduct

/** SparkSessionExtensions entry point: registers graft's native
  * expressions for SQL use. Wire with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * SQL surface:
  *   dot_product(a, b)          — native codegen'd array dot product
  *   cosine_sim(a, b)           — dot / (||a||·||b||), composed
  *   min_shingle_hash(toks, n)  — rolling-hash winnowing fingerprint
  *   minhash_sig(toks, n, k)    — k-lane MinHash signature
  *   shingle_hashes(toks, n, lane) — all n-window rolling hashes
  *     (lane 0/1 select independent hash families for 128-bit keys)
  *   jaro_winkler(s1, s2)       — native JW string similarity
  *   quant_abs_error(arr, s)    — Σ|x − round(x/s)·s| (int8 calib)
  * (n/k/lane must be integer literals — they parameterize codegen.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[DotProduct].getName, name),
        builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {

  private def cosineExpr(a: Expression, b: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
    Divide(DotProduct(a, b),
      Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))))
  }

  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_product" -> ((c: Seq[Expression]) => DotProduct(c(0), c(1))),
    "cosine_sim" -> ((c: Seq[Expression]) => cosineExpr(c(0), c(1))),
    "min_shingle_hash" -> ((c: Seq[Expression]) =>
      graft.functions.MinShingleHash(c(0),
        litInt(c(1), "min_shingle_hash", "n"))),
    "minhash_sig" -> ((c: Seq[Expression]) =>
      graft.functions.MinHashSig(c(0),
        litInt(c(1), "minhash_sig", "n"), litInt(c(2), "minhash_sig", "k"))),
    "shingle_hashes" -> ((c: Seq[Expression]) =>
      graft.functions.ShingleHashes(c(0),
        litInt(c(1), "shingle_hashes", "n"),
        litInt(c(2), "shingle_hashes", "lane"))),
    "jaro_winkler" -> ((c: Seq[Expression]) =>
      graft.functions.JaroWinkler(c(0), c(1))),
    "quant_abs_error" -> ((c: Seq[Expression]) =>
      graft.functions.QuantAbsError(c(0), c(1))))

  /** Register on an ALREADY-RUNNING session (temp functions) — for
    * notebooks/REPLs where the session predates the library.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
