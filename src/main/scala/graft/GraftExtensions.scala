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
  *   dot_product(a, b)        — native codegen'd array dot product
  *   cosine_sim(a, b)         — dot / (||a||·||b||), composed
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

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_product" -> ((c: Seq[Expression]) => DotProduct(c(0), c(1))),
    "cosine_sim" -> ((c: Seq[Expression]) => cosineExpr(c(0), c(1))))

  /** Register on an ALREADY-RUNNING session (temp functions) — for
    * notebooks/REPLs where the session predates the library.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
