package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

object PqAlgs {

  /** argmin_code ||x − c_code||² over one subspace's codebook, with
    * the distance computed in the EXACT arithmetic order of the
    * least-over-structs column form it replaces — Σc² (left-to-right)
    * minus 2·(x·c) (left-to-right dot) — so the chosen code, and the
    * ties, are bit-identical to the r8 expression. Returns a 2-field
    * row (d, code); ties break to the lower code (least() on
    * (d, code) structs did the same).
    */
  def argmin(sub: Int, x: ArrayData, cents: Array[Array[Array[Double]]]): InternalRow = {
    val book = cents(sub)
    var bestD = Double.PositiveInfinity
    var bestC = -1
    var ci = 0
    while (ci < book.length) {
      val c = book(ci)
      if (c != null) {
        var c2 = 0.0
        var dot = 0.0
        var d = 0
        while (d < c.length) {
          c2 += c(d) * c(d)
          dot += x.getDouble(d) * c(d)
          d += 1
        }
        val dist = c2 - 2.0 * dot
        // first non-null code seeds the best unconditionally: a NaN
        // distance (NaN component in x) must still yield a VALID code
        // — the sentinel must never escape as code -1 (downstream
        // element_at(code+1) would throw, and a persisted index would
        // grow a phantom list). NaN orders LARGEST, matching least()
        // over (d, code) structs (Spark's double ordering puts NaN
        // above every value): a NaN-seeded best is replaced by the
        // first FINITE distance (strict < alone would have kept code 0
        // forever, e.g. Inf·0.0 in the first code's dot), a NaN dist
        // never beats a finite best, and all-NaN keeps the first
        // (lowest) code — least() returns the same. Finite ties keep
        // the first code via the strict <.
        if (bestC < 0 ||
            (java.lang.Double.isNaN(bestD) && !java.lang.Double.isNaN(dist)) ||
            dist < bestD) { bestD = dist; bestC = ci }
      }
      ci += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestD, bestC))
  }
}

/** Native Catalyst expression: per-subspace PQ code assignment —
  * struct(d, code) where d = ||c||² − 2·x·c (the L2 argmin surrogate;
  * add ‖x‖² for the true squared distance) and code is the argmin
  * with lower-code tie-break.
  *
  * Exists because the least-over-structs column form it replaces
  * materializes m×ksub struct terms in ONE generated method — at the
  * ann_pq search lane's m=16/ksub=32 the projection blew janino's
  * method limit and the whole stage fell back to interpreted (the
  * exact failure mode QuantAbsError/ShingleHashes exist to prevent).
  * Here the codebook rides the generated code as a reference object
  * and the argmin is one static call — bytecode size is constant in
  * m and ksub, the stage stays inside whole-stage codegen at any
  * codebook size.
  *
  * `left` = subspace index (int), `right` = the subspace slice of the
  * vector (array<double>); `cents(sub)(code)(dim)` may carry null
  * rows for codes a degenerate codebook never trained (skipped).
  */
case class PqArgmin(left: Expression, right: Expression,
    cents: Array[Array[Array[Double]]]) extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("code", IntegerType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = left.dataType == IntegerType &&
      (right.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"pq_argmin expects (int, array<double>), got " +
        s"${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(s: Any, x: Any): Any =
    PqAlgs.argmin(s.asInstanceOf[Int], x.asInstanceOf[ArrayData], cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCents", cents, "double[][][]")
    defineCodeGen(ctx, ev, (s, x) =>
      s"graft.functions.PqAlgs.argmin($s, $x, $ref)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_argmin"
}
