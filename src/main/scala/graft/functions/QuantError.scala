package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** The symmetric-quantization round-trip kernel, shared by the
  * interpreted eval and the generated code (single static call — the
  * [[StringAlgs]] pattern — so the expression stays inside whole-stage
  * codegen without inlining the loop into every generated class).
  *
  * Rounding is Spark's own `round()` semantics for doubles —
  * `BigDecimal.valueOf(x).setScale(0, HALF_UP)` (decimal
  * shortest-representation, half away from zero) — NOT `Math.rint`
  * (binary, half-even). The distinction matters because the DuckDB
  * oracle computes the identical per-element `round(v/s)*s`, and the
  * two engines only hash-match because both round the *decimal*
  * rendering. Fold is strict sequential left-to-right, so the sum is
  * bit-stable and matches a sequential oracle before any final
  * rounding.
  */
object QuantAlgs {

  /** Sum over the array of |x − round(x/scale)·scale|. Caller guards
    * scale == 0 (the all-zero vector has zero error by convention).
    */
  def absErrSum(arr: ArrayData, scale: Double, isFloat: Boolean): Double = {
    val n = arr.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      val q = java.math.BigDecimal.valueOf(x / scale)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
      acc += math.abs(x - q * scale)
      i += 1
    }
    acc
  }
}

/** Native Catalyst expression: total absolute int8-symmetric
  * quantization round-trip error of a numeric array at a given scale.
  *
  * Exists because the `aggregate()` higher-order-function formulation
  * evaluates a three-node lambda tree interpreted per element — it was
  * the single most expensive query in the r7 bench suite (10.75 s of
  * 127.9 s at sf0.1). This is the same de-interpretation applied to
  * minhash (436→2.6 s) and ann_lsh (105→2.4 s): one codegen'd call,
  * one tight loop, zero allocation.
  */
case class QuantAbsError(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val okArr = left.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (okArr && right.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"quant_abs_error expects (array<float|double>, double), got " +
          s"${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    QuantAlgs.absErrSum(l.asInstanceOf[ArrayData],
      r.asInstanceOf[Double], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, s) =>
      s"graft.functions.QuantAlgs.absErrSum($a, $s, $isFloat)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "quant_abs_error"
}
