package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst dot product over two numeric arrays, accumulating
  * in double with a strict sequential left-to-right fold (so results
  * are bit-stable and match a sequential oracle).
  *
  * Exists because Spark's higher-order functions (`zip_with` +
  * `aggregate`) evaluate their lambdas interpreted, per element, with
  * an intermediate zipped array allocation — on an all-pairs
  * similarity join that is the entire runtime. This expression
  * participates in whole-stage codegen: the generated code is the
  * tight primitive loop you'd write by hand, no allocation.
  *
  * Nulls: null if either array is null (NullIntolerant behavior);
  * mismatched lengths fold over the common prefix (callers align
  * embedding dims upstream).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects numeric arrays, got ${left.dataType} / ${right.dataType}")
  }

  private def get(a: ArrayData, et: DataType, i: Int): Double = et match {
    case FloatType   => a.getFloat(i).toDouble
    case DoubleType  => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType    => a.getLong(i).toDouble
    case other => throw new IllegalStateException(s"unsupported $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += get(a, ta, i) * get(b, tb, i)
      i += 1
    }
    acc
  }

  private def genGet(v: String, et: DataType, i: String): String = et match {
    case FloatType   => s"(double) $v.getFloat($i)"
    case DoubleType  => s"$v.getDouble($i)"
    case IntegerType => s"(double) $v.getInt($i)"
    case LongType    => s"(double) $v.getLong($i)"
    case other => throw new IllegalStateException(s"unsupported $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${genGet(a, elemType(left), i)} * ${genGet(b, elemType(right), i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}
