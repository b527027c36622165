package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a pre-built
  * `org.apache.spark.util.sketch.BloomFilter` (Spark's public sketch
  * API — the same structure the optimizer's runtime row-group filters
  * use, exposed here as a first-class expression for EXPLICIT join
  * pruning; see [[graft.operators.Skew.bloomPrefilteredJoin]]).
  *
  * The filter travels as its serialized bytes (a plan constant, like a
  * scalar-subquery result) and is deserialized once per task via a
  * transient lazy; codegen emits a direct `mightContainLong`/
  * `mightContainBinary` call — no UDF wrapping, no boxing for the
  * integral path, stays inside whole-stage codegen.
  *
  * No false negatives (a `false` is definitive), so filtering a join's
  * probe side with it never changes inner-join results — it only
  * drops rows that could not match, BEFORE they reach the shuffle.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain expects an integral or string key, got $other")
    }

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(filterBytes)

  /** Exposed for codegen (addReferenceObj target). */
  def bloom: BloomFilter = filter

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType    => filter.mightContainLong(v.asInstanceOf[Long])
    case IntegerType => filter.mightContainLong(v.asInstanceOf[Int].toLong)
    case ShortType   => filter.mightContainLong(v.asInstanceOf[Short].toLong)
    case ByteType    => filter.mightContainLong(v.asInstanceOf[Byte].toLong)
    case StringType  =>
      filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
    case other => throw new IllegalStateException(s"unsupported $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("graftBloomExpr", this,
        classOf[BloomMightContain].getName)
      val call = child.dataType match {
        case LongType => s"$ref.bloom().mightContainLong($v)"
        case IntegerType | ShortType | ByteType =>
          s"$ref.bloom().mightContainLong((long) $v)"
        case StringType => s"$ref.bloom().mightContainBinary($v.getBytes())"
        case other => throw new IllegalStateException(s"unsupported $other")
      }
      s"${ev.value} = $call;"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}
