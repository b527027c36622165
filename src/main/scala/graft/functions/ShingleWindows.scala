package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-document DISTINCT shingle windows in one compiled pass:
  * `array<struct<h1:long, h2:long, pos:int>>` where (h1, h2) is the
  * 128-bit double-lane rolling hash of [[ShingleHashes]] and `pos` is
  * the 0-based token index of the window's FIRST occurrence.
  *
  * This fuses the `array_distinct(arrays_zip(lane0, lane1))` pattern
  * the near-dup family previously composed from column algebra:
  * arrays_zip allocates a struct per window and array_distinct then
  * compares those structs element-by-element through the interpreted
  * collection-op path — measurably the slowest step of the hash-pair
  * map stage. Here dedup is an open-addressed probe over the two
  * primitive lane arrays (no struct allocation for duplicates, no
  * quadratic fallback).
  *
  * `pos` makes hash→text recovery O(survivors): a caller that must
  * display the winning grams (topNgrams) joins the surviving
  * (doc_id, pos) pairs back to the corpus and slices the tokens,
  * instead of re-hashing every document a second time.
  *
  * Fewer than n tokens ⇒ one window over the whole list, as
  * [[ShingleHashes]] (callers filter shorter docs).
  */
case class ShingleWindows(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ShingleWindows.OutType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if n >= 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_windows expects array<string> (got $other) and n >= 1")
    }

  override def nullSafeEval(v: Any): Any =
    ShingleWindows.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleWindows.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "shingle_windows"
}

object ShingleWindows {

  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false),
    StructField("pos", IntegerType, nullable = false))),
    containsNull = false)

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val h1 = ShingleHashes.raw(arr, n, 0)
    val h2 = ShingleHashes.raw(arr, n, 1)
    val nw = h1.length
    if (nw == 0) return new GenericArrayData(Array.empty[Any])
    // Open-addressed dedup on the 128-bit key; capacity >= 2*nw keeps
    // the load factor under 0.5 (probe chains stay O(1)).
    val cap = Integer.highestOneBit(math.max(4, nw * 2 - 1)) << 1
    val mask = cap - 1
    val slot = new Array[Int](cap)
    java.util.Arrays.fill(slot, -1)
    val out = new Array[Any](nw)
    var cnt = 0
    var i = 0
    while (i < nw) {
      val a = h1(i); val b = h2(i)
      var s = (((a * 0x9e3779b97f4a7c15L) ^ b) >>> 40).toInt & mask
      var done = false
      while (!done) {
        val j = slot(s)
        if (j < 0) {
          slot(s) = i
          out(cnt) = new GenericInternalRow(
            Array[Any](a, b, i)): InternalRow
          cnt += 1
          done = true
        } else if (h1(j) == a && h2(j) == b) {
          done = true // duplicate window; first occurrence already kept
        } else {
          s = (s + 1) & mask
        }
      }
      i += 1
    }
    if (cnt == nw) new GenericArrayData(out)
    else {
      val trimmed = new Array[Any](cnt)
      System.arraycopy(out, 0, trimmed, 0, cnt)
      new GenericArrayData(trimmed)
    }
  }
}
