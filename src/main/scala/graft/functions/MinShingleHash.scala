package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing-style fingerprint as a native expression: the minimum
  * Rabin-Karp rolling hash over all n-token windows of a token array.
  *
  * vs the column-algebra form (materialize every shingle string, md5
  * each): no per-window string concatenation, each token hashed once
  * (FNV-1a over its bytes), each window then costs ONE multiply-add
  * (rolling update) — O(tokens) total instead of O(tokens·n·len).
  * Wrap-around 2^64 arithmetic lives inside the expression, so ANSI
  * overflow checking never sees it.
  *
  * Documents shorter than n tokens hash their whole token list.
  */
case class MinShingleHash(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if n >= 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"min_shingle_hash expects array<string> (got $other) and n >= 1 (got $n)")
    }

  override def nullSafeEval(v: Any): Any =
    MinShingleHash.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinShingleHash.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "min_shingle_hash"
}

object MinShingleHash {

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L
  private final val Base = 0x9e3779b97f4a7c15L   // odd => invertible mod 2^64

  def fnv1a(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * FnvPrime
      i += 1
    }
    h
  }

  /** Min over all n-windows of the polynomial hash
    * sum(tokHash_j * Base^(n-1-j)), computed with the O(1) rolling
    * update. Java long arithmetic wraps mod 2^64 by design.
    */
  def compute(arr: ArrayData, n: Int): Long = {
    val m = arr.numElements()
    if (m == 0) return 0L
    val k = if (m < n) m else n
    // Base^(k-1) for the remove-leading-token step
    var basePow = 1L
    var i = 1
    while (i < k) { basePow *= Base; i += 1 }
    // first window
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + fnv1a(arr.getUTF8String(i)); i += 1 }
    var minH = h
    // roll
    i = k
    while (i < m) {
      h = (h - fnv1a(arr.getUTF8String(i - k)) * basePow) * Base +
        fnv1a(arr.getUTF8String(i))
      if (java.lang.Long.compareUnsigned(h, minH) < 0) minH = h
      i += 1
    }
    minH
  }
}
