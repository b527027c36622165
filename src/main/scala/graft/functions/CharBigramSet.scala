package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document DISTINCT character bigrams in first-occurrence order —
  * the native form of `TextAnalysis.charBigrams`
  * (`array_distinct(transform(sequence(...), substr))`), whose
  * interpreted per-character lambda + string-array distinct is the
  * fluency lanes' hot loop. One compiled pass per doc: codepoints are
  * walked once, each bigram is packed into ONE long (two codepoints ≤
  * 0x10FFFF — no bigram string is built unless it survives the
  * per-doc dedup), and the open-addressed long-set dedup is the
  * ShingleWindows discipline at character granularity.
  *
  * Semantics contract (drop-in for `charBigrams`, short-text edges
  * included): length 0 → [""], length 1 → [text] (what the HOF form's
  * descending `sequence(0, -1)` + clamped `substr` produced), length
  * ≥ 2 → the distinct 2-codepoint windows in first-occurrence order.
  * Codepoint-indexed like Spark's `substr` (a surrogate pair is ONE
  * character of a bigram, not two).
  *
  * Not yet wired into the fluency lanes: landed ahead of the swap so
  * the r17 bench measures the change in isolation (SURVEY §4.5 r16 —
  * the relational reformulation measured neutral because it paid a
  * (doc, bigram) shuffle for its distinct; this expression dedups
  * map-side inside the row like the HOF did, with none of the
  * interpretation).
  */
case class CharBigramSet(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"char_bigram_set expects string (got $other)")
    }

  override def nullSafeEval(v: Any): Any =
    CharBigramSet.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharBigramSet.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "char_bigram_set"
}

object CharBigramSet {

  def compute(s: UTF8String): GenericArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n == 0)
      return new GenericArrayData(
        Array[Any](UTF8String.fromString("")))
    if (n == 1)
      return new GenericArrayData(Array[Any](s))
    val cps = str.codePoints().toArray
    // open-addressed long set, power-of-two capacity ≥ 2×windows —
    // 0 is never a valid packed bigram (cp1 ≥ 1 would be needed for
    // key 0 only if both cps are 0; U+0000 pairs map to key 0, so use
    // a presence FLAG array instead of a zero sentinel)
    var cap = java.lang.Integer.highestOneBit(
      math.max(4, (n - 1) * 2 - 1)) * 2
    if (cap < 4) cap = 4
    val keys = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val outIdx = new Array[Int](n - 1)
    var outN = 0
    var i = 0
    while (i < n - 1) {
      val key = (cps(i).toLong << 32) | (cps(i + 1).toLong & 0xffffffffL)
      var h = (key ^ (key >>> 33)) * 0xff51afd7ed558ccdL
      h ^= h >>> 29
      var j = (h & (cap - 1)).toInt
      var seen = false
      var done = false
      while (!done) {
        if (!used(j)) done = true
        else if (keys(j) == key) { seen = true; done = true }
        else j = (j + 1) & (cap - 1)
      }
      if (!seen) {
        used(j) = true
        keys(j) = key
        outIdx(outN) = i
        outN += 1
      }
      i += 1
    }
    val out = new Array[Any](outN)
    var k = 0
    while (k < outN) {
      val p = outIdx(k)
      out(k) = UTF8String.fromString(
        new String(Character.toChars(cps(p))) +
          new String(Character.toChars(cps(p + 1))))
      k += 1
    }
    new GenericArrayData(out)
  }
}
