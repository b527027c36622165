package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The shared Jaro-Winkler algorithm, written once and called from
  * BOTH the interpreted eval and the generated code (a single static
  * call keeps the expression inside whole-stage codegen without
  * inlining a 40-line algorithm into every generated class — the
  * same structure Spark's own RegExpExtract/Levenshtein use).
  *
  * The arithmetic mirrors the RapidFuzz formulation (the one DuckDB's
  * `jaro_winkler_similarity` embeds) EXACTLY, so a DuckDB oracle
  * hash-matches bit-for-bit: integer transposition halving
  * (`t /= 2`), the three ratio terms accumulated in fixed order then
  * divided by 3, and the Winkler prefix boost (≤4 chars, weight 0.1)
  * applied only when jaro > 0.7.
  *
  * Iterates CODEPOINTS, not UTF-16 code units — RapidFuzz/DuckDB
  * length-normalize by codepoint count, so counting a surrogate pair
  * as two "characters" would diverge on non-BMP input (emoji, rare
  * CJK). For BMP-only strings the two iterations coincide.
  */
object StringAlgs {

  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString.codePoints().toArray
    val t = b.toString.codePoints().toArray
    val (ls, lt) = (s.length, t.length)
    if (ls == 0 && lt == 0) return 1.0
    if (ls == 0 || lt == 0) return 0.0
    val window = math.max(0, math.max(ls, lt) / 2 - 1)
    val sMatch = new Array[Boolean](ls)
    val tMatch = new Array[Boolean](lt)
    var m = 0
    var i = 0
    while (i < ls) {
      val lo = math.max(0, i - window)
      val hi = math.min(lt - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s(i) == t(j)) {
          sMatch(i) = true; tMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var trans = 0
    var k = 0
    i = 0
    while (i < ls) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s(i) != t(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val t2 = trans / 2 // integer halving, the RapidFuzz/DuckDB form
    var sim = m.toDouble / ls
    sim += m.toDouble / lt
    sim += (m.toDouble - t2) / m
    sim /= 3.0
    if (sim > 0.7) {
      var p = 0
      val maxP = math.min(4, math.min(ls, lt))
      while (p < maxP && s(p) == t(p)) p += 1
      sim += p * 0.1 * (1.0 - sim)
    }
    sim
  }
}

/** Native Jaro-Winkler similarity — Spark has `levenshtein` but no
  * JW, and the HOF/UDF routes are interpreted per row. Stays inside
  * whole-stage codegen via a static call into [[StringAlgs]].
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(l: Any, r: Any): Any =
    StringAlgs.jaroWinkler(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringAlgs.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}
