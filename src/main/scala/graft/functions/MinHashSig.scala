package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Full k-minhash signature of a token array's n-gram shingle set in
  * ONE compiled pass: rolling Rabin-Karp over per-token FNV hashes
  * gives each shingle's hash in O(1), and the k-member family is
  * derived per shingle by double hashing (h1 + i·h2). Duplicate
  * shingles only redo min-updates, so the result equals the signature
  * of the DISTINCT shingle set.
  *
  * Replaces explode(shingles) + k min-aggregates: no row explosion,
  * no wide shuffle — O(tokens·k) mul-adds per document inside the
  * expression, embarrassingly parallel across documents.
  */
case class MinHashSig(child: Expression, n: Int, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if n >= 1 && k >= 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<string> (got $other), n/k >= 1")
    }

  override def nullSafeEval(v: Any): Any =
    MinHashSig.compute(v.asInstanceOf[ArrayData], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSig.compute($c, $n, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {

  private final val Base = 0x9e3779b97f4a7c15L

  /** Murmur3-style finalizer: decorrelates h2 from h1. */
  private def mix(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^ (x >>> 33)
  }

  def compute(arr: ArrayData, n: Int, k: Int): ArrayData = {
    val m = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    if (m == 0) return new GenericArrayData(mins)
    val kk = if (m < n) m else n
    val tokHash = new Array[Long](m)
    var i = 0
    while (i < m) {
      tokHash(i) = MinShingleHash.fnv1a(arr.getUTF8String(i)); i += 1
    }
    var basePow = 1L
    i = 1
    while (i < kk) { basePow *= Base; i += 1 }
    var w = 0L
    i = 0
    while (i < kk) { w = w * Base + tokHash(i); i += 1 }
    updateMins(mins, w, k)
    i = kk
    while (i < m) {
      w = (w - tokHash(i - kk) * basePow) * Base + tokHash(i)
      updateMins(mins, w, k)
      i += 1
    }
    new GenericArrayData(mins)
  }

  private def updateMins(mins: Array[Long], shingleHash: Long, k: Int): Unit = {
    // double-hashing family; masked so i*h2 + h1 cannot overflow into
    // surprising orderings (unsigned compare keeps it uniform anyway)
    val h1 = shingleHash & ((1L << 61) - 1)
    val h2 = mix(shingleHash) & ((1L << 55) - 1)
    var i = 0
    var g = h1
    while (i < k) {
      if (g < mins(i)) mins(i) = g
      g += h2
      i += 1
    }
  }
}
