package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All n-token-window rolling hashes of a token array, in window
  * order — the native form of "shingle then hash": the column-algebra
  * equivalent (transform(sequence(...), slice+array_join) followed by
  * xxhash64 on the strings) materializes every shingle STRING through
  * an interpreted lambda; this expression hashes each token's bytes
  * once and pays one multiply-add per window (same rolling scheme as
  * [[MinShingleHash]], which keeps only the min).
  *
  * `lane` selects one of two structurally independent hash families
  * (different FNV offset/multiplier chains AND different polynomial
  * bases), so callers can build a 128-bit key from two lanes whose
  * collisions are independent — the exactness basis the near-dup
  * operators document. A bijective remix of lane 0 would NOT do: every
  * lane-0 collision would survive it.
  *
  * Fewer than n tokens ⇒ one window over the whole list (callers
  * filter shorter docs; defined for totality).
  */
case class ShingleHashes(child: Expression, n: Int, lane: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if n >= 1 && (lane == 0 || lane == 1) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes expects array<string> (got $other), n >= 1, lane in {0,1}")
    }

  override def nullSafeEval(v: Any): Any =
    ShingleHashes.compute(v.asInstanceOf[ArrayData], n, lane)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashes.compute($c, $n, $lane)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {

  // lane 0: FNV-1a constants + golden-ratio base (as MinShingleHash)
  private final val Off0 = 0xcbf29ce484222325L
  private final val Mul0 = 0x100000001b3L
  private final val Base0 = 0x9e3779b97f4a7c15L
  // lane 1: murmur-style constants — different offset, different odd
  // multiplier, different odd base, so token-level AND window-level
  // collisions are independent of lane 0's
  private final val Off1 = 0x84222325cbf29ce4L
  private final val Mul1 = 0xff51afd7ed558ccdL
  private final val Base1 = 0xc6a4a7935bd1e995L

  private def tokHash(s: UTF8String, off: Long, mul: Long): Long = {
    val bytes = s.getBytes
    var h = off
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * mul
      i += 1
    }
    h
  }

  def compute(arr: ArrayData, n: Int, lane: Int): ArrayData =
    new GenericArrayData(raw(arr, n, lane))

  /** The window hashes as a primitive array (shared with
    * [[ShingleWindows]], which needs both lanes without the ArrayData
    * round-trip).
    */
  def raw(arr: ArrayData, n: Int, lane: Int): Array[Long] = {
    val off = if (lane == 0) Off0 else Off1
    val mul = if (lane == 0) Mul0 else Mul1
    val base = if (lane == 0) Base0 else Base1
    val m = arr.numElements()
    if (m == 0) return Array.emptyLongArray
    val k = if (m < n) m else n
    val nw = m - k + 1
    val out = new Array[Long](nw)
    // token hashes once each (each byte read once per lane)
    val th = new Array[Long](m)
    var i = 0
    while (i < m) { th(i) = tokHash(arr.getUTF8String(i), off, mul); i += 1 }
    var basePow = 1L
    i = 1
    while (i < k) { basePow *= base; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * base + th(i); i += 1 }
    out(0) = h
    i = k
    while (i < m) {
      h = (h - th(i - k) * basePow) * base + th(i)
      out(i - k + 1) = h
      i += 1
    }
    out
  }
}
