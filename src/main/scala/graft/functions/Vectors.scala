package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector column algebra over array<float>/array<double> embeddings.
  *
  * `dot` is the native codegen'd [[DotProduct]] expression — Spark's
  * own higher-order functions run their lambdas interpreted with an
  * intermediate array allocation, which dominates all-pairs joins.
  * All arithmetic in DOUBLE with a deterministic left-to-right fold,
  * so results are bit-stable across partitionings and match a
  * sequential oracle. `dotHof` is the pure-functions._ fallback.
  */
object Vectors {

  private def fold(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def dot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  /** zip_with/aggregate formulation — same values, interpreted speed. */
  def dotHof(a: Column, b: Column): Column =
    fold(zip_with(a.cast("array<double>"), b.cast("array<double>"),
      (x, y) => x * y))

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** cosine(a, b) = dot / (||a|| * ||b||); null/zero-norm safe. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))
}
