package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector column algebra over array<float>/array<double> embeddings.
  *
  * Pure `functions._` expressions (zip_with / aggregate) — codegen'd,
  * no UDF serialization, null-safe. All arithmetic in DOUBLE with a
  * deterministic left-to-right fold so results are bit-stable across
  * partitionings and match a sequential oracle.
  */
object Vectors {

  private def fold(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    fold(zip_with(a.cast("array<double>"), b.cast("array<double>"),
      (x, y) => x * y))

  def norm2(a: Column): Column = {
    val d = a.cast("array<double>")
    sqrt(fold(zip_with(d, d, (x, y) => x * y)))
  }

  /** cosine(a, b) = dot / (||a|| * ||b||); null/zero-norm safe. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))
}
