package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins/aggregations.
  *
  * AQE's skew-join splitting (on by default in graft sessions) handles
  * most cases at runtime; these are the explicit forms for when the
  * skew is KNOWN (a handful of mega-keys at 100 TB) and the plan
  * should never materialize a hot partition in the first place.
  */
object Skew {

  /** Salted inner equi-join on `key`: the left side gets a
    * deterministic salt in [0, factor) (hashed from the whole row via
    * monotonically_increasing_id-free xxhash of the key + a row
    * discriminator column), the right side is replicated `factor`
    * times, and the join key becomes (key, salt) — a hot key's rows
    * spread over `factor` partitions instead of one.
    *
    * `discriminator` must be a left column that varies within a key
    * (any unique-ish id) so the salt actually distributes.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      discriminator: String, factor: Int = 8): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(col(key), col(discriminator)), lit(factor.toLong)))
    val replicated = right.withColumn("__salt",
      explode(array((0 until factor).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (salted) aggregation: partial sums per (key, salt),
    * then final combine per key. Spark's map-side partial aggregation
    * already gives this for algebraic aggs; the explicit form matters
    * for high-cardinality combiners (collect-like, exact distinct)
    * where one reducer would otherwise hold a mega-key's whole group.
    */
  def saltedDistinctCount(df: DataFrame, key: String, value: String,
      factor: Int = 8): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(value)), lit(factor.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(countDistinct(col(value)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n_distinct"))
}
