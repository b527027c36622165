package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-layout utilities: pre-shuffle a fact table ONCE at write
  * time so every subsequent equi-join/aggregation on the bucket key
  * runs with ZERO exchanges.
  *
  * This is the storage-side answer to the same problem [[Skew]] and
  * broadcast joins attack at query time: at 100 TB, a fact⋈fact join
  * on a key both sides are bucketed by reads co-located buckets
  * directly (bucket i joins bucket i), so the 100 TB shuffle happens
  * once at ingest instead of once per query. Both sides must use the
  * SAME bucket count (Spark joins bucketed tables shuffle-free only
  * on matching bucketing); `sortBy` additionally pre-orders each
  * bucket file so single-file buckets skip the sort-merge sort.
  *
  * Bucketing metadata lives in the catalog, so writes go through
  * `saveAsTable` (managed parquet) rather than a bare path — the
  * path API cannot record bucket specs. PlanShapeSpec PROVES the
  * zero-exchange join on two co-bucketed tables.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sorted: Boolean = true): Unit = {
    require(buckets > 0)
    val w = df.write.mode("overwrite")
      .format("parquet").bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Equi-join two co-bucketed tables on the bucket key. With matching
    * bucket counts the plan contains no ShuffleExchange on either side.
    */
  def cobucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
