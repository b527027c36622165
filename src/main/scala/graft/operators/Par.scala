package graft.operators

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard for map-heavy operators.
  *
  * Operators whose expensive work happens BEFORE any shuffle (shingle
  * explosion, minhash signatures, per-doc scoring) inherit the scan's
  * split count as their parallelism. On a real 100 TB table that is
  * thousands of splits and this helper is a no-op; on a small/test
  * corpus (one parquet file = 1-2 splits) the whole map stage would
  * otherwise run on one or two cores while the cluster idles — the
  * measured difference on the 10× bench corpus was 3-10× wall-clock
  * for the affected operators.
  *
  * `ensure` round-robins the input up to the session's shuffle
  * parallelism only when the current partition count is lower — the
  * added shuffle ships raw rows once and is strictly cheaper than
  * serializing the downstream compute.
  */
private[graft] object Par {
  def ensure(df: DataFrame): DataFrame = {
    // Streaming plans can't be asked for an RDD (and micro-batch
    // sources size their own partitions) — pass them through.
    if (df.isStreaming) return df
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
