package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, explode, split}

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
  * parallelism only when the estimated input width is lower — the
  * added shuffle ships raw rows once and is strictly cheaper than
  * serializing the downstream compute.
  *
  * The width estimate reads the ANALYZED logical plan's leaves (file
  * bytes ÷ maxPartitionBytes for file scans, driver-local for
  * LocalRelation) instead of probing `df.rdd.getNumPartitions`: the
  * rdd probe forces a full second physical planning of the input per
  * invocation — pure overhead that grows with plan width and defeats
  * lazy composition when operators chain. Leaves of unknown kinds
  * (Range, external RDDs, views over them) are assumed wide enough,
  * so the guard stays a no-op unless it can SEE a narrow input.
  */
private[graft] object Par {
  def ensure(df: DataFrame): DataFrame = {
    // Streaming plans can't be asked for an RDD (and micro-batch
    // sources size their own partitions) — pass them through.
    if (df.isStreaming) return df
    val conf = df.sparkSession.sessionState.conf
    val target = conf.numShufflePartitions
    val maxSplit = math.max(1L, conf.filesMaxPartitionBytes)
    val estimated = df.queryExecution.analyzed.collectLeaves().map {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          // ceil(bytes / maxPartitionBytes): how many splits the scan
          // yields at most (actual can be fewer after coalescing).
          // KNOWN RESIDUAL: the estimate is byte-based, but parquet
          // splits at ROW-GROUP boundaries — a writer configured for
          // row groups larger than maxPartitionBytes (non-default)
          // yields fewer real splits than estimated, and the guard
          // no-ops while the scan stays starved. Default writers
          // (128 MB row groups = the default maxPartitionBytes) are
          // estimated correctly.
          ((fs.location.sizeInBytes + maxSplit - 1) / maxSplit).toInt
        case _ => target // non-file relation: assume ample
      }
      case _: LocalRelation => 1 // driver-local test data
      case _ => target // unknown leaf: assume ample, stay lazy
    }.sum
    if (estimated < target) df.repartition(target) else df
  }

  /** The shared whitespace token stream: (doc_id[, extra...], tok)
    * via `explode(split(text, ' '))`, empties dropped — THE
    * tokenization convention every text lane's DuckDB oracle twins
    * with `string_split(text, ' ')`. One definition so the contract
    * cannot desynchronize across operators. ([[Relevance]] keeps its
    * own variant deliberately: its extra `doc_id IS NOT NULL` guard
    * must sit between ensure and explode for AQE exchange reuse —
    * see Relevance.docTokens.)
    */
  def tokens(docs: DataFrame, extra: Column*): DataFrame =
    ensure(docs)
      .select(col("doc_id") +: extra :+
        explode(split(col("text"), " ")).as("tok"): _*)
      .filter(col("tok") =!= "")
}
