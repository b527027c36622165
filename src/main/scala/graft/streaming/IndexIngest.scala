package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Steady-state STREAMING INGEST into the persisted graph-ANN index —
  * the HNSW twin of [[StreamNovelty.startSemanticIngest]], composed
  * from the same lifecycle pieces: per micro-batch append
  * ([[graft.operators.Hnsw.appendToHnswIndex]] — the bounded-delta
  * path, planes sized from existing + delta) plus the MAINTENANCE
  * CADENCE the append contract defers to
  * ([[graft.operators.Hnsw.compactHnswIndex]] re-caps the reverse-edge
  * in-degree drift and merges append-fragmented adjacency files every
  * `compactEvery` micro-batches — without it a long-running ingest
  * degrades probe latency one small file per batch and grows hub
  * degrees without bound).
  *
  * Unlike the IVF loop this one has NO novelty gate: HNSW is a
  * search index, not a dedup gate — every arriving vector is indexed.
  * Replay protection is BY ID instead: a re-delivered batch's ids
  * anti-join against the nodes catalog, so the at-least-once sink
  * contract holds without duplicate graph nodes (a replayed id would
  * otherwise insert a second node and split probe mass between the
  * twins). The anti-join broadcasts the DELTA against a
  * vec_id-projected scan of the catalog — O(|index|) scan per batch,
  * the price of exactly-once node identity on an at-least-once
  * transport.
  */
object IndexIngest {

  /** Deterministic within-batch pick: one row per vec_id, the
    * lexicographically-smallest embedding. `dropDuplicates("vec_id")`
    * keeps an ARBITRARY row when one micro-batch carries the same id
    * with different embeddings — which embedding gets indexed would
    * then vary across replays (and the by-id gate pins whichever
    * landed first). An aggregate min is order-independent, so the
    * same batch always indexes the same vector.
    */
  private def dedupById(batch: DataFrame): DataFrame =
    batch.select(col("vec_id"), col("embedding"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("embedding"))).as("pick"))
      .select(col("vec_id"), col("pick.embedding").as("embedding"))

  /** One micro-batch of the HNSW ingest chain — factored so composed
    * loops ([[IngestPipeline]]) run the identical gate+append without
    * nesting writeStreams. Within-batch dedup FIRST: the catalog
    * anti-join only sees already-persisted ids, so two same-id rows
    * arriving in one micro-batch would otherwise both pass it and
    * insert twin nodes (r14 ADVICE).
    */
  def hnswIngestBatch(batch: DataFrame, indexPath: String,
      dims0: Int = -1): Unit = {
    val spark = batch.sparkSession
    val existing = spark.read.parquet(s"$indexPath/nodes")
      .select(col("vec_id")).distinct()
    val fresh = dedupById(batch)
      .join(existing, Seq("vec_id"), "left_anti")
    if (!fresh.isEmpty)
      graft.operators.Hnsw.appendToHnswIndex(fresh, indexPath, dims0)
  }

  def startHnswIngest(stream: DataFrame, indexPath: String,
      checkpoint: String, compactEvery: Int = 8,
      dims0: Int = -1): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        hnswIngestBatch(batch, indexPath, dims0)
        // epoch-keyed cadence: a REPLAYED epoch re-runs the same
        // decision, and compaction is idempotent on its input — the
        // cadence needs no state of its own
        if (compactEvery > 0 && epoch % compactEvery == compactEvery - 1)
          graft.operators.Hnsw.compactHnswIndex(batch.sparkSession,
            indexPath)
      }
      .start()

  /** IVF-PQ twin of [[startHnswIngest]]: per micro-batch append
    * ([[graft.operators.Similarity.appendToIvfPqIndex]] — assign +
    * residual-encode against the STORED tables, pure map-side) with
    * the same BY-ID replay protection (the codes table is the
    * membership catalog — a replayed id would duplicate code rows and
    * double-count its vector in every probe), plus the fragment-
    * compaction cadence ([[graft.operators.Similarity
    * .compactIvfPqIndex]], epoch-keyed and idempotent like the HNSW
    * one). Codebook/centroid DRIFT is the one lifecycle piece a
    * cadence cannot close from the index alone: the index stores
    * codes, not raw vectors, so re-training is a rebuild
    * ([[graft.operators.Similarity.writeIvfPqIndex]]) from the
    * caller-held raw corpus — the retrainPqIndex trade, documented
    * rather than hidden behind a lossy decode.
    */
  def startIvfPqIngest(stream: DataFrame, indexPath: String,
      checkpoint: String, compactEvery: Int = 8,
      dims0: Int = -1): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val spark = batch.sparkSession
        val existing = spark.read.parquet(s"$indexPath/codes")
          .select(col("vec_id")).distinct()
        // same deterministic within-batch dedup as the HNSW twin:
        // duplicate ids in ONE batch would append duplicate code rows
        // and double-count the vector in every probe until compaction
        val fresh = dedupById(batch)
          .join(existing, Seq("vec_id"), "left_anti")
        if (!fresh.isEmpty)
          graft.operators.Similarity.appendToIvfPqIndex(fresh, indexPath,
            dims0)
        if (compactEvery > 0 && epoch % compactEvery == compactEvery - 1)
          graft.operators.Similarity.compactIvfPqIndex(spark, indexPath)
      }
      .start()
}
