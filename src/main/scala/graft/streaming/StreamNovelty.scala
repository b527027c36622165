package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming novelty gate — the ingest twin of batch
  * [[graft.operators.Governance.incrementalDedup]]'s exact lane:
  * classify each ARRIVING document against a static reference corpus
  * (stream-static join; the corpus index is a table the batch side
  * maintains) and, optionally, drop re-deliveries within the stream
  * itself first.
  *
  * The stream-static join re-reads the static side per micro-batch
  * plan, so at 100 TB the corpus side must be the compact
  * (content_hash) index table — 16 bytes a doc — not the corpus:
  * that is exactly the artifact [[graft.operators.Dedup.exact]]
  * already produces. State: none for the join itself (static side is
  * not stateful); the optional within-stream dedup carries one key
  * per distinct hash inside the watermark.
  */
object StreamNovelty {

  /** Tag arriving docs `exact_dup` / `novel` against the corpus's
    * content-hash set. `corpusHashes` must expose a `text_hash`
    * column (md5 hex of the document text — Dedup.exact's key).
    */
  def tagged(stream: DataFrame, corpusHashes: DataFrame): DataFrame =
    stream
      .withColumn("text_hash", md5(col("text")))
      .join(corpusHashes.select(col("text_hash")).distinct()
        .withColumn("__seen", lit(true)), Seq("text_hash"), "left")
      .withColumn("status",
        when(col("__seen"), lit("exact_dup")).otherwise(lit("novel")))
      .drop("__seen")

  /** Full gate: within-stream re-deliveries dropped first (bounded
    * watermark state), survivors tagged against the corpus. The
    * output carries only NOVEL documents — the rows an ingest
    * pipeline appends.
    */
  def novelOnly(stream: DataFrame, corpusHashes: DataFrame,
      watermarkCol: String, delay: String): DataFrame =
    tagged(
      StreamDedup.dropContentDupesWithin(stream, "text", watermarkCol, delay),
      corpusHashes)
      .filter(col("status") === "novel")
      .drop("status")

  /** SEMANTIC novelty gate — the embedding twin of the exact gate
    * above, against a persisted IVF index (the batch analog is
    * [[graft.operators.Similarity.semanticProbeDelta]]): each
    * arriving vector is assigned to its nearest persisted centroid
    * (pure projection — [[graft.operators.Similarity
    * .assignFromIndex]], no state), then stream-static ANTI-joined
    * against the corpus on (same list ∧ cosine ≥ tau). Survivors are
    * the semantically NOVEL arrivals — the rows to
    * `appendToIvfIndex`. Stateless (stream-static joins keep no
    * state); per-batch compare work is O(batch × cluster) because
    * the equi-join key is the list id.
    *
    * Scale note: a stream-static join re-plans the static side per
    * micro-batch, and the list predicate here depends on STREAM rows,
    * so the corpus scan is not statically pruned the way
    * `semanticProbeDelta`'s is. At 100 TB drive the SAME logic
    * through `foreachBatch { (batch, _) => semanticProbeDelta(batch,
    * path, tau) }` — each batch is a plain DataFrame there, so the
    * probed-list `isin` pruning applies; this declarative form is
    * the continuous twin for corpus-in-memory deployments (the spec
    * proves batch parity between the two).
    */
  def semanticNovelOnly(stream: DataFrame, indexPath: String,
      tau: Double = 0.9): DataFrame =
    semanticGate(stream, indexPath, tau, "left_anti")

  /** Arriving vectors that DO have a semantic near-dup in the corpus
    * (cosine ≥ tau within their assigned list) — the complement of
    * [[semanticNovelOnly]], for quarantine/audit sinks.
    */
  def semanticDuplicates(stream: DataFrame, indexPath: String,
      tau: Double = 0.9): DataFrame =
    semanticGate(stream, indexPath, tau, "left_semi")

  /** The packaged steady-state SEMANTIC INGEST LOOP: per micro-batch,
    * probe the arriving vectors against the persisted IVF index
    * ([[graft.operators.Similarity.semanticProbeDelta]] — corpus
    * scans ONLY the batch's probed list partitions, the 100 TB form)
    * and APPEND the novel survivors into the index
    * (`appendToIvfIndex` — assign-and-append, no retrain). The index
    * grows with exactly the semantically-new content; re-deliveries
    * of an already-ingested vector classify as dups on the next
    * batch (round-trip spec'd).
    *
    * Delivery contract: at-least-once on the index — a replayed
    * batch whose append committed re-appends its novel rows (the
    * duplicate is then semantically identical to itself, so it
    * changes no subsequent classification, only storage; compact or
    * exact-dedup the index on the retrain cadence). Centroids are
    * fixed between rebuilds — the documented append-drift trade —
    * and `retrainEvery > 0` makes that rebuild cadence REAL instead
    * of prose: every N micro-batches the loop re-runs
    * [[graft.operators.Similarity.retrainIvfIndex]] over everything
    * the index then holds (Lloyd re-centers on the drifted
    * distribution, lists re-bucket, append-fragmented files merge).
    * The cadence is epoch-keyed, so a replayed epoch re-runs the
    * same decision — retrain is idempotent on its input.
    */
  def startSemanticIngest(stream: DataFrame, indexPath: String,
      checkpoint: String, tau: Double = 0.9, retrainEvery: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val novel = graft.operators.Similarity
          .semanticProbeDelta(batch, indexPath, tau)
          .filter(col("status") === "novel")
          .select(col("vec_id"))
        val rows = batch.join(novel, Seq("vec_id"), "left_semi")
        if (!rows.isEmpty)
          graft.operators.Similarity.appendToIvfIndex(rows, indexPath)
        if (retrainEvery > 0 && epoch % retrainEvery == retrainEvery - 1)
          graft.operators.Similarity
            .retrainIvfIndex(batch.sparkSession, indexPath)
      }
      .start()

  private def semanticGate(stream: DataFrame, indexPath: String,
      tau: Double, joinType: String): DataFrame = {
    import graft.functions.Vectors
    val spark = stream.sparkSession
    // assignFromIndex materializes its assignment as a `list` column;
    // a caller whose stream schema ALREADY carries `list` would have
    // it silently overwritten and then dropped below, breaking the
    // return-the-input-schema contract. Stash the user's column under
    // a collision-proof name for the duration of the gate.
    val hasUserList = stream.columns.contains("list")
    val in =
      if (hasUserList) stream.withColumnRenamed("list", "__graft_user_list")
      else stream
    val assigned = graft.operators.Similarity.assignFromIndex(in, indexPath)
      .withColumn("__nrm", Vectors.norm2(col("embedding")))
    val corpus = spark.read.parquet(s"$indexPath/corpus")
      .select(col("list").as("__clist"), col("embedding").as("__ce"))
      .withColumn("__cn", Vectors.norm2(col("__ce")))
    val gated = assigned.join(corpus,
        col("list") === col("__clist") &&
          round(Vectors.dot(col("embedding"), col("__ce")) /
            (col("__nrm") * col("__cn")), 6) >= tau,
        joinType)
      // return the INPUT schema — the exact-hash twin (novelOnly)
      // drops its helper column, and a caller unioning survivors
      // with raw stream rows must not meet an internal `list` column
      .drop("__nrm", "list")
    if (hasUserList) gated.withColumnRenamed("__graft_user_list", "list")
    else gated
  }
}
