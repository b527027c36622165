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
}
