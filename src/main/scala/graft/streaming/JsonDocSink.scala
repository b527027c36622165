package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** JSON document sinks — the reference's MongoSink role
  * (DataStreamJob.java:125-135: JSON docs, batch 1000, at-least-once).
  *
  * Two forms:
  *  - `startFileSink`: checkpointed append file sink (exactly-once
  *    for files — strictly stronger than the reference's
  *    at-least-once Mongo delivery);
  *  - `startForeachBatch`: the pluggable-store form — batches arrive
  *    as (DataFrame, epochId) exactly like Mongo's batched inserts;
  *    a store writer keys on epochId for idempotent retries.
  */
object JsonDocSink {

  /** Serialize every column into one JSON document per row —
    * the `Document.toJson` step (DataStreamJob.java:101-106).
    */
  def toJsonDocs(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))

  def startFileSink(df: DataFrame, path: String,
      checkpoint: String): StreamingQuery =
    toJsonDocs(df)
      .writeStream.outputMode("append").format("text")
      .option("path", path).option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()

  def startForeachBatch(df: DataFrame, outputMode: String)(
      write: (DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream.outputMode(outputMode)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        write(toJsonDocs(batch), epochId)
      }
      .start()
}
