package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** A concrete batched external-store sink with the reference MongoSink's
  * exact knobs (DataStreamJob.java:125-135: batch size 1000, batch
  * interval 1 s, 3 retries, at-least-once):
  *
  *  - setBatchSize(1000)      → `batchSize` docs per `insertMany` call
  *  - setBatchIntervalMs(1000)→ `flushInterval` trigger (micro-batch
  *    cadence — Spark flushes per epoch, not per wall-clock buffer)
  *  - setMaxRetries(3)        → per-insert retry loop; an insert that
  *    still fails rethrows, Spark retries the task, and the keyed
  *    idempotent store absorbs the replay
  *  - AT_LEAST_ONCE           → foreachBatch is at-least-once; keying
  *    every insert by (epoch, partition, chunk) upgrades the observable
  *    result to effectively-once for any store whose keyed write is an
  *    overwrite (Mongo replaceOne-upsert, file rename, KV put)
  *
  * Inserts run on EXECUTORS via `foreachPartition` — the driver never
  * collects a batch, so sink throughput scales with the cluster, and
  * each connection writes its own partition's rows in `batchSize`
  * chunks exactly like the reference's buffered Mongo writer.
  */
object DocStoreSink {

  /** Keyed idempotent document store: writing the same key twice must
    * leave one copy (the reference gets this from Mongo upserts; the
    * test fake from atomic file rename). Implementations must be
    * serializable — one instance ships to every executor.
    */
  trait DocStore extends Serializable {
    def insertMany(key: String, docs: Seq[String]): Unit
  }

  /** Directory-backed fake store: key → `key.jsonl`, written atomically
    * (temp file + rename) so a replayed key overwrites, never
    * duplicates.
    */
  final case class DirDocStore(path: String) extends DocStore {
    override def insertMany(key: String, docs: Seq[String]): Unit = {
      val dir = Paths.get(path)
      Files.createDirectories(dir)
      val tmp = Files.createTempFile(dir, s".$key", ".tmp")
      Files.write(tmp, docs.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, dir.resolve(s"$key.jsonl"),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Write one micro-batch: serialize rows to JSON docs, then insert
    * per partition in `batchSize` chunks, each chunk keyed
    * `e<epoch>-p<partition>-c<chunk>` and retried up to `maxRetries`
    * times. Replays of the same epoch (foreachBatch redelivery, task
    * retry) regenerate the same keys with the same contents, so the
    * store converges to exactly one copy per chunk.
    *
    * Chunk membership must be DETERMINISTIC for that to hold, and a
    * batch plan containing a shuffle/aggregation is not: reduce-side
    * iteration order depends on nondeterministic shuffle-fetch order,
    * so a replay could compose the same rows into different chunks
    * (old and new chunk keys would then coexist → duplicates). We
    * therefore sort each partition by the serialized doc before
    * chunking — partition MEMBERSHIP is already deterministic (hash
    * partitioning is a pure function of the keys), and the local sort
    * pins the intra-partition order without any extra shuffle.
    */
  def writeBatch(batch: DataFrame, epochId: Long, store: DocStore,
      batchSize: Int = 1000, maxRetries: Int = 3,
      retryDelayMs: Long = 0L): Unit = {
    require(batchSize > 0 && maxRetries >= 0)
    JsonDocSink.toJsonDocs(batch).select("value").as(Encoders.STRING)
      .sortWithinPartitions("value")
      .foreachPartition { (it: Iterator[String]) =>
        val pid = TaskContext.getPartitionId()
        it.grouped(batchSize).zipWithIndex.foreach { case (chunk, ci) =>
          val key = s"e$epochId-p$pid-c$ci"
          var attempt = 0
          var done = false
          while (!done) {
            try { store.insertMany(key, chunk); done = true }
            catch {
              case e: Exception if attempt < maxRetries =>
                attempt += 1
                if (retryDelayMs > 0) Thread.sleep(retryDelayMs)
            }
          }
        }
      }
  }

  /** The full sink: micro-batches at `flushInterval` cadence, each
    * written through [[writeBatch]]. Progress checkpointed; restart
    * replays at most the unacknowledged epoch (absorbed by keying).
    */
  def start(df: DataFrame, store: DocStore, checkpoint: String,
      batchSize: Int = 1000, flushInterval: String = "1 second",
      maxRetries: Int = 3, outputMode: String = "append"): StreamingQuery =
    df.writeStream.outputMode(outputMode)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(flushInterval))
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        writeBatch(batch, epochId, store, batchSize, maxRetries)
      }
      .start()
}
