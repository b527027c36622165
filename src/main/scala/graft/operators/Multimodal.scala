package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal column handling: media as opaque `binary` columns with
  * typed metadata. The codec decode itself is STUBBED (deterministic
  * fake — this container has no image/audio libs); everything Spark
  * cares about — schema, binary column plumbing, partitioned batch
  * shape, offset arithmetic — is real and oracle-checked.
  */
object Multimodal {

  /** Materialize an opaque binary payload per document (UTF-8 bytes
    * stand in for encoded media) + typed metadata columns, the way a
    * 100 TB media table would carry (bytes, width, height, ...)
    * alongside scalar columns in the same parquet row group.
    */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    binaryMeta(Tables.documents(spark, dir))

  def binaryMeta(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
      md5(col("text")).as("payload_md5"),
      (((col("doc_id") % 64) + 1) * 8).cast("long").as("width"),
      (((col("doc_id") % 48) + 1) * 8).cast("long").as("height"))
      .withColumn("n_pixels", col("width") * col("height"))

  /** Frame sampling over a (stubbed) media payload: every 10th
    * 100-byte "frame", with real offset arithmetic and a content
    * checksum per sampled frame. The explode happens map-side — no
    * shuffle; at scale this is the standard patch/frame extraction
    * shape feeding a Pandas-UDF-style batched decoder.
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    frameSample(Tables.documents(spark, dir))

  def frameSample(docs: DataFrame,
      frameBytes: Int = 100, stride: Int = 10): DataFrame =
    docs
      .select(col("doc_id"), col("text"),
        floor(length(col("text")) / frameBytes).cast("long").as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("n_frames"), col("text"),
        explode(sequence(lit(0L), col("n_frames") - 1L,
          lit(stride.toLong))).as("frame_idx"))
      .select(col("doc_id"), col("n_frames"), col("frame_idx"),
        (col("frame_idx") * frameBytes).as("byte_offset"),
        md5(substr(col("text"), (col("frame_idx") * frameBytes + 1)
          .cast("int"), lit(frameBytes))).as("frame_md5"))

  /** Resize planning: target box + preserved aspect ratio, pure column
    * arithmetic over the metadata (the actual pixel resample lives in
    * the decode stub's partition batch at a real deployment).
    */
  def resizePlan(meta: DataFrame, maxSide: Int = 224): DataFrame = {
    val scale = least(
      lit(maxSide.toDouble) / col("width"),
      lit(maxSide.toDouble) / col("height"),
      lit(1.0))
    meta.select(col("doc_id"), col("width"), col("height"),
      round(scale, 6).as("scale"),
      floor(col("width") * scale).cast("long").as("out_w"),
      floor(col("height") * scale).cast("long").as("out_h"))
  }

  /** ViT-style patch-grid extraction over a (stubbed) image payload:
    * the `patch`×`patch` pixel grid implied by the [[binaryMeta]]
    * width/height, sampled every `stride` patches in each dimension
    * (stride 1 = the full grid a ViT consumes). Offsets are real
    * row-major RGB888 byte arithmetic; the pixel content itself is
    * the stand-in payload, so the per-patch checksum wraps its offset
    * into the available bytes (labeled stub — a real decoder reads
    * `bytes` at `byte_offset`). Double map-side explode (rows ≤
    * docs × (nx/stride) × (ny/stride)), zero shuffle — the image twin
    * of [[frameSample]] feeding the same batched-decode shape.
    */
  def patchGrid(spark: SparkSession, dir: String): DataFrame =
    patchGrid(Tables.documents(spark, dir))

  def patchGrid(docs: DataFrame, patch: Int = 16, stride: Int = 4): DataFrame =
    docs
      .select(col("doc_id"),
        (((col("doc_id") % 64) + 1) * 8).cast("long").as("width"),
        (((col("doc_id") % 48) + 1) * 8).cast("long").as("height"))
      .withColumn("nx", expr(s"(width + ${patch - 1}) div $patch"))
      .withColumn("ny", expr(s"(height + ${patch - 1}) div $patch"))
      .select(col("doc_id"), col("width"), col("height"), col("nx"),
        explode(sequence(lit(0L), col("ny") - 1L,
          lit(stride.toLong))).as("py"))
      .select(col("doc_id"), col("width"), col("height"), col("nx"),
        col("py"),
        explode(sequence(lit(0L), col("nx") - 1L,
          lit(stride.toLong))).as("px"))
      .select(col("doc_id"), col("px"), col("py"),
        ((col("py") * patch * col("width") + col("px") * patch) * 3L)
          .as("byte_offset"))

  /** Audio windowing over a (stubbed) PCM payload: 25 ms windows with
    * a 10 ms hop (the standard ASR/feature framing — defaults sized to
    * a 4 kHz rate so the small test payloads produce windows; at a
    * real 16 kHz deployment pass 400/160), with real sample-offset
    * arithmetic from byte-length metadata (16-bit mono ⇒ n_samples =
    * bytes/2). Map-side explode, no shuffle — the audio twin of
    * [[frameSample]]; windows feed the same batched decode/feature
    * stubs.
    */
  def audioWindows(spark: SparkSession, dir: String): DataFrame =
    audioWindows(Tables.documents(spark, dir))

  def audioWindows(docs: DataFrame,
      winSamples: Int = 100, hopSamples: Int = 40,
      sampleRate: Int = 4000): DataFrame = {
    val msPerHop = hopSamples * 1000 / sampleRate
    docs
      .select(col("doc_id"),
        (length(encode(col("text"), "UTF-8")).cast("long") / 2)
          .cast("long").as("n_samples"))
      .filter(col("n_samples") >= winSamples)
      .withColumn("n_windows",
        expr(s"(n_samples - $winSamples) div $hopSamples") + 1L)
      .select(col("doc_id"), col("n_samples"),
        explode(sequence(lit(0L), col("n_windows") - 1L)).as("win_idx"))
      .select(col("doc_id"), col("n_samples"), col("win_idx"),
        (col("win_idx") * hopSamples).as("start_sample"),
        (col("win_idx") * msPerHop).as("start_ms"))
  }

  /** Feature-extraction record produced by the stubbed encoder. */
  final case class FrameFeatures(doc_id: Long, frame_idx: Long,
      features: Array[Float])

  /** STUB feature extractor (image/audio embedding model absent):
    * deterministic 8-dim feature vector derived from the frame
    * checksum, emitted per partition batch — the output feeds
    * directly into graft.operators.Similarity (ANN / near-dup), which
    * is the real multimodal-dedup composition at scale.
    */
  def extractFeaturesStub(spark: SparkSession, dir: String): Dataset[FrameFeatures] = {
    import spark.implicits._
    frameSample(spark, dir)
      .select(col("doc_id"), col("frame_idx"), col("frame_md5"))
      .as[(Long, Long, String)]
      .mapPartitions { it =>
        // real impl: load model once per partition, batch-infer frames
        it.map { case (docId, idx, checksum) =>
          val feats = Array.tabulate(8) { i =>
            val h = java.lang.Long.parseLong(
              checksum.substring(i * 4, i * 4 + 4), 16)
            (h.toFloat / 65535.0f) * 2.0f - 1.0f
          }
          FrameFeatures(docId, idx, feats)
        }
      }
  }

  /** Decoded-frame record produced by the stubbed codec. */
  final case class DecodedFrame(doc_id: Long, frame_idx: Long,
      width: Int, height: Int, mean_intensity: Double)

  /** STUB decoder — deterministic fake in place of a real codec
    * (libjpeg etc. absent here). Runs as mapPartitions so a real
    * decoder would amortize per-partition init (model load, codec
    * context) exactly like a Pandas-UDF batch would.
    */
  def decodeFramesStub(spark: SparkSession, dir: String): Dataset[DecodedFrame] = {
    import spark.implicits._
    frameSample(spark, dir)
      .select(col("doc_id"), col("frame_idx"), col("frame_md5"))
      .as[(Long, Long, String)]
      .mapPartitions { it =>
        // real impl: init codec once per partition, decode each frame
        it.map { case (docId, idx, checksum) =>
          val h = java.lang.Long.parseLong(checksum.substring(0, 8), 16)
          DecodedFrame(docId, idx, ((h % 64) + 1).toInt * 8,
            ((h % 48) + 1).toInt * 8, (h % 256).toDouble)
        }
      }
  }
}
