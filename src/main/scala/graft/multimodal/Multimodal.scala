package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by batched per-partition transforms.
  *
  * The Spark-side plumbing (schema, partitioning, iterator-batched transform
  * shape — the Scala analog of `mapInPandas` batches) is real and tested;
  * the actual codec calls are STUBBED with deterministic fakes because no
  * image/audio libraries ship in this environment. A production build swaps
  * `decodeStub`/`resampleStub` bodies for real codecs without touching any
  * Spark plumbing.
  *
  * 100 TB notes: media payloads stay in executor memory only for the span of
  * one batch; nothing is collected; partition counts follow the input file
  * layout, and decode is a narrow (shuffle-free) transformation.
  */
object Multimodal {

  /** One media asset: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String,            // image | audio | video
      content: Array[Byte],    // opaque payload (codec bytes)
      width: Int, height: Int, // image/video; 0 otherwise
      duration_ms: Long)       // audio/video; 0 otherwise

  /** Decoded features (one row per asset). */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      feature: Array[Float])   // stub embedding of the payload

  /** Sampled frame (video) or window (audio): one row per sample. */
  final case class MediaSample(
      media_id: Long,
      sample_idx: Int,
      offset_ms: Long,
      payload_hash: Long)

  /** STUB codec: deterministic byte-level "decode" standing in for a real
    * image/audio decoder. Output depends only on the payload bytes.
    */
  private def decodeStub(content: Array[Byte]): (Long, Array[Float]) = {
    var h = 1125899906842597L // deterministic FNV-ish rolling checksum
    var i = 0
    while (i < content.length) { h = h * 31 + content(i); i += 1 }
    val feat = new Array[Float](8)
    var j = 0
    while (j < 8) {
      feat(j) = (((h >>> (j * 8)) & 0xff).toInt - 128) / 128.0f
      j += 1
    }
    (h, feat)
  }

  /** Decode + feature-extract: batched per-partition transform. The
    * iterator is consumed lazily — Spark streams batches of rows through,
    * the same execution shape `mapInPandas` gives Python.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (checksum, feat) = decodeStub(r.content)
        MediaFeatures(r.media_id, r.kind, r.content.length.toLong, checksum, feat)
      }
    }
  }

  /** Frame/window sampling: one input row → every `everyMs`-th sample row.
    * For video/audio rows only; images yield a single sample at offset 0.
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): Dataset[MediaSample] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val n =
        if (r.kind == "image" || r.duration_ms <= 0) 1
        else (1 + r.duration_ms / everyMs).toInt
      (0 until n).map { i =>
        val off = i * everyMs
        // STUB frame decode: hash(payload, offset) stands in for pixels
        val h = java.util.Arrays.hashCode(r.content).toLong * 1000003L + off
        MediaSample(r.media_id, i, off, h)
      }
    }
  }

  /** Resize stub: metadata-only transform (a real impl rewrites `content`).
    * Kept declarative — pure column ops on the DataFrame form.
    */
  def resize(df: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(
      lit(1.0), lit(maxDim.toDouble) / greatest(col("width"), col("height"), lit(1)))
    df.withColumn("width", ceil(col("width") * scale).cast("int"))
      .withColumn("height", ceil(col("height") * scale).cast("int"))
  }

  /** Demo media table derived deterministically from the documents table
    * (payload = utf-8 text bytes) — exercises the plumbing on driver data.
    */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.load(spark, sfDir, "documents")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("content"),
        (pmod(col("doc_id") * 37, lit(1024)) + 64).cast("int").as("width"),
        (pmod(col("doc_id") * 53, lit(768)) + 64).cast("int").as("height"),
        (pmod(col("doc_id") * 97, lit(30000))).cast("bigint").as("duration_ms"))
      .as[MediaRow]
  }
}
