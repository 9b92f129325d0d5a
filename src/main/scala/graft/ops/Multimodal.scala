package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads as opaque binary columns with
  * typed metadata, decoded / feature-extracted via a partition-parallel
  * pipeline.
  *
  * The real decode step (image/audio codecs) is STUBBED with a
  * deterministic fake (byte histogram as the "feature vector") because no
  * media libraries ship in this container — but the Spark-side plumbing is
  * real and tested: binary schema, per-partition batching, fixed-size
  * frame sampling, feature schema (array<float>), and partitioning shape
  * are exactly what a codec-backed implementation would use.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte], media_kind: String)
  final case class MediaFeatures(doc_id: Long, n_bytes: Int, n_frames: Int,
                                 features: Array[Float])

  /** Synthesize the binary media table from documents (utf-8 payload stands
    * in for encoded media; media_kind derived deterministically). */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_kind"))

  /** STUB decoder: deterministic 16-bin byte histogram, L1-normalized.
    * A real implementation would decode pixels/samples here; everything
    * around it (batch iteration, schema, laziness) is production-shaped. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) >> 4) += 1f; i += 1 }
    val n = math.max(payload.length, 1).toFloat
    hist.map(_ / n)
  }

  /** Partition-parallel decode + feature extraction (the Scala analog of a
    * pandas-UDF mapInPandas batch pipeline): one pass per partition, no
    * driver involvement, constant memory per row. frameBytes controls
    * fixed-size frame sampling. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      frameBytes: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "payload", "media_kind").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val nBytes = r.payload.length
          val nFrames = (nBytes + frameBytes - 1) / frameBytes
          MediaFeatures(r.doc_id, nBytes, nFrames, decodeStub(r.payload))
        }
      }
  }

  /** Every-Nth fixed-size frame of a binary payload, as pure Column algebra
    * (REAL, not stubbed: fixed-size frame slicing is codec-independent —
    * the standard cheap frame-sampling pass before an expensive per-frame
    * decode). Guarded so `sequence` never runs descending on empty
    * payloads. */
  def sampleFrames(payload: org.apache.spark.sql.Column, frameBytes: Int,
                   everyN: Int): org.apache.spark.sql.Column = {
    val nFrames = ceil(length(payload) / lit(frameBytes.toDouble)).cast("int")
    val nSampled = ceil(nFrames / lit(everyN.toDouble)).cast("int")
    val stride = frameBytes * everyN
    when(nSampled > 0,
      transform(sequence(lit(0), nSampled - 1),
        i => payload.substr(i * stride + 1, lit(frameBytes))))
      .otherwise(array().cast("array<binary>"))
  }

  /** Resize a decoded feature vector to `outDim` by average-pooling equal
    * strides — the thumbnailing analog over the stubbed decode output
    * (a codec-backed pipeline pools pixels the same way). Requires
    * size(features) to be a multiple of outDim: violations return NULL
    * (visible) instead of silently pooling with a fractional stride —
    * the double-division stride used to truncate inside slice() but divide
    * fractionally in the average. */
  def resizePooled(features: org.apache.spark.sql.Column,
                   outDim: Int): org.apache.spark.sql.Column = {
    val stride = (size(features) / lit(outDim)).cast("int")
    when(size(features) > 0 && size(features) % outDim === 0,
      transform(sequence(lit(0), lit(outDim - 1)), j =>
        (aggregate(slice(features, j * stride + 1, stride), lit(0.0f),
          (acc, x) => acc + x) / stride).cast("float")))
  }

  /** Oracle-checkable frame-sampling projection: every 3rd 64-byte frame;
    * counts, sampled-byte total and the first frame round-tripped to string
    * (payloads are ASCII in the sandbox). */
  def frameSample(documents: DataFrame, frameBytes: Int = 64,
                  everyN: Int = 3): DataFrame = {
    val frames = sampleFrames(col("payload"), frameBytes, everyN)
    mediaTable(documents).select(
      col("doc_id"),
      size(frames).as("n_sampled"),
      aggregate(frames, lit(0), (acc, f) => acc + length(f)).as("sampled_bytes"),
      try_element_at(frames, lit(1)).cast("string").as("first_frame_str"))
  }

  /** Oracle-checkable flat projection of the media pipeline (byte lengths,
    * frame counts, first codepoint) — pure Column ops, no UDF. */
  def mediaSummary(documents: DataFrame, frameBytes: Int = 64): DataFrame =
    mediaTable(documents)
      .withColumn("n_bytes", length(col("payload")))
      .select(
        col("doc_id"),
        col("media_kind"),
        col("n_bytes"),
        ceil(col("n_bytes") / lit(frameBytes.toDouble)).cast("int").as("n_frames"))
}
