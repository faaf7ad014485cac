package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Media record: opaque binary payload + typed metadata — the multimodal
  * column model. Image/audio/video bytes are never interpreted by the
  * engine itself; they flow as `BinaryType` with metadata columns, and
  * decode/feature steps run per-partition over typed Datasets.
  */
final case class MediaRecord(
    media_id: Long,
    kind: String, // image | audio | video
    payload: Array[Byte],
    width: Int,
    height: Int,
    sample_rate: Int)

/** Extracted features for one media record. */
final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Int,
    checksum: Long,
    thumb_w: Int,
    thumb_h: Int,
    n_frames_sampled: Int)

/** Multimodal-column plumbing: binary payloads with typed metadata,
  * partition-parallel decode / feature-extract / resize / frame-sample.
  *
  * The decode step is a STUB — real image/audio codecs are not available
  * in this environment — but it is a *deterministic* fake (byte-sum
  * checksum, header-derived dimensions), so the surrounding Spark
  * plumbing (schema, encoders, mapPartitions batching, partitioning) is
  * real and fully tested. Swapping in a real codec changes only the body
  * of [[decodeStub]].
  *
  * Scale: `mapPartitions` keeps per-record overhead amortized over the
  * partition (one codec context per partition, not per row — the same
  * batching contract a vectorized/Arrow UDF would give); binary payloads
  * never pass through a shuffle here (features are extracted before any
  * wide operation, so only small feature rows shuffle).
  */
object Media {

  /** Derive a deterministic media table from `documents`: payload =
    * UTF-8 bytes of the text, kind round-robins image/audio/video, fake
    * dimensions derived from doc stats. Stands in for a real binary
    * ingest (parquet BinaryType column).
    */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        (pmod(col("n_chars"), lit(640)) + 16).cast("int").as("width"),
        (pmod(col("n_chars"), lit(480)) + 9).cast("int").as("height"),
        lit(16000).as("sample_rate"))
      .as[MediaRecord]
  }

  /** STUB decode: a real implementation would parse the codec header and
    * decode pixels/samples here. The fake is deterministic: checksum =
    * sum of unsigned bytes, frame count from payload length.
    */
  private def decodeStub(payload: Array[Byte]): (Long, Int) = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
    (sum, payload.length / 64 + 1)
  }

  /** Aspect-preserving resize-to-fit for the thumbnail metadata. */
  def resizeFit(w: Int, h: Int, maxSide: Int): (Int, Int) =
    if (w <= maxSide && h <= maxSide) (w, h)
    else if (w >= h) (maxSide, math.max(1, h * maxSide / w))
    else (math.max(1, w * maxSide / h), maxSide)

  /** Sample every `stride`-th frame index out of `nFrames`. */
  def frameSample(nFrames: Int, stride: Int): Seq[Int] =
    0 until nFrames by stride

  /** Partition-parallel feature extraction over the typed media Dataset.
    * One codec context per partition (here: none — the stub), constant
    * memory per record.
    */
  def extractFeatures(media: Dataset[MediaRecord], thumbMax: Int = 128,
      frameStride: Int = 10): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (checksum, nFrames) = decodeStub(m.payload)
        val (tw, th) = resizeFit(m.width, m.height, thumbMax)
        MediaFeatures(m.media_id, m.kind, m.payload.length, checksum, tw, th,
          frameSample(nFrames, frameStride).size)
      }
    }
  }
}
