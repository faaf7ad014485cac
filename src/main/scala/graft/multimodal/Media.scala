package graft.multimodal

import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

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

/** Extracted features for one media record. `format` and the
  * `decoded_*` fields come from REAL byte parsing of the payload header
  * ([[Media.decodeHeader]]); `checksum` sums the body bytes after it.
  */
final case class MediaFeatures(
    media_id: Long,
    kind: String,
    format: String, // png | bmp | wav, from magic bytes
    n_bytes: Int,
    checksum: Long,
    decoded_w: Int,
    decoded_h: Int,
    decoded_rate: Int,
    thumb_w: Int,
    thumb_h: Int,
    n_frames_sampled: Int)

/** What [[Media.decodeHeader]] reads out of a payload's header bytes. */
final case class DecodedHeader(format: String, width: Int, height: Int,
    sampleRate: Int, bodyOffset: Int)

/** Multimodal-column plumbing: binary payloads with typed metadata,
  * partition-parallel decode / feature-extract / resize / frame-sample.
  *
  * The decode step is a REAL pure-JVM header parser: payloads carry
  * genuine PNG / BMP / WAV headers (signature + IHDR with CRC,
  * BITMAPFILEHEADER + BITMAPINFOHEADER, RIFF/WAVE chunk list), built by
  * [[fromDocuments]] and parsed back byte-for-byte by [[decodeHeader]]
  * (magic-byte dispatch, big-endian IHDR dims, little-endian BMP dims,
  * a proper RIFF chunk walk for the sample rate and data offset). Only
  * the pixel/sample payload itself is synthetic (document text standing
  * in for compressed data — full codecs aren't in this environment), so
  * a real codec slots in AFTER the verified header layer without
  * touching it.
  *
  * Scale: `mapPartitions` keeps per-record overhead amortized over the
  * partition (one codec context per partition, not per row — the same
  * batching contract a vectorized/Arrow UDF would give); binary payloads
  * never pass through a shuffle here (features are extracted before any
  * wide operation, so only small feature rows shuffle).
  */
object Media {

  // ---- byte-order helpers ---------------------------------------------

  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def le32(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
  private def le16(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte)

  /** PNG: 8-byte signature + a real IHDR chunk (13-byte payload,
    * big-endian dims, 8-bit truecolor, CRC32 over type+data like the
    * spec requires), body appended where IDAT would go. 33 header bytes.
    */
  def pngBytes(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    val typeAndData = "IHDR".getBytes(US_ASCII) ++ be32(w) ++ be32(h) ++
      Array[Byte](8, 2, 0, 0, 0)
    val crc = new java.util.zip.CRC32()
    crc.update(typeAndData)
    sig ++ be32(13) ++ typeAndData ++ be32(crc.getValue.toInt) ++ body
  }
  val pngHeaderLen = 33

  /** BMP: BITMAPFILEHEADER ("BM", file size, 54-byte pixel offset) +
    * BITMAPINFOHEADER (40 bytes, little-endian dims, 24bpp). 54 header
    * bytes, body at the declared pixel-data offset.
    */
  def bmpBytes(w: Int, h: Int, body: Array[Byte]): Array[Byte] =
    "BM".getBytes(US_ASCII) ++ le32(54 + body.length) ++ le32(0) ++
      le32(54) ++
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++ le32(0) ++
      le32(body.length) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++
      body
  val bmpHeaderLen = 54

  /** WAV: RIFF/WAVE container with a 16-byte PCM "fmt " chunk (mono,
    * 16-bit, little-endian sample rate) and a "data" chunk holding the
    * body. 44 header bytes.
    */
  def wavBytes(rate: Int, body: Array[Byte]): Array[Byte] =
    "RIFF".getBytes(US_ASCII) ++ le32(36 + body.length) ++
      "WAVE".getBytes(US_ASCII) ++
      "fmt ".getBytes(US_ASCII) ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(rate) ++ le32(rate * 2) ++ le16(2) ++ le16(16) ++
      "data".getBytes(US_ASCII) ++ le32(body.length) ++ body
  val wavHeaderLen = 44

  /** REAL header decode: dispatch on magic bytes, then parse the
    * format's own header layout — PNG IHDR dims big-endian; BMP dims
    * and pixel offset little-endian out of the INFO/FILE headers; WAV
    * via an actual RIFF chunk walk ("fmt " for the sample rate, "data"
    * for the body offset, even-byte chunk padding honored) rather than
    * assuming the canonical 44-byte layout. Unknown magic fails loudly.
    */
  def decodeHeader(p: Array[Byte]): DecodedHeader = {
    def u8(i: Int): Int = p(i) & 0xff
    def rbe32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) |
      (u8(i + 2) << 8) | u8(i + 3)
    def rle32(i: Int): Int = u8(i) | (u8(i + 1) << 8) |
      (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def ascii(i: Int, n: Int): String =
      if (i + n <= p.length) new String(p, i, n, US_ASCII) else ""
    if (p.length >= pngHeaderLen && u8(0) == 0x89 && ascii(1, 3) == "PNG" &&
        ascii(12, 4) == "IHDR")
      DecodedHeader("png", rbe32(16), rbe32(20), 0, pngHeaderLen)
    else if (p.length >= bmpHeaderLen && ascii(0, 2) == "BM")
      DecodedHeader("bmp", rle32(18), rle32(22), 0, rle32(10))
    else if (p.length >= wavHeaderLen && ascii(0, 4) == "RIFF" &&
        ascii(8, 4) == "WAVE") {
      var off = 12
      var rate = 0
      var dataOff = -1
      while (dataOff < 0 && off + 8 <= p.length) {
        val id = ascii(off, 4)
        val sz = rle32(off + 4)
        // The declared size is untrusted input (extractFeatures runs over
        // arbitrary table bytes): a negative sz would step the walk
        // BACKWARDS (infinite loop) and an oversized one would read past
        // the payload. Fail loudly instead, like the unknown-magic path.
        require(sz >= 0 && off + 8 + sz <= p.length,
          s"RIFF chunk '$id' declares invalid size $sz at offset $off " +
            s"(payload ${p.length} bytes)")
        if (id == "fmt ") {
          require(sz >= 8, s"RIFF fmt chunk too short ($sz bytes)")
          rate = rle32(off + 12)
        }
        if (id == "data") dataOff = off + 8
        else off += 8 + sz + (sz & 1) // RIFF chunks pad to even length
      }
      require(dataOff >= 0 && rate > 0,
        "RIFF/WAVE payload missing fmt/data chunk")
      DecodedHeader("wav", 0, 0, rate, dataOff)
    } else
      throw new IllegalArgumentException(
        s"unrecognized media payload (${p.take(4).map(b => f"${b & 0xff}%02x").mkString(" ")}…)")
  }

  // not `private`: the Dataset encoder's generated SafeProjection must
  // be able to instantiate the class from outside this object
  final case class MediaSrc(media_id: Long, kind: String,
      text: String, width: Int, height: Int, sample_rate: Int)

  /** Derive a deterministic media table from `documents`: kind
    * round-robins image/audio/video; the payload is a REAL format
    * header (PNG for images, BMP for video keyframes, WAV for audio)
    * encoding the per-row dimensions / sample rate, with the UTF-8 text
    * standing in for the compressed pixel/sample data. Metadata columns
    * carry the same values the header encodes, so the decode roundtrip
    * is verifiable row by row.
    */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        col("text"),
        when(pmod(col("doc_id"), lit(3)) === 1, lit(0))
          .otherwise(pmod(col("n_chars"), lit(640)) + 16)
          .cast("int").as("width"),
        when(pmod(col("doc_id"), lit(3)) === 1, lit(0))
          .otherwise(pmod(col("n_chars"), lit(480)) + 9)
          .cast("int").as("height"),
        when(pmod(col("doc_id"), lit(3)) === 1,
          lit(16000) + pmod(col("doc_id"), lit(8)) * 1000)
          .otherwise(lit(0)).cast("int").as("sample_rate"))
      .as[MediaSrc]
      .map { s =>
        val body = s.text.getBytes(UTF_8)
        val payload = s.kind match {
          case "image" => pngBytes(s.width, s.height, body)
          case "audio" => wavBytes(s.sample_rate, body)
          case "video" => bmpBytes(s.width, s.height, body)
        }
        MediaRecord(s.media_id, s.kind, payload, s.width, s.height,
          s.sample_rate)
      }
  }

  /** Aspect-preserving resize-to-fit for the thumbnail metadata. */
  def resizeFit(w: Int, h: Int, maxSide: Int): (Int, Int) =
    if (w <= maxSide && h <= maxSide) (w, h)
    else if (w >= h) (maxSide, math.max(1, h * maxSide / w))
    else (math.max(1, w * maxSide / h), maxSide)

  /** Sample every `stride`-th frame index out of `nFrames`. */
  def frameSample(nFrames: Int, stride: Int): Seq[Int] =
    0 until nFrames by stride

  /** One record of [[Media.downsample]]'s output: the re-decoded
    * identity of the RESAMPLED artifact (format/dims/rate parsed back
    * out of the new payload's header — the roundtrip proof), plus the
    * decimation accounting. */
  final case class MediaResampled(
      media_id: Long,
      format: String,
      orig_body_bytes: Int,
      kept_units: Int,
      new_n_bytes: Int,
      new_checksum: Long,
      re_w: Int,
      re_h: Int,
      re_rate: Int)

  /** Byte-level media downsampling — the TRANSFORM step next to m2's
    * feature extraction: audio is decimated (every `sampleStride`-th
    * PCM sample kept, rate divided to match), video keeps every
    * `frameStride`-th 64-byte frame unit, stills pass through. The
    * resampled body is re-encoded behind the SAME verified header
    * layer ([[wavBytes]]/[[bmpBytes]]) and then DECODED BACK — the
    * output carries the new artifact's parsed header, so a payload
    * that stopped being a valid media file would fail loudly here,
    * not downstream. Same mapPartitions contract as
    * [[extractFeatures]]: byte work amortized per partition, payloads
    * never shuffled.
    */
  def downsample(media: Dataset[MediaRecord], sampleStride: Int = 4,
      frameStride: Int = 10): Dataset[MediaResampled] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val hdr = decodeHeader(m.payload)
        val body = java.util.Arrays.copyOfRange(
          m.payload, hdr.bodyOffset, m.payload.length)
        val (newPayload, keptUnits) = hdr.format match {
          case "wav" =>
            val kept = Array.newBuilder[Byte]
            var i = 0
            while (i < body.length) { kept += body(i); i += sampleStride }
            (wavBytes(hdr.sampleRate / sampleStride, kept.result()),
              (body.length + sampleStride - 1) / sampleStride)
          case "bmp" =>
            val nFrames = body.length / 64 + 1
            val frames = frameSample(nFrames, frameStride)
            val kept = frames.iterator.flatMap { f =>
              val from = f * 64
              if (from >= body.length) Iterator.empty
              else java.util.Arrays.copyOfRange(body, from,
                math.min(from + 64, body.length)).iterator
            }.toArray
            (bmpBytes(hdr.width, hdr.height, kept), frames.size)
          case _ => (m.payload, 1)
        }
        val re = decodeHeader(newPayload)
        var sum = 0L
        var i = re.bodyOffset
        while (i < newPayload.length) { sum += newPayload(i) & 0xff; i += 1 }
        MediaResampled(m.media_id, re.format, body.length, keptUnits,
          newPayload.length, sum, re.width, re.height, re.sampleRate)
      }
    }
  }

  /** Partition-parallel feature extraction over the typed media Dataset:
    * REAL header decode per record (format, dims, rate, body offset),
    * body checksum, thumbnail fit from the DECODED dims, frame sampling
    * from the body size (PNG = 1 still frame; BMP video = one 64-byte
    * synthetic frame unit per chunk; WAV = 0 frames). Constant memory
    * per record, one pass per partition.
    */
  def extractFeatures(media: Dataset[MediaRecord], thumbMax: Int = 128,
      frameStride: Int = 10): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val hdr = decodeHeader(m.payload)
        var sum = 0L
        var i = hdr.bodyOffset
        while (i < m.payload.length) { sum += m.payload(i) & 0xff; i += 1 }
        val bodyLen = m.payload.length - hdr.bodyOffset
        val nFrames = hdr.format match {
          case "png" => 1
          case "bmp" => bodyLen / 64 + 1
          case _ => 0
        }
        val (tw, th) = resizeFit(hdr.width, hdr.height, thumbMax)
        MediaFeatures(m.media_id, m.kind, hdr.format, m.payload.length, sum,
          hdr.width, hdr.height, hdr.sampleRate, tw, th,
          frameSample(nFrames, frameStride).size)
      }
    }
  }
}
