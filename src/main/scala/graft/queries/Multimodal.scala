package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Multimodal-column query surface: binary payloads with typed metadata
  * (full plumbing in [[graft.multimodal.Media]]; this is the
  * oracle-comparable slice over builtin binary functions).
  */
object Multimodal {

  /** M1 — binary column metadata: payload bytes (UTF-8 of text, standing
    * in for real media bytes), byte length, an 8-byte header fingerprint,
    * and the modality routed by id — the schema/typing layer every
    * multimodal pipeline needs before any decode.
    */
  def m1BinaryMeta(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"))
      .select(col("doc_id"), col("kind"),
        length(col("payload")).as("n_bytes"),
        substring(hex(col("payload")), 1, 16).as("header_hex"),
        md5(col("payload")).as("payload_md5"))
      .orderBy("doc_id")

  val m1Sql: String =
    """SELECT doc_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |    ELSE 'video' END AS kind,
      |  octet_length(encode(text)) AS n_bytes,
      |  substr(hex(encode(text)), 1, 16) AS header_hex,
      |  md5(text) AS payload_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  /** M2 — decode / feature-extract / resize / frame-sample over the
    * typed media Dataset: runs the REAL multimodal plumbing
    * ([[graft.multimodal.Media.extractFeatures]] — case-class encoders,
    * `mapPartitions` batching, binary payloads) end-to-end through the
    * oracle gate. The decode is the documented deterministic stub
    * (byte-sum checksum, length-derived frame count), so DuckDB can
    * replay every output field exactly: swapping a real codec in changes
    * none of the verified plumbing.
    */
  def m2MediaFeatures(s: SparkSession, d: String): DataFrame = {
    import graft.multimodal.Media
    Media.extractFeatures(Media.fromDocuments(documentsSpread(s, d)))
      .toDF()
      .orderBy("media_id")
  }

  /** The stub arithmetic replayed relationally: text is ASCII in the test
    * tables, so byte-sum == codepoint-sum; thumbnail fit and frame
    * sampling are pure integer arithmetic (`//` floor-division matches
    * JVM positive-int division).
    */
  val m2Sql: String =
    """SELECT doc_id AS media_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |    ELSE 'video' END AS kind,
      |  length(text) AS n_bytes,
      |  CAST(coalesce(list_sum(list_transform(range(1, length(text)+1),
      |    i -> ascii(text[i]))), 0) AS BIGINT) AS checksum,
      |  CASE WHEN w <= 128 AND h <= 128 THEN w
      |       WHEN w >= h THEN 128
      |       ELSE greatest(1, (w * 128) // h) END AS thumb_w,
      |  CASE WHEN w <= 128 AND h <= 128 THEN h
      |       WHEN w >= h THEN greatest(1, (h * 128) // w)
      |       ELSE 128 END AS thumb_h,
      |  ((length(text) // 64 + 1) + 9) // 10 AS n_frames_sampled
      |FROM (SELECT doc_id, text,
      |        n_chars % 640 + 16 AS w, n_chars % 480 + 9 AS h
      |      FROM documents)
      |ORDER BY media_id""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_binary_meta" -> m1BinaryMeta,
    "m2_media_features" -> m2MediaFeatures,
  )

  val oracle: Map[String, String] = Map(
    "m1_binary_meta" -> m1Sql,
    "m2_media_features" -> m2Sql,
  )
}
