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

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_binary_meta" -> m1BinaryMeta,
  )

  val oracle: Map[String, String] = Map(
    "m1_binary_meta" -> m1Sql,
  )
}
