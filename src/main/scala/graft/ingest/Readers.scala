package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.normalize.Columns

/** Source adapters (SURVEY §2.1 S1-S7): fixture-shaped ingest of the
  * reference's scraped table families. HTML/DOM extraction happens
  * upstream (fixture build time); relationally each source is a JSON/CSV
  * scan plus schema normalization.
  *
  * Design note vs FIXTURES.md §2.1: `cells` is parallel
  * `headers: array<string>` + `cells: array<string>` rather than a map —
  * pandas column ORDER and DUPLICATE headers are both semantic (the
  * dedup-suffix pass P3 assigns `_1`, `_2` by position) and a map can
  * represent neither.
  */
object Readers {

  val rawTableSchema: StructType = StructType(Seq(
    StructField("team", StringType),
    StructField("page", StringType),
    StructField("tab", StringType),
    StructField("table_id", StringType),
    StructField("row_idx", LongType),
    StructField("headers", ArrayType(StringType)),
    StructField("cells", ArrayType(StringType))))

  val dvpRawSchema: StructType = StructType(Seq(
    StructField("position", StringType),
    StructField("timeframe", StringType),
    StructField("row_idx", LongType),
    StructField("team_raw", StringType),
    StructField("pts", StringType), StructField("reb", StringType),
    StructField("ast", StringType), StructField("three_pm", StringType),
    StructField("stl", StringType), StructField("blk", StringType),
    StructField("to", StringType)))

  /** S1/S3 — raw scraped-table scan: one JSON row per table row with
    * positional headers/cells; widened into one column per (deduped,
    * canonicalized) header. Headers are table-constant, so the column
    * algebra runs on the driver from one sample row; the data path is a
    * pure projection (`cells[i]`), fully codegen'd.
    */
  def rawTable(spark: SparkSession, path: String, tableId: String): DataFrame = {
    val raw = spark.read.schema(rawTableSchema).json(path)
      .filter(col("table_id") === tableId)
    val headers: Seq[String] = raw.select("headers").limit(1).collect()
      .headOption.map(_.getSeq[String](0))
      .getOrElse(Seq.empty)
    val names = Columns.normalizeRawHeaders(headers)
    val cols = col("team") +: col("page") +: col("tab") +: col("row_idx") +:
      names.zipWithIndex.map { case (n, i) =>
        try_element_at(col("cells"), lit(i + 1)).as(n)
      }
    raw.select(cols: _*)
  }

  /** S4 — typed DvP scan: string-typed stat rows with scan order. */
  def dvpRaw(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(dvpRawSchema).json(path)

  /** S6 — lineup-game scan (`lineup_scraper.py:34-114`): one JSON row
    * per game block in the scraped shape — matchup, tip-off time, the
    * raw betting string, and the nested `team -> {pos -> player}`
    * lineup dict read as a typed map-of-maps (the explicit schema keeps
    * the nested dict a `MapType` instead of Spark's inferred per-key
    * struct, so downstream `explode`s see (key, value) rows exactly
    * like the reference's dict walk).
    */
  val lineupGamesSchema: StructType = StructType(Seq(
    StructField("game", StringType),
    StructField("time", StringType),
    StructField("betting_text", StringType),
    StructField("lineups", MapType(StringType, MapType(StringType, StringType)))))

  def lineupGames(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(lineupGamesSchema).json(path)

  /** S5 — CSV scan with BOM tolerance and trim semantics
    * (`ctg_export_league.py:403-431`): header row, `utf-8-sig` handling,
    * trimmed cells, empty-named columns dropped.
    */
  def csvTable(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read
      .option("header", "true")
      .option("encoding", "UTF-8")
      .csv(path)
    // drop empty-named columns and Spark's auto-generated _c<N>
    // placeholders only — a legitimate header like "_category" survives
    val keep = df.columns.filter(c => c.trim.nonEmpty && !c.matches("_c\\d+"))
    val cleaned = keep.toIndexedSeq
      .map(c => trim(col(s"`$c`")).as(c.trim.stripPrefix("﻿")))
    df.select(cleaned: _*)
  }
}
