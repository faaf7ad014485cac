package graft.clean

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row/value cleaning stage (SURVEY.md §2.2 P6-P11, §2.3 F1-F4).
  * Every function is a pure `DataFrame => DataFrame` or `Column => Column`
  * so stages compose with `df.transform(...)` and stay inside whole-stage
  * codegen.
  */
object Clean {

  /** Drop repeated mid-table header rows (`Player == "Player"`,
    * `Rk == "Rk"`): SURVEY P6, `unified_nba_scraper.py:179-183`.
    * Only applies to columns that exist, so one cleaner serves every
    * table family.
    */
  def dropRepeatedHeaderRows(df: DataFrame, keyCols: Seq[String] = Seq("Player", "Rk")): DataFrame =
    keyCols.filter(df.columns.contains).foldLeft(df) { (d, c) =>
      d.filter(col(c).isNull || col(c) =!= lit(c))
    }

  /** Per-column coercion statistics for the guarded numeric cast. */
  final case class CoercionStat(column: String, nonNull: Long, castable: Long) {
    /** pandas semantics: keep the cast if the column had no non-null
      * values at all, OR coerced non-nulls are at least half of the
      * original non-nulls (float division,
      * `unified_nba_scraper.py:199-204`:
      * `if orig_non_null == 0 or coerced_non_null >= orig_non_null / 2`).
      * The all-null branch matters: an empty/all-null column becomes
      * numeric in the reference, not string. */
    def coerce: Boolean = nonNull == 0L || castable.toDouble >= nonNull.toDouble / 2.0
  }

  /** Compute coercion stats for `cols` in ONE aggregate pass over `df`
    * (2×|cols| counters, map-side combined — a single scan at any scale,
    * not per-column scans). SURVEY F1.
    */
  def coercionStats(df: DataFrame, cols: Seq[String]): Seq[CoercionStat] = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__orig"),
        count(try_cast_double(col(c))).as(s"${c}__cast"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.map { c =>
      CoercionStat(c,
        row.getAs[Long](s"${c}__orig"),
        row.getAs[Long](s"${c}__cast"))
    }
  }

  /** Null-on-failure double cast (pandas `to_numeric(errors='coerce')`). */
  def try_cast_double(c: Column): Column = c.try_cast("double")

  /** Guarded numeric coercion: decide per column from global statistics,
    * then cast only the columns that pass the ≥½ guard. Two-pass driver
    * logic by design — a Catalyst rule cannot see data (SURVEY §4.2 #1).
    * The decision is global (one aggregate), never per-partition, so the
    * output schema is deterministic across any cluster layout.
    */
  def guardedNumericCoercion(df: DataFrame, candidateCols: Seq[String]): DataFrame = {
    val stats = coercionStats(df, candidateCols)
    stats.filter(_.coerce).foldLeft(df) { (d, s) =>
      d.withColumn(s.column, try_cast_double(col(s.column)))
    }
  }

  /** Date parse + US re-format, null on garbage: SURVEY F2,
    * `unified_nba_scraper.py:186-188`. */
  def reformatDateUs(c: Column): Column =
    date_format(c.try_cast("date"), "MM/dd/yyyy") // try_cast: null on garbage under ANSI

  /** String repair for the Roster "Birth" column ('us US'/'US US' → 'US'):
    * SURVEY F3, `unified_nba_scraper.py:189-192`. */
  def repairCountry(c: Column): Column =
    trim(regexp_replace(c, "(?i)\\bus\\s+US\\b", "US"))

  /** Whitespace normalize: SURVEY F4, `DEFENSEVSPOSTION.PY:155-156`. */
  def normWs(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** Keyword+length predicate: SURVEY P8, `run_scraper.py:97-101`. */
  def keywordLengthFilter(df: DataFrame, textCol: String, minLen: Int,
      maxLen: Int, keywordPattern: String): DataFrame =
    df.filter(length(col(textCol)) > minLen &&
      length(col(textCol)) < maxLen &&
      col(textCol).rlike(keywordPattern))

  /** Pattern-exclusion filter (live-game drop): SURVEY P7,
    * `nba_props_scraper.py:266-270`. */
  def excludePattern(df: DataFrame, textCol: String, pattern: String): DataFrame =
    df.filter(!col(textCol).rlike(pattern))
}
