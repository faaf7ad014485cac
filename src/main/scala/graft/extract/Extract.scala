package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Regex/scalar derivation library (SURVEY.md §2.3 F5-F22) and the
  * stateful page-text line scan (S7 + W1).
  *
  * Everything here is built from codegen'd `functions._` expressions — no
  * UDFs — so the chains stay inside whole-stage codegen and distribute
  * trivially.
  */
object Extract {

  /** American-odds extraction, e.g. "-110", "+1050": SURVEY F5,
    * `nba_props_scraper.py:504-506`. */
  def extractOdds(c: Column): Column =
    regexp_extract_all(c, lit("[+-]\\d{3,4}"), lit(0))

  /** Prop line value: `[OU] 25.5` with standalone `\d+.5` fallback:
    * SURVEY F6, `nba_props_scraper.py:745-754`. */
  def extractLineValue(c: Column): Column = {
    val primary = regexp_extract(c, "(?i)[OU]\\s*(\\d+\\.?\\d*)", 1)
    val fallback = regexp_extract(c, "\\b(\\d+\\.5)\\b", 1)
    when(primary =!= "", primary).otherwise(
      when(fallback =!= "", fallback).otherwise(lit(null)))
      .cast("double")
  }

  /** Over/under odds assignment from context keywords: SURVEY F7,
    * `nba_props_scraper.py:760-768`. Returns struct(over_odds, under_odds).
    */
  def assignOverUnder(line: Column, odds: Column): Column = {
    val lower_ = lower(line)
    // try_element_at: ANSI-safe — arrays may have 0/1 odds entries
    val first = try_element_at(odds, lit(1))
    val second = try_element_at(odds, lit(2))
    val overFirst = lower_.contains("over") || lower_.rlike("^o\\b|\\bo\\s*\\d")
    struct(
      when(overFirst, first).otherwise(second).as("over_odds"),
      when(overFirst, second).otherwise(first).as("under_odds"))
  }

  /** Matchup `ABC @ XYZ` extraction: SURVEY F8,
    * `nba_insights_scraper.py:396-404`. Returns struct(team, opponent,
    * matchup).
    *
    * `[@vs]+` is a character CLASS (any run of @, v, s), reproduced
    * verbatim from the reference — which means uppercase "VS" does not
    * match there either. Kept bug-compatible on purpose; a cleaner
    * separator would be `(?:@|vs?\.?)` case-insensitive. */
  def extractMatchup(c: Column): Column = {
    val pat = "([A-Z]{3})\\s*[@vs]+\\s*([A-Z]{3})"
    val t = regexp_extract(c, pat, 1)
    val o = regexp_extract(c, pat, 2)
    struct(t.as("team"), o.as("opponent"),
      when(t =!= "", concat(t, lit(" @ "), o)).otherwise(lit("")).as("matchup"))
  }

  /** Game-time: first of several datetime shapes: SURVEY F9,
    * `nba_insights_scraper.py:406-417`. */
  def extractGameTime(c: Column): Column = {
    def nz(x: Column) = when(x =!= "", x).otherwise(lit(null))
    coalesce(
      nz(regexp_extract(c, "(?i)((?:Today|Tomorrow)\\s+\\d{1,2}:\\d{2}\\s*[AP]M)", 1)),
      nz(regexp_extract(c, "(\\d{1,2}/\\d{1,2}\\s+\\d{1,2}:\\d{2}\\s*[AP]M)", 1)),
      nz(regexp_extract(c, "(?i)((?:Mon|Tue|Wed|Thu|Fri|Sat|Sun)[a-z]*\\s+\\d{1,2}:\\d{2}\\s*[AP]M)", 1)),
      nz(regexp_extract(c, "(\\d{1,2}:\\d{2}\\s*[AP]M)", 1)))
  }

  /** Insight description: SURVEY F10, `nba_insights_scraper.py:419-442`.
    * First a performance-pattern sentence ("has failed/exceeded … games"),
    * else the first line mentioning a stat keyword, else empty.
    */
  def extractDescription(c: Column): Column = {
    val perf = regexp_extract(c,
      "(?i)((?:has|have) (?:failed|exceeded|hit|missed|reached)[^.\\n]{0,80})", 1)
    val keywordLine = try_element_at(
      filter(split(c, "\\n"),
        x => x.rlike("(?i)(points|rebounds|assists|threes|steals|blocks)")),
      lit(1))
    when(perf =!= "", perf).otherwise(coalesce(trim(keywordLine), lit("")))
  }

  /** Prop outcome/line/type parse: SURVEY F11,
    * `nba_insights_scraper.py:444-464`. Three alternative patterns,
    * first match wins; returns struct(outcome, prop_line, prop_type).
    */
  def parsePropOutcome(c: Column): Column = {
    // "Under 3.5 Three Pointers" | "Over 27.5 Points"
    val p1 = "(?i)\\b(Over|Under)\\s+(\\d+\\.?\\d*)\\s+([A-Za-z][A-Za-z ]{2,30})"
    // "25+ points" style
    val p2 = "(?i)\\b(\\d+)\\+\\s+([A-Za-z][A-Za-z ]{2,30})"
    // "to record 10 rebounds"
    val p3 = "(?i)to record\\s+(\\d+\\.?\\d*)\\s+([A-Za-z][A-Za-z ]{2,30})"
    val m1 = regexp_extract(c, p1, 1)
    struct(
      when(m1 =!= "", initcap(m1))
        .when(regexp_extract(c, p2, 1) =!= "", lit("Over"))
        .when(regexp_extract(c, p3, 1) =!= "", lit("Over"))
        .otherwise(lit(null)).as("outcome"),
      coalesce(
        when(regexp_extract(c, p1, 2) =!= "", regexp_extract(c, p1, 2)),
        when(regexp_extract(c, p2, 1) =!= "", regexp_extract(c, p2, 1)),
        when(regexp_extract(c, p3, 1) =!= "", regexp_extract(c, p3, 1)))
        .try_cast("double").as("prop_line"),
      coalesce(
        when(regexp_extract(c, p1, 3) =!= "", trim(regexp_extract(c, p1, 3))),
        when(regexp_extract(c, p2, 2) =!= "", trim(regexp_extract(c, p2, 2))),
        when(regexp_extract(c, p3, 2) =!= "", trim(regexp_extract(c, p3, 2))))
        .as("prop_type"))
  }

  /** Hit-rate percentage → int: SURVEY F12, `nba_insights_scraper.py:466-471`. */
  def extractHitRate(c: Column): Column =
    when(regexp_extract(c, "(\\d{1,3})\\s*%", 1) =!= "",
      regexp_extract(c, "(\\d{1,3})\\s*%", 1).cast("int"))

  /** First known sportsbook contained in the text: SURVEY F13,
    * `nba_insights_scraper.py:480-484`. */
  val sportsbooks: Seq[String] = Seq("DraftKings", "FanDuel", "BetMGM",
    "Caesars", "ESPN BET", "Hard Rock", "bet365", "Pinnacle")

  def detectSportsbook(c: Column): Column =
    coalesce(sportsbooks.map(b =>
      when(lower(c).contains(b.toLowerCase), lit(b))) :+ lit(null): _*)

  /** Player-name classifier: 2-4 capitalized words, name charset, not a
    * stop word: SURVEY F14, `nba_props_scraper.py:707-731`. */
  val nameStopWords: Seq[String] = Seq("points", "rebounds", "assists",
    "over", "under", "total", "spread", "moneyline", "live", "quarter",
    "half time", "player props", "same game parlay")

  def isPlayerName(c: Column): Column =
    c.rlike("^([A-Z][A-Za-z.'-]+ ){1,3}[A-Z][A-Za-z.'-]+$") &&
      !lower(c).isin(nameStopWords: _*)

  /** Strip trailing `(14-15)` record suffix: SURVEY F17,
    * `DEFENSEVSPOSTION.PY:171-172`. */
  def stripRecordSuffix(c: Column): Column =
    regexp_replace(c, "\\s*\\([^)]*\\)\\s*$", "")

  /** Filename sanitization chain: SURVEY F18, `nba_props_scraper.py:862-872`. */
  def sanitizeFilename(c: Column, maxLen: Int = 80): Column =
    substring(
      regexp_replace(
        regexp_replace(
          regexp_replace(c, "[<>:\"/\\\\|?*]", ""),
          "[\\s\\-@]+", "_"),
        "_+", "_"),
      1, maxLen)

  /** Truncation guard: cap text at `maxLen` chars before it is stored or
    * serialized: SURVEY F20, `nba_props_scraper.py:225,494,418`
    * (`raw_text[:200]`, `raw_text[:500]`, `page_snapshot[:5000]`) —
    * scraped free text is unbounded, every persisted copy is capped. */
  def truncateGuard(c: Column, maxLen: Int): Column =
    substring(c, 1, maxLen)

  /** md5 surrogate id (12 hex chars): SURVEY F19,
    * `nba_insights_scraper.py:509-510`. */
  def md5Id(cols: Column*): Column =
    substring(md5(concat_ws("_", cols: _*)), 1, 12)

  /** Spread/total parse `('CLE by 3.5', 'o/u 224.5')`: SURVEY F21,
    * `lineup_scraper.py:71-78`. Returns struct(favorite, spread,
    * over_under). */
  def parseSpreadTotal(c: Column): Column =
    struct(
      regexp_extract(c, "([A-Z]{3})\\s+by\\s+(\\d+\\.?\\d*)", 1).as("favorite"),
      regexp_extract(c, "([A-Z]{3})\\s+by\\s+(\\d+\\.?\\d*)", 2).try_cast("double").as("spread"),
      regexp_extract(c, "(?i)o/u\\s*(\\d+\\.?\\d*)", 1).try_cast("double").as("over_under"))

  /** Stateful page-text scan (SURVEY S7 + W1): one text blob per match →
    * one row per line with the most recent player-name line and prop-type
    * header carried forward onto subsequent odds lines.
    *
    * Spark-first shape: `split` + `posexplode` fans the blob out into
    * distributed rows; the carried state is `last(_, ignoreNulls)` over an
    * ordered window partitioned by the blob key — no driver-side loop, and
    * each blob's window is independent so the stage scales with the number
    * of blobs.
    */
  def lineScan(df: DataFrame, keyCol: String, textCol: String,
      propTypes: Seq[String] = Seq("Points", "Rebounds", "Assists",
        "Threes", "Steals", "Blocks")): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(df.sparkSession)
    val lines = df.select(col(keyCol),
        posexplode(split(col(textCol), "\\n")).as(Seq("line_no", "line")))
      .withColumn("line", trim(col("line")))
      .filter(length(col("line")) >= 3) // SURVEY P10 short-text skip
    val w = Window.partitionBy(col(keyCol)).orderBy(col("line_no"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lines
      .withColumn("player",
        last(when(isPlayerName(col("line")), col("line")), ignoreNulls = true).over(w))
      .withColumn("prop_type",
        last(when(col("line").isin(propTypes: _*), col("line")), ignoreNulls = true).over(w))
      // one-pass native parse (bit-identical to the F5-F7 builtins)
      .withColumn("pp", expr("graft_parse_prop_line(line)"))
      .filter(size(col("pp.odds")) > 0 && col("pp.line").isNotNull &&
        col("player").isNotNull && col("prop_type").isNotNull)
      .select(col(keyCol), col("line_no"), col("player"), col("prop_type"),
        col("pp.line").as("line"),
        col("pp.over_odds").as("over_odds"),
        col("pp.under_odds").as("under_odds"),
        col("pp.odds").as("odds"))
  }
}
