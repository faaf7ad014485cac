package graft.extract

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Insight-card parse pipeline (SURVEY §3 lifecycle for
  * `nba_insights_scraper.py:350-516`): free-text cards → typed insight
  * rows, composing the F8-F13/F19 scalar extractors in one projection —
  * a single codegen'd pass over the text, no UDFs, no shuffles.
  */
object Insights {

  /** Parse a DataFrame with (card_idx, text, url) into the typed insight
    * shape. Every derivation is a pure column expression; unparseable
    * fields degrade to null/empty exactly like the reference's regex
    * fallbacks.
    */
  def parse(cards: DataFrame): DataFrame = {
    val m = Extract.extractMatchup(col("text"))
    cards
      .withColumn("m", m)
      .withColumn("player_name",
        // first line that classifies as a player name (ANSI-safe on
        // cards with none)
        try_element_at(
          filter(split(col("text"), "\n"),
            x => Extract.isPlayerName(trim(x))), lit(1)))
      .withColumn("game_time", Extract.extractGameTime(col("text")))
      .withColumn("po", Extract.parsePropOutcome(col("text")))
      .withColumn("prop_line",
        coalesce(col("po.prop_line"), Extract.extractLineValue(col("text"))))
      .withColumn("hit_rate_pct", Extract.extractHitRate(col("text")))
      .withColumn("sportsbook", Extract.detectSportsbook(col("text")))
      .withColumn("description", Extract.extractDescription(col("text")))
      .withColumn("id",
        Extract.md5Id(col("player_name"), col("m.matchup"),
          col("prop_line").cast("string")))
      .select(col("card_idx"), col("id"), col("player_name"),
        col("m.team").as("team"), col("m.opponent").as("opponent"),
        col("m.matchup").as("matchup"), col("game_time"),
        col("po.outcome").as("outcome"),
        col("prop_line"), col("po.prop_type").as("prop_type"),
        col("hit_rate_pct"), col("sportsbook"), col("description"),
        col("url"))
  }
}
