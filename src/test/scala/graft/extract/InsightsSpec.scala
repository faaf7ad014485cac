package graft.extract

import graft.SparkSpecBase

class InsightsSpec extends SparkSpecBase {
  import spark.implicits._

  private val card1 =
    """Jayson Tatum
      |BOS @ LAL Today 7:30 PM
      |Under 27.5 Points
      |has exceeded 25 points in 8 of last 10 games
      |hit in 80% of last games
      |-135 on DraftKings""".stripMargin

  private val card2 =
    """no player here
      |just noise 12%""".stripMargin

  test("insight cards parse into the typed contract") {
    val out = Insights.parse(Seq((0L, card1, "u1"), (1L, card2, "u2"))
        .toDF("card_idx", "text", "url"))
      .orderBy("card_idx").collect()

    val r = out(0)
    assert(r.getAs[String]("player_name") == "Jayson Tatum")
    assert(r.getAs[String]("team") == "BOS")
    assert(r.getAs[String]("opponent") == "LAL")
    assert(r.getAs[String]("matchup") == "BOS @ LAL")
    assert(r.getAs[String]("game_time") == "Today 7:30 PM")
    assert(r.getAs[Double]("prop_line") == 27.5)
    assert(r.getAs[String]("outcome") == "Under")
    assert(r.getAs[String]("prop_type") == "Points")
    assert(r.getAs[String]("description")
      .startsWith("has exceeded 25 points"))
    assert(r.getAs[Int]("hit_rate_pct") == 80)
    assert(r.getAs[String]("sportsbook") == "DraftKings")
    assert(r.getAs[String]("id").matches("[0-9a-f]{12}"))

    // degraded card: fields null/empty, no exception
    val n = out(1)
    assert(n.isNullAt(n.fieldIndex("player_name")))
    assert(n.getAs[String]("matchup") == "")
    assert(n.getAs[Int]("hit_rate_pct") == 12)
    assert(n.isNullAt(n.fieldIndex("sportsbook")))
  }

  test("id is deterministic across runs") {
    val df = Seq((0L, card1, "u1")).toDF("card_idx", "text", "url")
    val a = Insights.parse(df).select("id").head().getString(0)
    val b = Insights.parse(df).select("id").head().getString(0)
    assert(a == b)
  }
}
