package graft.extract

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class LineupsSpec extends SparkSpecBase {
  import spark.implicits._

  private def fixture = Seq(
    ("CLE @ NYK", "7:30 PM", "CLE by 3.5 o/u 224.5",
      Map(
        "CLE" -> Map("PG" -> "Guard  One", "SG" -> "Guard Two",
          "SF" -> "Wing One", "PF" -> "Big One", "C" -> "Center One"),
        "NYK" -> Map("PG" -> "Guard Three", "SG" -> "Guard Four",
          "SF" -> "Wing Two", "PF" -> "Big Two", "C" -> "Center Two"))),
    ("BOS @ MIA", "10:00 PM", "BOS by 7 o/u 210",
      Map(
        "BOS" -> Map("PG" -> "Guard Five", "SG" -> "Guard Six",
          "SF" -> "Wing Three", "PF" -> "Big Three", "C" -> "Center Three"),
        // MIA deliberately missing the C slot
        "MIA" -> Map("PG" -> "Guard Seven", "SG" -> "Guard Eight",
          "SF" -> "Wing Four", "PF" -> "Big Four"))),
  ).toDF("game", "time", "betting_text", "lineups")

  test("nested lineup maps explode to typed relational slots") {
    val slots = Lineups.explodeSlots(fixture)
    assert(slots.count() == 19)
    val r = slots.filter(col("team") === "CLE" && col("pos") === "PG").head()
    assert(r.getAs[String]("player") == "Guard One") // whitespace normalized
    val b = r.getAs[org.apache.spark.sql.Row]("betting")
    assert(b.getAs[String]("favorite") == "CLE")
    assert(b.getAs[Double]("spread") == 3.5)
    assert(b.getAs[Double]("over_under") == 224.5)
    // typed form
    val ds = slots.select("game", "team", "pos", "player")
      .as[graft.model.LineupSlot]
    assert(ds.count() == 19)
  }

  test("incomplete lineups are detected (5-slot contract)") {
    val bad = Lineups.incompleteLineups(Lineups.explodeSlots(fixture)).collect()
    assert(bad.length == 1)
    assert(bad.head.getAs[String]("team") == "MIA" &&
      bad.head.getAs[Long]("n_pos") == 4)
  }
}
