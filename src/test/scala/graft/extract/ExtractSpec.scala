package graft.extract

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ExtractSpec extends SparkSpecBase {
  import spark.implicits._

  test("odds / line-value / over-under extraction") {
    val df = Seq("Over 25.5 -110 +105", "U 8.5 +200 -240", "nothing here").toDF("t")
    val r = df.select(
      Extract.extractOdds($"t").as("odds"),
      Extract.extractLineValue($"t").as("line")).collect()
    assert(r(0).getSeq[String](0) == Seq("-110", "+105"))
    assert(r(0).getDouble(1) == 25.5)
    assert(r(1).getSeq[String](0) == Seq("+200", "-240"))
    assert(r(1).getDouble(1) == 8.5)
    assert(r(2).getSeq[String](0).isEmpty && r(2).isNullAt(1))

    val ou = df.limit(2).select(
      Extract.assignOverUnder($"t", Extract.extractOdds($"t")).as("ou")).collect()
    assert(ou(0).getStruct(0).getString(0) == "-110") // "Over ..." → first odds = over
    assert(ou(1).getStruct(0).getString(1) == "+200") // "U ..." → first odds = under
  }

  test("matchup, game time, hit rate, sportsbook, spread/total") {
    val r = Seq("BOS @ LAL Today 7:30 PM on DraftKings, hit 80% — CLE by 3.5 o/u 224.5")
      .toDF("t").select(
        Extract.extractMatchup($"t").as("m"),
        Extract.extractGameTime($"t").as("gt"),
        Extract.extractHitRate($"t").as("hr"),
        Extract.detectSportsbook($"t").as("book"),
        Extract.parseSpreadTotal($"t").as("st")).head()
    val m = r.getStruct(0)
    assert(m.getString(0) == "BOS" && m.getString(1) == "LAL" && m.getString(2) == "BOS @ LAL")
    assert(r.getString(1) == "Today 7:30 PM")
    assert(r.getInt(2) == 80)
    assert(r.getString(3) == "DraftKings")
    val st = r.getStruct(4)
    assert(st.getString(0) == "CLE" && st.getDouble(1) == 3.5 && st.getDouble(2) == 224.5)
  }

  test("player-name classifier") {
    val names = Seq("LeBron James", "Shai Gilgeous-Alexander", "De'Aaron Fox",
      "Player Props", "points", "lowercase name", "X")
    val r = names.toDF("t").select($"t", Extract.isPlayerName($"t").as("ok"))
      .collect().map(x => x.getString(0) -> x.getBoolean(1)).toMap
    assert(r("LeBron James") && r("Shai Gilgeous-Alexander") && r("De'Aaron Fox"))
    assert(!r("Player Props") && !r("points") && !r("lowercase name") && !r("X"))
  }

  test("record suffix strip, filename sanitize, md5 id") {
    val r = Seq(("Boston Celtics (14-15)", "a b-c@d/e?*")).toDF("a", "b").select(
      Extract.stripRecordSuffix($"a").as("a"),
      Extract.sanitizeFilename($"b").as("b"),
      Extract.md5Id($"a", $"b").as("id")).head()
    assert(r.getString(0) == "Boston Celtics")
    assert(r.getString(1) == "a_b_c_de") // /?* stripped, then [ -@]+ → _
    assert(r.getString(2).length == 12 && r.getString(2).matches("[0-9a-f]{12}"))
  }

  test("lineScan carries player + prop type forward onto odds lines") {
    val blob =
      """LeBron James
        |Points
        |O 25.5 -110
        |U 25.5 -105
        |Rebounds
        |O 8.5 +100
        |Stephen Curry
        |Points
        |O 28.5 -120""".stripMargin
    val df = Seq(("g1", blob)).toDF("game", "text")
    val out = Extract.lineScan(df, "game", "text")
      .orderBy("line_no")
      .select("player", "prop_type", "line", "over_odds")
      .collect()
    assert(out.length == 4)
    assert(out(0).getString(0) == "LeBron James" && out(0).getString(1) == "Points"
      && out(0).getDouble(2) == 25.5 && out(0).getString(3) == "-110")
    assert(out(2).getString(0) == "LeBron James" && out(2).getString(1) == "Rebounds")
    assert(out(3).getString(0) == "Stephen Curry" && out(3).getString(1) == "Points"
      && out(3).getDouble(2) == 28.5)
  }
}
