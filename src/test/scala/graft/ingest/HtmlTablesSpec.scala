package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Parser contract for the S1/S2 HTML front end: the extraction
  * semantics the reference gets from BeautifulSoup + pandas read_html
  * (`unified_nba_scraper.py:246-281`), pinned case by case.
  */
class HtmlTablesSpec extends AnyFunSuite {

  private def page: String = {
    val p = getClass.getResource("/fixtures/team_page.html").getPath
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  test("visible tables come first, comment tables after, document order") {
    val ids = HtmlTables.extractAll(page).map(_.tableId)
    assert(ids == Seq("Roster", "Unidentified_Table_1", "Per_100", "Shooting"))
  }

  test("comment flag set exactly on comment-embedded tables") {
    val byId = HtmlTables.extractAll(page).map(t => t.tableId -> t.fromComment).toMap
    assert(byId == Map("Roster" -> false, "Unidentified_Table_1" -> false,
      "Per_100" -> true, "Shooting" -> true))
  }

  test("friendly-name cascade: map hit, raw id, positional fallback") {
    // map hit: per_poss -> Per_100 (and roster -> Roster) seen above;
    // raw id (not in map) and fallback on a synthetic page:
    val html =
      """<table id="weird_custom"><tr><th>A</th></tr><tr><td>1</td></tr></table>
        |<table><tr><th>B</th></tr><tr><td>2</td></tr></table>""".stripMargin
    val ids = HtmlTables.extractAll(html).map(_.tableId)
    assert(ids == Seq("weird_custom", "Unidentified_Table_1"))
  }

  test("a comment without a table contributes nothing") {
    val html =
      """<!-- just nav text --><table id="t"><tr><th>A</th></tr>
        |<tr><td>x</td></tr></table>""".stripMargin
    assert(HtmlTables.extractAll(html).map(_.tableId) == Seq("t"))
  }

  test("two-row thead with colspan expands to MultiIndex parts") {
    val per = HtmlTables.extractAll(page).find(_.tableId == "Per_100").get
    assert(per.headerParts == Seq(
      Seq("", "Rk"), Seq("", "Player"),
      Seq("Offense", "PTS"), Seq("Offense", "FG%"),
      Seq("Defense", "PTS"), Seq("Defense", "FG%")))
    assert(per.flatHeaders == Seq("Rk", "Player",
      "Offense PTS", "Offense FG%", "Defense PTS", "Defense FG%"))
  }

  test("mid-tbody repeated header row is kept as a data row (pandas parity)") {
    val per = HtmlTables.extractAll(page).find(_.tableId == "Per_100").get
    assert(per.rows(1) == Seq("Rk", "Player", "PTS", "FG%", "PTS", "FG%"))
    assert(per.rows.size == 4)
  }

  test("cell text: tags stripped, entities decoded, whitespace collapsed, empty -> null") {
    val roster = HtmlTables.extractAll(page).find(_.tableId == "Roster").get
    val players = roster.rows.map(_(1))
    assert(players == Seq("Jayson Tatum", "Jaylen Brown",
      "Kristaps Porziņģis", "Texas A&M Guy"))
    assert(roster.rows(3)(5) == "Texas A&M")        // &amp; in a td
    assert(roster.rows(2)(5) == null)               // &nbsp;-only cell
  }

  test("short body rows null-pad to header width") {
    val shooting = HtmlTables.extractAll(page).find(_.tableId == "Shooting").get
    assert(shooting.rows(1) == Seq("Jaylen Brown", "77", null))
  }

  test("headerless table: leading all-th row becomes the header") {
    val notes = HtmlTables.extractAll(page)
      .find(_.tableId == "Unidentified_Table_1").get
    assert(notes.flatHeaders == Seq("Note", "Value"))
    assert(notes.rows == Seq(Seq("Arena", "TD Garden"),
      Seq("Record", "64–18")))               // &ndash; decoded
  }

  test("numeric and hex character references decode") {
    assert(HtmlTables.decodeEntities("&#65;&#x42;&amp;&unknown;") == "AB&&unknown;")
  }

  test("adjacent inline tags join with no separator (get_text parity)") {
    assert(HtmlTables.cellText("Porzi<b>ņģis</b>") == "Porziņģis")
    assert(HtmlTables.cellText("<a href='x'>Jayson</a> <em>Tatum</em>") == "Jayson Tatum")
    assert(HtmlTables.cellText("A<br/>B") == "AB") // literal BS4 behavior
  }

  test("body rowspan carries the cell value down (read_html parity)") {
    val html =
      """<table id="r"><thead><tr><th>Team</th><th>Player</th></tr></thead>
        |<tbody>
        |<tr><td rowspan="2">BOS</td><td>Tatum</td></tr>
        |<tr><td>Brown</td></tr>
        |<tr><td>LAL</td><td>James</td></tr>
        |</tbody></table>""".stripMargin
    val t = HtmlTables.extractAll(html).head
    assert(t.rows == Seq(
      Seq("BOS", "Tatum"), Seq("BOS", "Brown"), Seq("LAL", "James")))
  }

  test("thead rowspan fills every level of its column's tuple") {
    val html =
      """<table id="h"><thead>
        |<tr><th rowspan="2">Rk</th><th colspan="2">Offense</th></tr>
        |<tr><th>PTS</th><th>FG%</th></tr>
        |</thead><tbody><tr><td>1</td><td>30</td><td>.5</td></tr></tbody></table>"""
        .stripMargin
    val t = HtmlTables.extractAll(html).head
    assert(t.headerParts == Seq(
      Seq("Rk", "Rk"), Seq("Offense", "PTS"), Seq("Offense", "FG%")))
    assert(t.flatHeaders == Seq("Rk", "Offense PTS", "Offense FG%"))
  }

  test("rowspan+colspan on one cell blocks out its full rectangle") {
    val html =
      """<table id="rc"><tbody>
        |<tr><td rowspan="2" colspan="2">X</td><td>a</td></tr>
        |<tr><td>b</td></tr>
        |<tr><td>p</td><td>q</td><td>r</td></tr>
        |</tbody></table>""".stripMargin
    val t = HtmlTables.extractAll(html).head
    assert(t.rows == Seq(
      Seq("X", "X", "a"), Seq("X", "X", "b"), Seq("p", "q", "r")))
  }

  test("body rows wider than the header widen the table with col_i names") {
    val html =
      """<table id="w"><thead><tr><th>A</th></tr></thead>
        |<tbody><tr><td>1</td><td>2</td></tr><tr><td>3</td></tr></tbody></table>"""
        .stripMargin
    val t = HtmlTables.extractAll(html).head
    assert(t.flatHeaders == Seq("A", "col_1"))
    assert(t.rows == Seq(Seq("1", "2"), Seq("3", null)))
  }

  test("nested tables emit as separate frames; outer cells exclude nested content") {
    val html =
      """<table id="outer"><tr><td>before
        |<table id="inner"><tr><td>x</td><td>y</td></tr></table>
        |after</td><td>plain</td></tr></table>""".stripMargin
    val ts = HtmlTables.extractAll(html)
    assert(ts.map(_.tableId) == Seq("outer", "inner"))
    // outer keeps its own text around the widget table, nothing from it
    assert(ts(0).rows == Seq(Seq("before after", "plain")))
    assert(ts(1).rows == Seq(Seq("x", "y")))
  }

  test("doubly nested tables all surface, document order, each with own rows") {
    val html =
      """<table id="a"><tr><td>A
        |<table id="b"><tr><td>B
        |<table id="c"><tr><td>C</td></tr></table>
        |</td></tr></table>
        |</td></tr></table>""".stripMargin
    val ts = HtmlTables.extractAll(html)
    assert(ts.map(_.tableId) == Seq("a", "b", "c"))
    assert(ts.map(_.rows) == Seq(
      Seq(Seq("A")), Seq(Seq("B")), Seq(Seq("C"))))
  }

  test("nested table inside a commented table surfaces with fromComment set") {
    val html =
      """<p>x</p><!-- <table id="outer"><tr><td>o
        |<table id="inner"><tr><td>i</td></tr></table>
        |</td></tr></table> -->""".stripMargin
    val ts = HtmlTables.extractAll(html)
    assert(ts.map(_.tableId) == Seq("outer", "inner"))
    assert(ts.forall(_.fromComment))
    assert(ts.map(_.rows) == Seq(Seq(Seq("o")), Seq(Seq("i"))))
  }

  test("an unclosed table is dropped; its closed siblings still parse") {
    val html =
      """<table id="closed"><tr><td>ok</td></tr></table>
        |<table id="unclosed"><tr><td>gone</td></tr>""".stripMargin
    val ts = HtmlTables.extractAll(html)
    assert(ts.map(_.tableId) == Seq("closed"))
  }

  test("empty-bodied tables are dropped like the reference's len(df)<1 skip") {
    val html = """<table id="empty"><tr><th>A</th></tr></table>"""
    assert(HtmlTables.extractAll(html).isEmpty)
  }
}
