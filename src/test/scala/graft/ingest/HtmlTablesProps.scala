package graft.ingest

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Generative round-trip contract for the HTML parser: ANY table we
  * render (escaped cell text, optional comment wrapping, optional
  * missing cells) must parse back to exactly the headers and rows we
  * rendered — the property that regex-based parsing most needs, since
  * hand-picked fixtures can't cover the text-content space.
  */
object HtmlTablesProps extends Properties("HtmlTables") {

  // cell alphabet deliberately includes the characters that must survive
  // escaping (&, <, >) plus digits/punctuation seen in stat cells
  private val cellChar: Gen[Char] = Gen.frequency(
    8 -> Gen.alphaNumChar,
    1 -> Gen.oneOf('&', '<', '>', '.', '%', '-', '\''),
    1 -> Gen.const(' '))

  private val cellText: Gen[String] = for {
    n <- Gen.choose(1, 12)
    cs <- Gen.listOfN(n, cellChar)
  } yield cs.mkString

  // header names: non-empty, no leading "unnamed" (flattenHeader drops
  // those by design), normalized later by the caller
  private val headerText: Gen[String] = for {
    n <- Gen.choose(1, 8)
    cs <- Gen.listOfN(n, Gen.alphaNumChar)
  } yield cs.mkString

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** What the parser is SPECIFIED to produce for a rendered cell:
    * whitespace collapsed/trimmed, empty → null.
    */
  private def expectCell(raw: String): String = {
    val t = raw.replaceAll("\\s+", " ").trim
    if (t.isEmpty) null else t
  }

  private case class Table(headers: List[String], rows: List[List[String]])

  private val tableGen: Gen[Table] = for {
    nCols <- Gen.choose(1, 6)
    headers <- Gen.listOfN(nCols, headerText)
    nRows <- Gen.choose(1, 8)
    rows <- Gen.listOfN(nRows, Gen.listOfN(nCols, cellText))
  } yield Table(headers, rows)

  private def render(t: Table): String = {
    val thead = t.headers.map(h => s"<th>${esc(h)}</th>").mkString
    val body = t.rows.map { r =>
      "<tr>" + r.map(c => s"<td>${esc(c)}</td>").mkString + "</tr>"
    }.mkString("\n")
    s"""<table id="t"><thead><tr>$thead</tr></thead><tbody>$body</tbody></table>"""
  }

  property("rendered table parses back to the same headers and rows") =
    forAll(tableGen) { t =>
      HtmlTables.extractAll(render(t)) match {
        case Seq(parsed) =>
          val headersOk = parsed.flatHeaders == t.headers.map(expectCell)
          val expected = t.rows.map(_.map(expectCell))
          val rowsOk = parsed.rows == expected
          Prop(headersOk && rowsOk) :| s"parsed=$parsed expected=$expected"
        case other => Prop(false) :| s"expected 1 table, got ${other.size}"
      }
    }

  property("comment wrapping preserves content and sets fromComment") =
    forAll(tableGen) { t =>
      val html = s"<div>x</div><!--\n${render(t)}\n-->"
      HtmlTables.extractAll(html) match {
        case Seq(parsed) =>
          Prop(parsed.fromComment &&
            parsed.rows == t.rows.map(_.map(expectCell))) :| s"parsed=$parsed"
        case other => Prop(false) :| s"expected 1 table, got ${other.size}"
      }
    }

  /** Rowspan round-trip: take any full grid, give cell (r,c) rowspan=k
    * and DELETE the covered cells from the next k-1 rows (that's what a
    * producer emitting rowspan does); the parser must reconstruct the
    * full grid, with (r,c)'s value carried into the deleted positions.
    */
  property("rowspan carry-down reconstructs the full grid") =
    forAll(for {
      t <- tableGen.suchThat(t => t.rows.size >= 2)
      r <- Gen.choose(0, t.rows.size - 2)
      c <- Gen.choose(0, t.headers.size - 1)
      k <- Gen.choose(2, t.rows.size - r)
    } yield (t, r, c, k)) { case (t, r, c, k) =>
      val thead = t.headers.map(h => s"<th>${esc(h)}</th>").mkString
      val body = t.rows.zipWithIndex.map { case (row, i) =>
        val cells = row.zipWithIndex.flatMap { case (v, j) =>
          if (i == r && j == c) Some(s"""<td rowspan="$k">${esc(v)}</td>""")
          else if (i > r && i < r + k && j == c) None // covered by the span
          else Some(s"<td>${esc(v)}</td>")
        }
        "<tr>" + cells.mkString + "</tr>"
      }.mkString("\n")
      val html =
        s"""<table id="t"><thead><tr>$thead</tr></thead><tbody>$body</tbody></table>"""
      val expected = t.rows.zipWithIndex.map { case (row, i) =>
        val filled =
          if (i > r && i < r + k) row.updated(c, t.rows(r)(c)) else row
        filled.map(expectCell)
      }
      HtmlTables.extractAll(html) match {
        case Seq(parsed) =>
          Prop(parsed.rows == expected) :| s"parsed=${parsed.rows} expected=$expected"
        case other => Prop(false) :| s"expected 1 table, got ${other.size}"
      }
    }

  /** Two independent rowspans in DIFFERENT columns, possibly
    * overlapping row ranges: the remainder list must interleave both
    * carries correctly with each row's own cells.
    */
  property("two concurrent rowspans in different columns both carry down") =
    forAll(for {
      t <- tableGen.suchThat(t => t.rows.size >= 3 && t.headers.size >= 2)
      c1 <- Gen.choose(0, t.headers.size - 1)
      c2 <- Gen.oneOf((0 until t.headers.size).filter(_ != c1))
      r1 <- Gen.choose(0, t.rows.size - 2)
      k1 <- Gen.choose(2, t.rows.size - r1)
      r2 <- Gen.choose(0, t.rows.size - 2)
      k2 <- Gen.choose(2, t.rows.size - r2)
    } yield (t, (r1, c1, k1), (r2, c2, k2))) {
      case (t, (r1, c1, k1), (r2, c2, k2)) =>
        def covered(r: Int, c: Int): Boolean =
          (c == c1 && r > r1 && r < r1 + k1) ||
            (c == c2 && r > r2 && r < r2 + k2)
        def spanAt(r: Int, c: Int): Option[Int] =
          if (r == r1 && c == c1) Some(k1)
          else if (r == r2 && c == c2) Some(k2)
          else None
        val thead = t.headers.map(h => s"<th>${esc(h)}</th>").mkString
        val body = t.rows.zipWithIndex.map { case (row, i) =>
          val cells = row.zipWithIndex.flatMap { case (v, j) =>
            if (covered(i, j)) None
            else spanAt(i, j) match {
              case Some(k) => Some(s"""<td rowspan="$k">${esc(v)}</td>""")
              case None => Some(s"<td>${esc(v)}</td>")
            }
          }
          "<tr>" + cells.mkString + "</tr>"
        }.mkString("\n")
        val html =
          s"""<table id="t"><thead><tr>$thead</tr></thead><tbody>$body</tbody></table>"""
        val expected = t.rows.zipWithIndex.map { case (row, i) =>
          row.zipWithIndex.map { case (v, j) =>
            val src =
              if (j == c1 && i > r1 && i < r1 + k1) t.rows(r1)(c1)
              else if (j == c2 && i > r2 && i < r2 + k2) t.rows(r2)(c2)
              else v
            expectCell(src)
          }
        }
        HtmlTables.extractAll(html) match {
          case Seq(parsed) =>
            Prop(parsed.rows == expected) :|
              s"parsed=${parsed.rows} expected=$expected"
          case other => Prop(false) :| s"expected 1 table, got ${other.size}"
        }
    }

  /** Nested-table parity: embed a complete rendered inner table inside a
    * random cell of an outer table. The parser must emit BOTH tables
    * (outer first — document order of opening tags), the outer's rows
    * must be exactly its own grid (the hosting cell keeps its own text,
    * nothing from the nested table leaks in or shifts columns), and the
    * inner must round-trip unchanged.
    */
  property("a nested table emits separately and never leaks into outer cells") =
    forAll(for {
      outer <- tableGen
      inner <- tableGen
      r <- Gen.choose(0, outer.rows.size - 1)
      c <- Gen.choose(0, outer.headers.size - 1)
    } yield (outer, inner, r, c)) { case (outer, inner, r, c) =>
      def renderWith(t: Table, id: String,
          embed: Option[(Int, Int, String)]): String = {
        val thead = t.headers.map(h => s"<th>${esc(h)}</th>").mkString
        val body = t.rows.zipWithIndex.map { case (row, i) =>
          "<tr>" + row.zipWithIndex.map { case (v, j) =>
            val extra = embed.collect { case (er, ec, m) if er == i && ec == j => m }
            s"<td>${esc(v)}${extra.getOrElse("")}</td>"
          }.mkString + "</tr>"
        }.mkString("\n")
        s"""<table id="$id"><thead><tr>$thead</tr></thead><tbody>$body</tbody></table>"""
      }
      val innerHtml = renderWith(inner, "inner", None)
      val html = renderWith(outer, "outer", Some((r, c, innerHtml)))
      HtmlTables.extractAll(html) match {
        case Seq(o, in) =>
          val orderOk = o.tableId == "outer" && in.tableId == "inner"
          val outerOk = o.rows == outer.rows.map(_.map(expectCell)) &&
            o.flatHeaders == outer.headers.map(expectCell)
          val innerOk = in.rows == inner.rows.map(_.map(expectCell))
          Prop(orderOk && outerOk && innerOk) :|
            s"outer=${o.rows} inner=${in.rows}"
        case other => Prop(false) :| s"expected 2 tables, got ${other.size}"
      }
    }

  property("visible and commented copies of the same table both surface, in order") =
    forAll(tableGen) { t =>
      val html = render(t) + "\n<!-- " + render(t) + " -->"
      val parsed = HtmlTables.extractAll(html)
      Prop(parsed.size == 2 &&
        !parsed(0).fromComment && parsed(1).fromComment &&
        parsed(0).rows == parsed(1).rows) :| s"parsed=$parsed"
    }
}
