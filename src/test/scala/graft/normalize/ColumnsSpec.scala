package graft.normalize

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class ColumnsSpec extends AnyFunSuite {

  test("flattenHeader joins non-empty parts, drops Unnamed placeholders") {
    assert(Columns.flattenHeader(Seq("Totals", "PTS")) == "Totals PTS")
    assert(Columns.flattenHeader(Seq("Unnamed: 0_level_0", "Player")) == "Player")
    assert(Columns.flattenHeader(Seq("", "  ")) == "Unnamed")
    assert(Columns.flattenHeader(Seq(" Advanced ", "WS/48")) == "Advanced WS/48")
  }

  test("flattenHeader collapses ONLY full-height identical tuples (rowspan shape)") {
    // a rowspan'd cell fills every level — collapses to one label
    assert(Columns.flattenHeader(Seq("Rk", "Rk")) == "Rk")
    assert(Columns.flattenHeader(Seq("Rk", "Rk", "Rk")) == "Rk")
    // identical after placeholder drop still counts as full-height
    assert(Columns.flattenHeader(Seq("Rk", "Unnamed: 1_level_1", "Rk")) == "Rk")
    // a PARTIAL repeat cannot come from a rowspan carry: keep all parts
    // (reference join-all semantics; r9 advice #1)
    assert(Columns.flattenHeader(Seq("Total", "Total", "PTS")) == "Total Total PTS")
    assert(Columns.flattenHeader(Seq("A", "B", "B")) == "A B B")
  }

  test("canonicalName maps known variants, longest first") {
    assert(Columns.canonicalName("FG%") == "FG_pct")
    assert(Columns.canonicalName("fg pct") == "FG_pct")
    assert(Columns.canonicalName("Effective Field Goal Percentage") == "eFG_pct")
    assert(Columns.canonicalName("WS/48") == "WS_per_48")
    assert(Columns.canonicalName("Birth Date") == "Birth_Date")
    // unmapped: % repaired, whitespace collapsed, otherwise untouched
    assert(Columns.canonicalName("Weird Col%") == "Weird Col_pct")
    assert(Columns.canonicalName("SomeRandomHeader") == "SomeRandomHeader")
  }

  test("dedupSuffix suffixes 2nd+ occurrences, handles cascade collisions") {
    assert(Columns.dedupSuffix(Seq("a", "b", "a", "a")) == Seq("a", "b", "a_1", "a_2"))
    // pre-existing a_1 forces the dup of `a` to skip to a_2
    assert(Columns.dedupSuffix(Seq("a", "a_1", "a")) == Seq("a", "a_1", "a_2"))
    assert(Columns.dedupSuffix(Nil) == Nil)
  }

  test("property: dedupSuffix output is always unique and same length") {
    val rnd = new Random(42)
    val pool = Seq("a", "b", "c", "a_1", "b_2", "")
    (1 to 200).foreach { _ =>
      val names = Seq.fill(rnd.nextInt(12))(pool(rnd.nextInt(pool.length)))
      val out = Columns.dedupSuffix(names)
      assert(out.length == names.length)
      assert(out.distinct.length == out.length, s"dup in $out from $names")
    }
  }

  test("property: canonical outputs are rename-stable (normalize∘normalize)") {
    Columns.canonicalMap.map(_._2).distinct.foreach { canon =>
      val again = Columns.canonicalName(canon)
      assert(again == canon || Columns.canonicalMap.exists(_._2 == again),
        s"canonical name $canon re-mapped to $again")
    }
  }
}
