package graft.queries

import graft.SparkSpecBase

/** Golden contract for the p1 header-normalization decision table: the
  * exact final schema each fixture table must get, plus the structural
  * invariants the oracle comparison alone would not explain (uniqueness
  * per table, and the documented no-presuffixed-collision constraint
  * that keeps the SQL occurrence-counter window equivalent to
  * [[graft.normalize.Columns.dedupSuffix]]'s retry loop).
  */
class NormalizeQuerySpec extends SparkSpecBase {

  private lazy val rows = Normalize.p1HeaderNormalize(spark, sf)
    .collect()
    .map(r => (r.getString(0), r.getInt(1), r.getString(4), r.getString(5), r.getString(6)))

  private def finals(table: String): Seq[String] =
    rows.filter(_._1 == table).sortBy(_._2).map(_._5).toSeq

  test("golden final schemas per fixture table") {
    assert(finals("box") == Seq("Player", "Team_col", "FG_pct", "eFG_pct",
      "FT_pct", "PTS_per_G", "WS_per_48", "USG_pct"))
    assert(finals("dup") == Seq("Player", "FG_pct", "FG_pct_1", "FG_pct_2",
      "Unnamed", "Unnamed_1", "eFG_pct", "FG3_pct", "Turnover _pct",
      "row_idx_col"))
    assert(finals("msc") == Seq("Team_col", "Tab_col", "FG3M", "Birth_Date",
      "True Shooting _pct", "MP", "MP_1"))
  }

  test("final names are unique per table (the P3 contract)") {
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val fs = rs.map(_._5)
      assert(fs.distinct.length == fs.length, s"duplicate final names in $t")
    }
  }

  test("fixture respects the no-presuffixed-collision constraint") {
    // If a canonical name itself looks like an earlier name plus _N, the
    // SQL window and dedupSuffix diverge -- the fixture must never enter
    // that regime (the retry loop is ColumnsSpec's job).
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val canons = rs.map(_._4)
      canons.foreach { c =>
        val m = "^(.*)_(\\d+)$".r.findFirstMatchIn(c)
        m.foreach { mm =>
          assert(!canons.contains(mm.group(1)),
            s"fixture canonical '$c' collides with base '${mm.group(1)}'")
        }
      }
    }
  }
}
