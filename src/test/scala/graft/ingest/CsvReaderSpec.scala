package graft.ingest

import graft.SparkSpecBase

/** S5 — CSV scan semantics: BOM on the first header, padded headers and
  * cells trimmed, empty-named columns dropped
  * (`ctg_export_league.py:403-431`).
  */
class CsvReaderSpec extends SparkSpecBase {

  test("csvTable: BOM stripped, headers/cells trimmed, empty columns dropped") {
    val path = getClass.getResource("/fixtures/league.csv").getPath
    val df = Readers.csvTable(spark, path)
    assert(df.columns.toSeq == Seq("Player", "Team", "PTS"))
    val rows = df.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(0)).toSeq == Seq("Alpha One", "Beta Two"))
    assert(rows.map(_.getString(1)).toSeq == Seq("BOS", "NYK"))
    assert(rows.map(_.getString(2)).toSeq == Seq("21.5", "18.0"))
  }
}
