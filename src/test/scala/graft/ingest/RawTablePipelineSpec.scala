package graft.ingest

import graft.SparkSpecBase
import graft.clean.Clean
import org.apache.spark.sql.functions._

/** E2E ingest→normalize→clean slice for the scraped-table family
  * (SURVEY §3.2): raw_table fixture → header canonicalization + dedup →
  * repeated-header-row drop → guarded coercion → date/string repair.
  */
class RawTablePipelineSpec extends SparkSpecBase {

  private def fixture: String =
    getClass.getResource("/fixtures/raw_table.json").getPath

  test("raw_table: headers canonicalize, duplicates suffix, cells project") {
    val df = Readers.rawTable(spark, fixture, "roster")
    assert(df.columns.toSeq == Seq("team", "page", "tab", "row_idx",
      "Rk", "Player", "Pos", "Birth_Date", "Birth", "Totals PTS",
      "FG_pct", "FG_pct_1", "Unnamed", "Notes"))
    assert(df.count() == 5)
  }

  test("scraped headers colliding with metadata columns get suffixed") {
    val tmp = java.nio.file.Files.createTempFile("rawtable", ".json")
    java.nio.file.Files.writeString(tmp,
      """{"team":"BOS","page":"p","tab":"t","table_id":"x","row_idx":0,""" +
        """"headers":["Team","PTS"],"cells":["Boston","12"]}""")
    val df = Readers.rawTable(spark, tmp.toString, "x")
    assert(df.columns.toSeq ==
      Seq("team", "page", "tab", "row_idx", "Team_col", "PTS"))
    // unambiguous under case-insensitive resolution
    val r = df.select("team", "Team_col").head()
    assert(r.getString(0) == "BOS" && r.getString(1) == "Boston")
  }

  test("full cleaning lifecycle produces typed, repaired rows") {
    val raw = Readers.rawTable(spark, fixture, "roster")
    val cleaned = Clean.guardedNumericCoercion(
      Clean.dropRepeatedHeaderRows(raw),
      Seq("Rk", "Totals PTS", "FG_pct", "FG_pct_1", "Birth"))
      .withColumn("Birth_Date", Clean.reformatDateUs(col("Birth_Date")))
      .withColumn("Birth", Clean.repairCountry(col("Birth")))
      .orderBy("row_idx")

    // repeated header row dropped
    assert(cleaned.count() == 4)
    val types = cleaned.schema.map(f => f.name -> f.dataType.typeName).toMap
    // coercion kept where >= half castable, rolled back for Birth
    assert(types("Rk") == "double")
    assert(types("Totals PTS") == "double") // 3 of 4 castable
    assert(types("FG_pct") == "double")
    assert(types("FG_pct_1") == "double") // 3 of 4 castable
    assert(types("Birth") == "string") // 0 castable → stays string

    val rows = cleaned.select("row_idx", "Player", "Birth_Date", "Birth",
      "Totals PTS").collect()
    assert(rows(0).getAs[String]("Birth_Date") == "03/15/1995")
    assert(rows(0).getAs[String]("Birth") == "US")
    assert(rows(0).getAs[Double]("Totals PTS") == 1250.0)
    // garbage date → null; uncoercible cell → null under kept cast
    val gamma = rows(2)
    assert(gamma.getAs[String]("Player") == "Gamma Three")
    assert(gamma.isNullAt(gamma.fieldIndex("Birth_Date")))
    assert(gamma.isNullAt(gamma.fieldIndex("Totals PTS")))
    // 'ca CA' not a US repair target → unchanged
    assert(gamma.getAs[String]("Birth") == "ca CA")
  }
}
