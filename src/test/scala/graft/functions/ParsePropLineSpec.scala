package graft.functions

import graft.SparkSpecBase
import graft.extract.Extract
import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

class ParsePropLineSpec extends SparkSpecBase {
  import spark.implicits._

  private val cases = Seq(
    "Over 25.5 -110 +105",
    "Under 8.5 +200 -240",
    "U 8.5 +200 -240",
    "O 27.5 -110",
    "o 12.5 +100 -120 -130", // lowercase standalone O, 3 odds
    "line with 33.5 only",
    "-150 odds but no line",
    "nothing at all",
    "")

  test("expression output is bit-identical to the builtin composition") {
    GraftExtensions.ensureRegistered(spark)
    val df = cases.toDF("t")
    val both = df
      .withColumn("pp", expr("graft_parse_prop_line(t)"))
      .withColumn("b_odds", Extract.extractOdds(col("t")))
      .withColumn("b_line", Extract.extractLineValue(col("t")))
      .withColumn("b_ou", Extract.assignOverUnder(col("t"), col("b_odds")))
    val mismatches = both.filter(
      !(col("pp.line") <=> col("b_line")) ||
        !(col("pp.over_odds") <=> col("b_ou.over_odds")) ||
        !(col("pp.under_odds") <=> col("b_ou.under_odds")) ||
        !(col("pp.odds") <=> col("b_odds")))
    assert(mismatches.count() == 0,
      mismatches.select("t", "pp", "b_line", "b_ou", "b_odds")
        .collect().mkString("\n"))
  }

  test("struct fields parse as expected on the canonical shapes") {
    GraftExtensions.ensureRegistered(spark)
    val r = Seq("Over 25.5 -110 +105").toDF("t")
      .select(expr("graft_parse_prop_line(t) AS pp"))
      .select("pp.*").head()
    assert(r.getDouble(0) == 25.5)
    assert(r.getString(1) == "-110" && r.getString(2) == "+105")
    assert(r.getSeq[String](3) == Seq("-110", "+105"))
    // null propagation
    val n = Seq(Option.empty[String]).toDF("t")
      .select(expr("graft_parse_prop_line(t)")).head()
    assert(n.isNullAt(0))
  }
}
