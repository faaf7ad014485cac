package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-22 plan evidence: writes `plans/r22/<name>_{before,after}.txt`
  * for the operator internals this optimization round restructured.
  * Several registered queries `localCheckpoint` their heavy relation
  * mid-op, so the top-level `explain` hides the part that changed —
  * this dumps the internal relation in BOTH formulations (the old one
  * is kept as a `*Windowed`/`*Legacy` helper referenced only by specs
  * and by this tool). Dev tooling like [[DumpPlans]]/[[Profile]]; not
  * part of the driver contract.
  */
object DumpR22 {
  private def write(name: String, df: DataFrame): Unit = {
    val p = java.nio.file.Paths.get(s"plans/r22/$name.txt")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    println(s"wrote $p")
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.TextAnalysis
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
    val isRef = col("lang") === "en"
    // t14/t15/st22 scoring core: the lag-window pair derivation vs the
    // array-adjacency rewrite (lmPairs). The window form shuffled and
    // sorted every token string per scoring pass.
    val (cab, ca, v) = TextAnalysis.lmTrain(docs, isRef)
    write("t14_lmscore_before",
      TextAnalysis.lmScorePairs(TextAnalysis.lmPairsWindowed(docs),
        cab, ca, v))
    write("t14_lmscore_after",
      TextAnalysis.lmScorePairs(TextAnalysis.lmPairs(docs), cab, ca, v))
    spark.stop()
  }
}
