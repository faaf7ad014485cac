package graft.ingest

import graft.SparkSpecBase
import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField}

/** Pins the i9 schema-evolution contract: the footer-discovering read
  * (`mergeSchema`) and the metastore-style explicit-schema read agree
  * row-for-row, legacy files surface NULL for the evolved column, and
  * a schema-BLIND read silently drops it (why the option/schema must
  * be deliberate).
  */
class SchemaEvolutionSpec extends SparkSpecBase {

  test("mergeSchema and explicit unified schema agree; legacy rows null-pad") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
    val boundary = 3L * (ev.agg(max(col("event_id"))).head().getLong(0) + 1) / 4
    val dir = java.nio.file.Files.createTempDirectory("graft_i9spec_")
    try {
      graft.queries.Ingest.stageEvolvedLayout(ev, boundary, s"$dir/fact")

      val discovered = spark.read.option("mergeSchema", "true")
        .parquet(s"$dir/fact")
      // the production path: unified schema supplied, no footer sweep
      val unified = discovered.schema
      val explicit = spark.read.schema(unified).parquet(s"$dir/fact")
      val a = discovered.orderBy("event_id").collect().toSeq
      val b = explicit.orderBy("event_id").collect().toSeq
      assert(a == b, "explicit-schema read must equal the discovering read")

      val legacyNulls = discovered
        .filter(col("event_id") < boundary && col("channel").isNull).count()
      assert(legacyNulls == discovered
        .filter(col("event_id") < boundary).count(),
        "every legacy row must surface NULL for the evolved column")
      assert(discovered
        .filter(col("event_id") >= boundary && col("channel").isNull)
        .count() == 0)

      assert(unified("channel") ==
        StructField("channel", StringType, nullable = true),
        s"evolved column must merge as a nullable string: $unified")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
