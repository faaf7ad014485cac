package graft.validate

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Single-pass pipeline metrics via the Observation API — the
  * scale-correct form of the reference's run counters (SURVEY A4/A6):
  * record counts, null rates, and value totals are collected DURING the
  * one data pass instead of via separate count() jobs re-scanning the
  * input.
  */
class ObservationSpec extends SparkSpecBase {

  test("counters ride along the single write pass, no extra scan") {
    val obs = Observation("ingest-metrics")
    val ev = Tables.events(spark, sf)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        count(when(col("value").isNull, 1)).as("null_values"),
        Tables.dsum(col("value")).as("total_value"),
        approx_count_distinct(col("user_id")).as("approx_users"))
    // one action drives both the pipeline and the metrics
    val written = ev.filter(col("event_type") =!= "nope").count()
    val m = obs.get
    assert(m("n_rows").asInstanceOf[Long] == 1000)
    assert(m("null_values").asInstanceOf[Long] == 0)
    assert(m("total_value").asInstanceOf[Double] > 0)
    assert(m("approx_users").asInstanceOf[Long] > 10) // 15 users at sf0.001
    assert(written == 1000)
  }
}
