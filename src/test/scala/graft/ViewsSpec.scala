package graft

import graft.queries.Dedup
import org.apache.spark.sql.functions._

/** The SQL-only surface: temp views + registered native functions must
  * support full queries through `spark.sql` with no DataFrame code, and
  * the shared-cache lifecycle API must release cleanly and leave
  * subsequent queries correct.
  */
class ViewsSpec extends SparkSpecBase {

  test("spark.sql drives native functions over registered views") {
    Views.register(spark, sf)
    val rows = spark.sql(
      """SELECT label, t.id AS vec_id, t.score
        |FROM (
        |  SELECT label, graft_topk(
        |    graft_dot(embedding, embedding), vec_id, 2) AS top
        |  FROM embeddings GROUP BY label)
        |LATERAL VIEW explode(top) AS t
        |ORDER BY label, t.score DESC, t.id""".stripMargin).collect()
    assert(rows.nonEmpty)
    val perLabel = rows.groupBy(_.get(0)).view.mapValues(_.length)
    assert(perLabel.values.forall(_ == 2), "graft_topk k=2 per label")
    // events view must carry the nanos->micros repair
    val ts = spark.sql("SELECT max(ts) FROM events").head().get(0)
    assert(ts != null && ts.isInstanceOf[java.sql.Timestamp])
  }

  test("releaseSharedCaches releases and leaves rerun results identical") {
    val before = Dedup.d5SimhashNearDup(spark, sf).count()
    Dedup.releaseSharedCaches(spark)
    // registry empty -> second release is a no-op, never throws
    Dedup.releaseSharedCaches(spark)
    val after = Dedup.d5SimhashNearDup(spark, sf).count()
    assert(before == after)
  }
}
