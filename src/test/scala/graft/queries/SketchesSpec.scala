package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch guarantees pinned as assertions (the oracle hash certifies the
  * construction; these pin the THEORY the construction must obey):
  * CMS estimates are one-sided, HLL register merge is associative (the
  * property that makes partial aggregation a correct distributed sketch
  * merge), Bloom membership has no false negatives.
  */
class SketchesSpec extends SparkSpecBase {

  test("k1 CMS: one-sided error — every estimate >= the true frequency") {
    val rows = Sketches.k1CmsHeavyHitters(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("tf"),
        s"CMS undercounted ${r.getAs[String]("word")}")
      assert(r.getAs[Long]("overcount") ==
        r.getAs[Long]("cms_est") - r.getAs[Long]("tf"))
    }
  }

  /** Rebuilds k2's registers (same hash/bucket/rho arithmetic) over two
    * disjoint shards and over the whole corpus: the per-bucket MAX merge
    * of the shard registers must equal the whole-corpus registers — the
    * exact property Spark's partial aggregation relies on when it merges
    * per-task sketch state, i.e. why the sketch distributes.
    */
  test("k2 HLL: register max-merge over disjoint shards == whole-corpus registers") {
    def regs(df: DataFrame): DataFrame = {
      val words = df.select(col("source"),
          explode(split(trim(col("text")), "\\s+")).as("word"))
        .filter(length(col("word")) > 0)
      words
        .select(col("source"),
          Tables.md5Hash32(concat(lit("hll:"), col("word"))).as("h"))
        .withColumn("bucket", pmod(col("h"), lit(256L)))
        .withColumn("tail", expr("h div 256"))
        .withColumn("rho",
          when(col("tail") > 0, lit(25) - length(expr("bin(tail)")))
            .otherwise(lit(25)))
        .groupBy(col("source"), col("bucket"))
        .agg(max(col("rho")).as("m"))
    }
    val docs = Tables.documents(spark, sf)
    val whole = regs(docs)
    val merged = regs(docs.filter(pmod(col("doc_id"), lit(2)) === 0))
      .union(regs(docs.filter(pmod(col("doc_id"), lit(2)) === 1)))
      .groupBy(col("source"), col("bucket"))
      .agg(max(col("m")).as("m"))
    assert(whole.count() > 0)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  /** The histogram sketch's two contracts: the estimate sits within one
    * bin width of the exact rank statistic (the construction's error
    * bound), and bin-wise ADDITION of shard histograms equals the
    * whole-corpus histogram (why partial aggregation is the fleet
    * merge) — both over the same global range envelope the two-pass
    * build fixes.
    */
  test("k4 histogram quantiles: within one bin width of exact; shards merge by addition") {
    val out = Sketches.k4HistQuantiles(spark, sf).collect()
    assert(out.length == 3)
    val vs = Tables.lineitem(spark, sf)
      .select(col("l_extendedprice")).collect().map(_.getDouble(0)).sorted
    val width = (vs.last - vs.head) / 128.0
    out.foreach { r =>
      val (target, est, n) =
        (r.getAs[Long]("target"), r.getAs[Double]("est"), r.getAs[Long]("n"))
      assert(n == vs.length)
      val exact = vs(target.toInt - 1) // target-th smallest
      assert(math.abs(est - exact) <= width,
        s"q=${r.getAs[Double]("q")}: |est $est - exact $exact| > bin width $width")
    }

    // mergeability: per-shard histograms (same global range) added
    // bin-wise must equal the whole-corpus histogram
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_extendedprice").as("v"))
    def histOf(df: org.apache.spark.sql.DataFrame) = df
      .select(least(lit(127),
        floor((col("v") - lit(vs.head)) / lit(width)).cast("int")).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
    val whole = histOf(li)
    val merged = histOf(li.filter(pmod(col("l_orderkey"), lit(2)) === 0))
      .union(histOf(li.filter(pmod(col("l_orderkey"), lit(2)) === 1)))
      .groupBy("bin").agg(sum("cnt").as("cnt"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }

  test("k3 Bloom: no false negatives; fp flag consistent") {
    val rows = Sketches.k3BloomMembership(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (hit, member, fp) = (r.getAs[Int]("bloom_hit"),
        r.getAs[Int]("true_member"), r.getAs[Int]("is_fp"))
      assert(!(member == 1 && hit == 0),
        s"false negative at doc ${r.getAs[Long]("doc_id")}")
      assert(fp == (if (hit == 1 && member == 0) 1 else 0))
    }
  }
}
