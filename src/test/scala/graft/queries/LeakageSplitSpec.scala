package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins c14's leakage-safe split: the assignment is a pure function of
  * the near-dup cluster (one split per component, by construction no
  * pair straddles), and it is STABLE under incremental append — a new
  * near-duplicate of an existing document joins its cluster and
  * inherits its split without moving anything else.
  */
class LeakageSplitSpec extends SparkSpecBase {

  private lazy val out =
    Curation.c14LeakageSafeSplit(spark, sf).localCheckpoint()

  test("every cluster maps to exactly one split; both splits engage") {
    val multi = out.groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") =!= 1)
    assert(multi.isEmpty, "a cluster carries two split labels")
    val splits = out.select("split").distinct()
      .collect().map(_.getString(0)).toSet
    assert(splits == Set("train", "val"),
      s"expected both splits to engage, got $splits")
    assert(out.filter(col("bucket") < 0 || col("bucket") >= 100).isEmpty)
    // one row per document
    assert(out.count() == graft.Tables.documents(spark, sf).count())
  }

  test("no near-dup pair straddles the split (re-derived from the pair relation)") {
    val pairs = Dedup.d5PairsShared(spark, sf).select("doc_a", "doc_b")
    assert(pairs.count() > 0, "harness corpus has no near-dup pairs - " +
      "the leakage guarantee would be vacuous")
    val straddle = pairs
      .join(out.select(col("doc_id").as("doc_a"), col("split").as("sa")),
        "doc_a")
      .join(out.select(col("doc_id").as("doc_b"), col("split").as("sb")),
        "doc_b")
      .filter(col("sa") =!= col("sb"))
    assert(straddle.isEmpty)
  }

  test("append stability: a new near-dup inherits its original's split; nothing moves") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text")
    val copies = docs.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
    val injected = docs.unionByName(copies).localCheckpoint()
    val after = Curation.c14Of(Dedup.neardupClustersOfShared(injected))
      .localCheckpoint()
    // every original doc keeps its exact (cluster, bucket, split)
    val moved = out.select("doc_id", "cluster_id", "bucket", "split")
      .join(after.select(col("doc_id"),
          col("cluster_id").as("c2"), col("bucket").as("b2"),
          col("split").as("s2")), "doc_id")
      .filter(col("cluster_id") =!= col("c2") ||
        col("bucket") =!= col("b2") || col("split") =!= col("s2"))
    assert(moved.isEmpty,
      "appending near-dups moved an existing document's assignment")
    // every appended copy inherits its original's split
    val inherit = after.filter(col("doc_id") >= 1000000L)
      .select((col("doc_id") - 1000000L).as("doc_id"),
        col("split").as("copy_split"))
      .join(out.select(col("doc_id"), col("split")), "doc_id")
      .filter(col("split") =!= col("copy_split"))
    assert(inherit.isEmpty,
      "an appended near-dup landed on the other side of the split")
  }
}
