package graft.multimodal

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

class MediaSpec extends SparkSpecBase {

  test("fromDocuments builds binary payloads with typed metadata") {
    val media = Media.fromDocuments(Tables.documents(spark, sf))
    val schema = media.schema.map(f => f.name -> f.dataType.typeName).toMap
    assert(schema("payload") == "binary")
    assert(schema("kind") == "string")
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
    // payload really is the UTF-8 text bytes
    val r = media.filter(col("media_id") === 0).head()
    val doc0 = Tables.documents(spark, sf).filter(col("doc_id") === 0)
      .head().getAs[String]("text")
    assert(new String(r.payload, "UTF-8") == doc0)
  }

  test("extractFeatures is deterministic, partition-parallel, and complete") {
    val media = Media.fromDocuments(Tables.documents(spark, sf)).repartition(7)
    val f1 = Media.extractFeatures(media).collect().sortBy(_.media_id).toSeq
    val f2 = Media.extractFeatures(media.repartition(3))
      .collect().sortBy(_.media_id).toSeq
    assert(f1 == f2) // partitioning must not change results
    assert(f1.size == Tables.documents(spark, sf).count())
    val x = f1.head
    assert(x.n_bytes > 0 && x.checksum > 0 && x.n_frames_sampled > 0)
    assert(x.thumb_w <= 128 && x.thumb_h <= 128)
  }

  test("resizeFit preserves aspect and bounds; frameSample strides") {
    assert(Media.resizeFit(640, 480, 128) == (128, 96))
    assert(Media.resizeFit(480, 640, 128) == (96, 128))
    assert(Media.resizeFit(100, 50, 128) == (100, 50))
    assert(Media.resizeFit(10000, 3, 128) == (128, 1))
    assert(Media.frameSample(25, 10) == Seq(0, 10, 20))
  }
}
