package graft.multimodal

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

class MediaSpec extends SparkSpecBase {

  test("fromDocuments builds real-format payloads with typed metadata") {
    val media = Media.fromDocuments(Tables.documents(spark, sf))
    val schema = media.schema.map(f => f.name -> f.dataType.typeName).toMap
    assert(schema("payload") == "binary")
    assert(schema("kind") == "string")
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
    // doc 0 is an image: payload is a genuine PNG header + the text body
    val r = media.filter(col("media_id") === 0).head()
    val doc0 = Tables.documents(spark, sf).filter(col("doc_id") === 0)
      .head().getAs[String]("text")
    assert((r.payload(0) & 0xff) == 0x89 &&
      new String(r.payload.slice(1, 4), "US-ASCII") == "PNG")
    val hdr = Media.decodeHeader(r.payload)
    assert(new String(r.payload.drop(hdr.bodyOffset), "UTF-8") == doc0)
  }

  test("decodeHeader parses back exactly what the header builders encoded") {
    val body = "the quick brown fox".getBytes("UTF-8")
    val png = Media.decodeHeader(Media.pngBytes(640, 481, body))
    assert(png == DecodedHeader("png", 640, 481, 0, Media.pngHeaderLen))
    val bmp = Media.decodeHeader(Media.bmpBytes(1920, 1080, body))
    assert(bmp == DecodedHeader("bmp", 1920, 1080, 0, Media.bmpHeaderLen))
    val wav = Media.decodeHeader(Media.wavBytes(44100, body))
    assert(wav == DecodedHeader("wav", 0, 0, 44100, Media.wavHeaderLen))
    // the RIFF walk is a real chunk walk: an extra chunk (odd length,
    // so padded) before "data" must not break rate or body offset
    val extra = "LIST".getBytes("US-ASCII") ++ Array[Byte](5, 0, 0, 0) ++
      Array[Byte](1, 2, 3, 4, 5, 0) // 5 data bytes + 1 pad
    val canonical = Media.wavBytes(22050, body)
    val withChunk = canonical.take(36) ++ extra ++ canonical.drop(36)
    val parsed = Media.decodeHeader(withChunk)
    assert(parsed.sampleRate == 22050 &&
      parsed.bodyOffset == Media.wavHeaderLen + extra.length)
    // unknown magic fails loudly, not with shifted garbage
    intercept[IllegalArgumentException] {
      Media.decodeHeader("not a media file".getBytes("UTF-8"))
    }
  }

  test("extractFeatures is deterministic, partition-parallel, and complete") {
    val media = Media.fromDocuments(Tables.documents(spark, sf)).repartition(7)
    val f1 = Media.extractFeatures(media).collect().sortBy(_.media_id).toSeq
    val f2 = Media.extractFeatures(media.repartition(3))
      .collect().sortBy(_.media_id).toSeq
    assert(f1 == f2) // partitioning must not change results
    assert(f1.size == Tables.documents(spark, sf).count())
    val x = f1.head // media_id 0: image/png
    assert(x.format == "png" && x.n_bytes > Media.pngHeaderLen)
    assert(x.checksum > 0 && x.n_frames_sampled == 1)
    assert(x.thumb_w <= 128 && x.thumb_h <= 128)
    // decoded values equal the metadata the headers were built from
    assert(f1.forall(f => f.kind != "audio" || (f.format == "wav" &&
      f.decoded_rate >= 16000 && f.decoded_w == 0 && f.thumb_w == 0)))
    val meta = media.collect().map(m => m.media_id -> m).toMap
    assert(f1.forall(f => f.decoded_w == meta(f.media_id).width &&
      f.decoded_h == meta(f.media_id).height &&
      f.decoded_rate == meta(f.media_id).sample_rate))
  }

  test("resizeFit preserves aspect and bounds; frameSample strides") {
    assert(Media.resizeFit(640, 480, 128) == (128, 96))
    assert(Media.resizeFit(480, 640, 128) == (96, 128))
    assert(Media.resizeFit(100, 50, 128) == (100, 50))
    assert(Media.resizeFit(10000, 3, 128) == (128, 1))
    assert(Media.frameSample(25, 10) == Seq(0, 10, 20))
  }

  test("m4: injected clones pair at hamming 0 within their format") {
    val pairs = graft.queries.Multimodal.m4PayloadNearDup(spark, sf).collect()
    assert(pairs.nonEmpty)
    // every injected clone (media_id % 7 == 0 → +1e9) must surface
    // as an exact payload-level pair with its origin
    val exact = pairs.filter(_.getAs[Int]("hamming") == 0)
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"))).toSet
    val expected = Tables.documents(spark, sf)
      .filter(pmod(col("doc_id"), lit(7)) === 0)
      .select("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + 1000000000L)).toSet
    assert(expected.subsetOf(exact),
      s"missing clone pairs: ${(expected -- exact).take(5)}")
    // pigeonhole bound respected: nothing above hamming 3 leaks through
    assert(pairs.forall(_.getAs[Int]("hamming") <= 3))
    // candidates never cross formats
    assert(pairs.forall(r => Set("png", "wav", "bmp")(r.getAs[String]("format"))))
  }
}
