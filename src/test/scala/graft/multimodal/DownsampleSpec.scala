package graft.multimodal

import graft.SparkSpecBase

/** m5's byte contract on hand-built payloads: audio decimation keeps
  * exactly every 4th sample with the rate divided, frame sampling keeps
  * exactly the stride-0 frames, and the resampled artifact re-decodes
  * as a valid file of the same format (the in-operator roundtrip).
  */
class DownsampleSpec extends SparkSpecBase {

  test("wav decimation: every 4th sample, rate divided, valid roundtrip") {
    import spark.implicits._
    val body = (0 until 10).map(_.toByte).toArray
    val rec = MediaRecord(1L, "audio", Media.wavBytes(16000, body), 0, 0, 16000)
    val out = Media.downsample(Seq(rec).toDS()).collect().head
    assert(out.format === "wav")
    assert(out.orig_body_bytes === 10)
    assert(out.kept_units === 3)          // samples 0, 4, 8
    assert(out.new_n_bytes === 44 + 3)
    assert(out.new_checksum === (0 + 4 + 8).toLong)
    assert(out.re_rate === 4000)
  }

  test("bmp frame sampling: stride-10 over 64-byte units, dims preserved") {
    import spark.implicits._
    // 700 bytes -> 11 frames (10 full + ragged tail) -> frames 0 and 10
    // kept: bytes [0,64) plus the 60-byte tail [640,700)
    val body = Array.tabulate(700)(i => (i % 251).toByte)
    val rec = MediaRecord(2L, "video", Media.bmpBytes(320, 200, body),
      320, 200, 0)
    val out = Media.downsample(Seq(rec).toDS()).collect().head
    assert(out.format === "bmp")
    assert(out.kept_units === 2)
    assert(out.new_n_bytes === 54 + 64 + 60)
    val expected = (body.take(64) ++ body.slice(640, 700))
      .map(_ & 0xff).map(_.toLong).sum
    assert(out.new_checksum === expected)
    assert((out.re_w, out.re_h) === ((320, 200)))
  }

  test("png stills pass through unchanged") {
    import spark.implicits._
    val body = "still".getBytes("UTF-8")
    val rec = MediaRecord(3L, "image", Media.pngBytes(8, 4, body), 8, 4, 0)
    val out = Media.downsample(Seq(rec).toDS()).collect().head
    assert(out.format === "png")
    assert(out.kept_units === 1)
    assert(out.new_n_bytes === rec.payload.length)
    assert(out.new_checksum === body.map(_ & 0xff).map(_.toLong).sum)
  }
}
