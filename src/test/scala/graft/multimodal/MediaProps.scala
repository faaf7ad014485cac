package graft.multimodal

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Generative roundtrip contract for the media header codec: ANY
  * dimensions / sample rate / body we encode must decode back exactly,
  * the decoded body offset must point at the body's first byte, and a
  * WAV with arbitrary extra RIFF chunks before "data" must still walk
  * to the right offset — the property space (endianness, padding,
  * chunk-length arithmetic) that fixture-based tests can't cover.
  */
object MediaProps extends Properties("Media") {

  private val bodyGen: Gen[Array[Byte]] = for {
    n <- Gen.choose(0, 200)
    bs <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield bs.toArray

  private val dimGen: Gen[Int] = Gen.choose(1, 1 << 20)
  private val rateGen: Gen[Int] = Gen.choose(1, 768000)

  property("png encodes dims big-endian and decodes back exactly") =
    forAll(dimGen, dimGen, bodyGen) { (w, h, body) =>
      val p = Media.pngBytes(w, h, body)
      val d = Media.decodeHeader(p)
      Prop(d == DecodedHeader("png", w, h, 0, Media.pngHeaderLen) &&
        p.drop(d.bodyOffset).sameElements(body)) :| s"decoded=$d"
    }

  property("bmp encodes dims little-endian and decodes back exactly") =
    forAll(dimGen, dimGen, bodyGen) { (w, h, body) =>
      val p = Media.bmpBytes(w, h, body)
      val d = Media.decodeHeader(p)
      Prop(d == DecodedHeader("bmp", w, h, 0, Media.bmpHeaderLen) &&
        p.drop(d.bodyOffset).sameElements(body)) :| s"decoded=$d"
    }

  property("wav decodes rate and body through an arbitrary RIFF chunk walk") =
    forAll(rateGen, bodyGen, Gen.choose(0, 3), Gen.choose(0, 9)) {
      (rate, body, nChunks, chunkLen) =>
        // inject extra chunks between "fmt " and "data" (odd lengths get
        // the spec's pad byte); the walk must skip them all
        val canonical = Media.wavBytes(rate, body)
        val extras = (0 until nChunks).flatMap { i =>
          val data = Array.fill(chunkLen)((i + 1).toByte)
          val padded = if (chunkLen % 2 == 1) data :+ 0.toByte else data
          s"CHK$i".getBytes("US-ASCII") ++
            Array[Byte](chunkLen.toByte, 0, 0, 0) ++ padded
        }.toArray
        val p = canonical.take(36) ++ extras ++ canonical.drop(36)
        val d = Media.decodeHeader(p)
        Prop(d.format == "wav" && d.sampleRate == rate &&
          d.bodyOffset == Media.wavHeaderLen + extras.length &&
          p.drop(d.bodyOffset).sameElements(body)) :| s"decoded=$d"
    }
}
