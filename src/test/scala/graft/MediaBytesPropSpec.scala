package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.{MediaDecode, MediaHeaders}

/** The media byte parsers consume UNTRUSTED payloads (a crawl's binary
  * columns), so fuzz them: on arbitrary bytes — including mutated valid
  * headers, the nastier case — every parser must return (Option/None),
  * never throw, and never hang. Any parse that does succeed must satisfy
  * its own invariants (positive dims, buffer sizes consistent). */
class MediaBytesPropSpec extends AnyFunSuite {

  private val arbitraryBytes: Gen[Array[Byte]] =
    Gen.chooseNum(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))

  /** Valid-ish magic prefixes spliced onto random tails — exercises the
    * deep parser paths instead of bailing at the signature check. */
  private val magicBytes: Gen[Array[Byte]] = for {
    magic <- Gen.oneOf(
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      "GIF89a".getBytes, "BM".getBytes,
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte),
      "RIFF1234WAVE".getBytes)
    tail <- arbitraryBytes
  } yield magic ++ tail

  private def le32(v: Int): Array[Byte] =
    Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Structured BI_RGB headers: valid magic, compression 0, bpp 24/32,
    * but ARBITRARY 32-bit geometry/offset fields (biased toward
    * wrap-prone magnitudes). Random tails almost never pass the four
    * zero compression bytes + bpp check at once, so without this the
    * fuzzer bails at the signature gates and the size math — where the
    * sign-wrap allocation trap lived — goes unfuzzed. */
  private val i32: Gen[Int] = Gen.frequency(
    3 -> Gen.chooseNum(Int.MinValue, Int.MaxValue),
    2 -> Gen.oneOf(0, 1, 2, 54, 0x18000, 0x2aaaaaab, 0x40000000,
      Int.MaxValue, Int.MinValue, -1))
  private val bmpStructured: Gen[Array[Byte]] = for {
    w <- i32; h <- i32; off <- i32; bpp <- Gen.oneOf(24, 32)
  } yield "BM".getBytes ++ le32(254) ++ le32(0) ++ le32(off) ++
    le32(40) ++ le32(w) ++ le32(h) ++ Array[Byte](1, 0, bpp.toByte, 0) ++
    le32(0) ++ le32(0) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++
    new Array[Byte](200)

  /** Structured AVI containers: real RIFF framing (so the chunk walk runs
    * deep) with ARBITRARY strf geometry and chunk-size fields — the AVI
    * analog of bmpStructured; random tails bail at the 12-byte magic. */
  private val aviStructured: Gen[Array[Byte]] = for {
    w <- i32; h <- i32; comp <- Gen.oneOf(0, 0, 1, -1)
    bpp <- Gen.oneOf(24, 32, 8); frameLen <- Gen.chooseNum(0, 64)
    badSize <- i32
  } yield {
    def chunk(id: String, data: Array[Byte]) =
      id.getBytes ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    def list(t: String, body: Array[Byte]) = chunk("LIST", t.getBytes ++ body)
    val strh = chunk("strh", "vids".getBytes ++ new Array[Byte](52))
    val strf = chunk("strf", le32(40) ++ le32(w) ++ le32(h) ++
      Array[Byte](1, 0, bpp.toByte, 0) ++ le32(comp) ++ new Array[Byte](20))
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)) ++
      list("strl", strh ++ strf))
    val movi = list("movi", chunk("00db", new Array[Byte](frameLen)) ++
      "01wb".getBytes ++ le32(badSize)) // trailing chunk with a wild size
    val body = "AVI ".getBytes ++ hdrl ++ movi
    "RIFF".getBytes ++ le32(body.length) ++ body
  }

  private def run(name: String, p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, s"$name: $r")
  }

  test("parsers and decoders never throw on arbitrary, magic-prefixed, " +
    "or structured-header bytes") {
    val all = Gen.oneOf(arbitraryBytes, magicBytes, bmpStructured, aviStructured)
    run("total", Prop.forAll(all) { b =>
      val img = MediaHeaders.parseImage(b)
      val wav = MediaHeaders.parseWav(b)
      val bmp = MediaDecode.decodeBmp(b)
      val pcm = MediaDecode.decodeWavPcm(b)
      val any = MediaDecode.decodeImage(b)
      val avi = MediaDecode.decodeAviFrames(b)
      img.forall(m => m.width >= 0 && m.height >= 0) &&
        wav.forall(m => m.sampleRate > 0 && m.durationMs >= 0) &&
        bmp.forall(x => x.width > 0 && x.height > 0 &&
          x.rgb.length == x.width * x.height * 3) &&
        pcm.forall(x => x.sampleRate > 0 && x.samples != null) &&
        any.forall(x => x.width > 0 && x.height > 0 &&
          x.rgb.length == x.width * x.height * 3) &&
        avi.forall(_.forall(f => f.offset >= 0 && f.bitmap.width > 0 &&
          f.bitmap.rgb.length == f.bitmap.width * f.bitmap.height * 3))
    })
  }

  test("multimodal decodeMeta/embed stay total on arbitrary payloads") {
    import graft.operators.Multimodal
    val kinds = Gen.oneOf("image", "audio", "video")
    run("meta", Prop.forAll(Gen.oneOf(arbitraryBytes, magicBytes), kinds) { (b, k) =>
      val (w, h, sr, dur) = Multimodal.decodeMeta(b, k)
      val emb = Multimodal.embed(b)
      val dh = Multimodal.dhash60(b)
      val af = Multimodal.afp60(b)
      w >= 0 && h >= 0 && sr >= 0 && dur >= 0 && emb.length == 8 &&
        emb.forall(v => !v.isNaN) &&
        dh >= 0L && (dh >> 60) == 0L && dh == Multimodal.dhash60(b) &&
        af >= 0L && (af >> 60) == 0L && af == Multimodal.afp60(b)
    })
  }
}
