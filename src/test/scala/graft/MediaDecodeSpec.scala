package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaDecode, Multimodal}
import graft.operators.MediaDecode.{Bitmap, Pcm}

/** Real pixel/sample decode for the codec-free containers: hand-built
  * BMP/WAV payloads with known pixels/samples, decoded and feature-passed
  * byte-exact. */
class MediaDecodeSpec extends AnyFunSuite with SparkSpec {

  private def le16(v: Int): Array[Byte] =
    Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** 24-bit BI_RGB BMP from top-down RGB rows (stored bottom-up unless
    * topDown, with the spec's 4-byte row padding). */
  private def bmp24(w: Int, h: Int, rgbTopDown: Array[Byte],
      topDown: Boolean = false): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val px = new Array[Byte](rowSize * h)
    for (y <- 0 until h; x <- 0 until w) {
      val s = (y * w + x) * 3
      val destRow = if (topDown) y else h - 1 - y
      val d = destRow * rowSize + x * 3
      px(d) = rgbTopDown(s + 2); px(d + 1) = rgbTopDown(s + 1); px(d + 2) = rgbTopDown(s)
    }
    "BM".getBytes ++ le32(54 + px.length) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(w) ++ le32(if (topDown) -h else h) ++
      Array[Byte](1, 0, 24, 0) ++ le32(0) ++ le32(px.length) ++
      le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++ px
  }

  private def wavPcm(rate: Int, samples: Array[Short]): Array[Byte] = {
    val data = samples.flatMap(s => le16(s & 0xffff))
    "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(rate) ++ le32(rate * 2) ++ le16(2) ++ le16(16) ++
      "data".getBytes ++ le32(data.length) ++ data
  }

  // 2×2 image: red, green / blue, white (top-down reading order)
  private val rgb2x2 = Array[Byte](
    255.toByte, 0, 0,   0, 255.toByte, 0,
    0, 0, 255.toByte,   255.toByte, 255.toByte, 255.toByte)

  test("BMP 24-bit decodes to top-down RGB, bottom-up and top-down storage") {
    for (td <- Seq(false, true)) {
      val bm = MediaDecode.decodeBmp(bmp24(2, 2, rgb2x2, topDown = td)).get
      assert(bm.width == 2 && bm.height == 2)
      assert(bm.rgb.toSeq == rgb2x2.toSeq, s"topDown=$td")
    }
  }

  test("BMP row padding honored: 3×1 rows pad to 12 bytes") {
    val rgb = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90)
    val bytes = bmp24(3, 1, rgb)
    assert(bytes.length == 54 + 12, "row stride is padded to a 4-byte boundary")
    assert(MediaDecode.decodeBmp(bytes).get.rgb.toSeq == rgb.toSeq)
  }

  test("compressed/paletted BMP refuses (codec territory), as does junk") {
    val ok = bmp24(2, 2, rgb2x2)
    val compressed = ok.clone(); compressed(30) = 1 // biCompression = BI_RLE8
    assert(MediaDecode.decodeBmp(compressed).isEmpty)
    assert(MediaDecode.decodeBmp("not a bitmap at all".getBytes).isEmpty)
  }

  test("nearest-neighbor resample picks exact source pixels") {
    val bm = Bitmap(2, 2, rgb2x2)
    val up = MediaDecode.resizeNearest(bm, 4, 4)
    // each source pixel becomes a 2×2 block
    assert(up.rgb.slice(0, 3).toSeq == Seq(255.toByte, 0, 0))
    assert(up.rgb.slice(9, 12).toSeq == Seq(0, 255.toByte, 0))
    val down = MediaDecode.resizeNearest(bm, 1, 1)
    assert(down.rgb.toSeq == Seq(255.toByte, 0, 0), "1×1 keeps the top-left source")
  }

  test("WAV PCM-16 samples decode byte-exact; RMS of a full-scale square " +
    "wave is 1") {
    val square = Array.fill[Short](8)(Short.MinValue) // |s|/32768 = 1 exactly
    val pcm = MediaDecode.decodeWavPcm(wavPcm(16000, square)).get
    assert(pcm.sampleRate == 16000 && pcm.channels == 1)
    assert(pcm.samples.toSeq == square.toSeq)
    assert(MediaDecode.rms(pcm) == 1.0)
    val mixed = Array[Short](0, 16384, -16384, 0)
    assert(math.abs(MediaDecode.rms(MediaDecode.decodeWavPcm(
      wavPcm(8000, mixed)).get) - 0.3535533905932738) < 1e-12)
  }

  test("embed runs over decoded pixels for BMP and samples for WAV, " +
    "stub bytes otherwise") {
    // BMP: accumulation over the 12 RGB bytes, not the 120-byte container
    val img = Multimodal.embed(bmp24(2, 2, rgb2x2), dims = 3)
    // dim d accumulates rgb[d], rgb[d+3], rgb[d+6], rgb[d+9] — each dim
    // sees two 255s across the four pixels → 2.0; the raw-container stub
    // path would instead fold the 54-byte header + row padding in
    assert(img.toSeq == Seq(2.0f, 2.0f, 2.0f))
    // WAV: |sample|/32768 accumulation
    val aud = Multimodal.embed(wavPcm(8000, Array[Short](16384, -16384)), dims = 2)
    assert(aud.toSeq == Seq(0.5f, 0.5f))
    // non-media: raw byte accumulation (unchanged stub path)
    val stub = Multimodal.embed(Array[Byte](51, 102), dims = 2)
    assert(stub.toSeq == Seq(0.2f, 0.4f))
  }

  test("resize emits real resampled geometry for BMP assets") {
    val session = spark
    import session.implicits._
    val asset = Multimodal.MediaAsset(1L, "image", bmp24(2, 2, rgb2x2),
      width = 2, height = 2, sample_rate = 0, duration_ms = 0L)
    val out = Multimodal.resize(Seq(asset).toDS(), maxSide = 1).collect().head
    assert(out.out_width == 1 && out.out_height == 1 && out.n_bytes == 3,
      "n_bytes is the REAL resampled buffer length")
  }
}
