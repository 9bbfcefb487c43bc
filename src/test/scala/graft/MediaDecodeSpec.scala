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

  /** DIB pixel payload (no file header) for one frame: bottom-up BGR
    * rows, 4-byte stride — what an uncompressed AVI '00db' chunk holds. */
  private def dibFrame(w: Int, h: Int, rgbTopDown: Array[Byte]): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val px = new Array[Byte](rowSize * h)
    for (y <- 0 until h; x <- 0 until w) {
      val s = (y * w + x) * 3
      val d = (h - 1 - y) * rowSize + x * 3
      px(d) = rgbTopDown(s + 2); px(d + 1) = rgbTopDown(s + 1); px(d + 2) = rgbTopDown(s)
    }
    px
  }

  private def chunk(id: String, data: Array[Byte]): Array[Byte] =
    id.getBytes ++ le32(data.length) ++ data ++
      (if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])

  private def list(listType: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", listType.getBytes ++ body)

  /** Minimal uncompressed AVI: hdrl with a 'vids'/BI_RGB stream of the
    * given geometry, movi with one '00db' chunk per frame. */
  private def avi(w: Int, h: Int, bpp: Int, frames: Seq[Array[Byte]],
      compression: Int = 0, frameId: String = "00db"): Array[Byte] = {
    val strh = chunk("strh", "vids".getBytes ++ "DIB ".getBytes ++ le32(0) ++
      Array.fill[Byte](44)(0))
    val strf = chunk("strf", le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++
      le16(bpp) ++ le32(compression) ++ Array.fill[Byte](20)(0))
    val hdrl = list("hdrl", chunk("avih", Array.fill[Byte](56)(0)) ++
      list("strl", strh ++ strf))
    val movi = list("movi", frames.flatMap(f => chunk(frameId, f)).toArray)
    val body = "AVI ".getBytes ++ hdrl ++ movi
    "RIFF".getBytes ++ le32(body.length) ++ body
  }

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

  /** A syntactically-valid BI_RGB header with arbitrary (untrusted)
    * geometry fields and a small real payload. */
  private def bmpHeader(w: Int, h: Int, bpp: Int = 24): Array[Byte] =
    "BM".getBytes ++ le32(254) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(w) ++ le32(h) ++ Array[Byte](1, 0, bpp.toByte, 0) ++
      le32(0) ++ le32(0) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++
      new Array[Byte](200)

  test("adversarial BMP geometry never throws: wrap-prone widths, " +
    "Int.MinValue height, giant products all refuse cleanly") {
    // width 2^30 at 24bpp wraps Int rowSize negative — the historical
    // trap: a negative rowSize slides past `pixOff + rowSize*h > len`
    // and into a wrapped allocation
    assert(MediaDecode.decodeBmp(bmpHeader(0x40000000, 2)).isEmpty)
    assert(MediaDecode.decodeBmp(bmpHeader(0x40000000, 2, bpp = 32)).isEmpty)
    // abs(Int.MinValue) is still negative in Int math
    assert(MediaDecode.decodeBmp(bmpHeader(2, Int.MinValue)).isEmpty)
    // width*height*3 above Int.MaxValue must refuse, not wrap
    assert(MediaDecode.decodeBmp(bmpHeader(0x18000, 0x18000)).isEmpty)
    assert(MediaDecode.decodeBmp(bmpHeader(-2, 2)).isEmpty)
    assert(MediaDecode.decodeBmp(bmpHeader(2, 0)).isEmpty)
    // w=h=Int.MaxValue overflows even LONG products (rowSize*height >
    // 2^63 wrapped to a tiny positive, allocating a 3-byte rgb buffer
    // the pixel loop then overran) — the division-form guard refuses it
    assert(MediaDecode.decodeBmp(bmpHeader(Int.MaxValue, Int.MaxValue)).isEmpty)
    assert(MediaDecode.decodeBmp(bmpHeader(Int.MaxValue, Int.MaxValue, bpp = 32)).isEmpty)
    // the ImageIO fallback must ALSO refuse dimension bombs without
    // decoding: its readers allocate from the untrusted header, and an
    // OutOfMemoryError there is an Error no NonFatal handler would see —
    // the header-only dimension probe rejects before any pixel read
    assert(MediaDecode.decodeImage(bmpHeader(1, Int.MaxValue, bpp = 32)).isEmpty)
    assert(MediaDecode.decodeImage(bmpHeader(Int.MaxValue, 1, bpp = 32)).isEmpty)
    // and a well-formed 2×2 still decodes after all the guards
    assert(MediaDecode.decodeBmp(bmp24(2, 2, rgb2x2)).nonEmpty)
  }

  test("decodeImage reads PNG/GIF/JPEG pixels via the JDK ImageIO — " +
    "lossless formats byte-exact, JPEG by geometry") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0xffffff)
    def enc(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, bos), s"JDK writer for $fmt present")
      bos.toByteArray
    }
    val png = MediaDecode.decodeImage(enc("png")).get
    assert(png.width == 2 && png.height == 2 && png.rgb.toSeq == rgb2x2.toSeq,
      "PNG is lossless: decoded pixels match the source exactly")
    // the JDK GIF WRITER quantizes its palette (white comes back blue on
    // a 2×2), so the contract pinned here is decode-side: our RGB
    // normalization must match ImageIO's own read of the same bytes
    val gifBytes = enc("gif")
    val gifRef = ImageIO.read(new java.io.ByteArrayInputStream(gifBytes))
    val gif = MediaDecode.decodeImage(gifBytes).get
    for (y <- 0 until 2; x <- 0 until 2) {
      val p = gifRef.getRGB(x, y)
      val d = (y * 2 + x) * 3
      assert(gif.rgb(d) == ((p >> 16) & 0xff).toByte &&
        gif.rgb(d + 1) == ((p >> 8) & 0xff).toByte &&
        gif.rgb(d + 2) == (p & 0xff).toByte,
        s"palette GIF pixel ($x,$y) matches the JDK's own decode")
    }
    val jpg = MediaDecode.decodeImage(enc("jpg")).get
    assert(jpg.width == 2 && jpg.height == 2 && jpg.rgb.length == 12,
      "JPEG is lossy: pin the geometry and buffer shape")
    // BMP still routes through our own checked decoder
    assert(MediaDecode.decodeImage(bmp24(2, 2, rgb2x2)).get.rgb.toSeq == rgb2x2.toSeq)
    // non-image bytes refuse without throwing (stub fallback relies on it)
    assert(MediaDecode.decodeImage("plain text, no magic".getBytes).isEmpty)
  }

  test("embed and resize consume real PNG pixels, not container bytes") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    val pngBytes = bos.toByteArray
    // same accumulation as the BMP test: each dim sees two 255s → 2.0;
    // the old stub path would have folded PNG container/IDAT bytes
    assert(Multimodal.embed(pngBytes, dims = 3).toSeq == Seq(2.0f, 2.0f, 2.0f))
    val session = spark
    import session.implicits._
    val asset = Multimodal.MediaAsset(7L, "image", pngBytes,
      width = 2, height = 2, sample_rate = 0, duration_ms = 0L)
    val out = Multimodal.resize(Seq(asset).toDS(), maxSide = 1).collect().head
    assert(out.out_width == 1 && out.out_height == 1 && out.n_bytes == 3,
      "resample runs over decoded PNG pixels")
  }

  test("dhash60 hashes decoded pixels: a left-to-right gradient sets every " +
    "diff bit, a constant image none, and storage order doesn't matter") {
    val (w, h) = (7, 10) // exactly the dHash grid — resample is identity
    val grad = Array.tabulate(w * h * 3) { i => ((i / 3 % w) * 30).toByte }
    for (td <- Seq(false, true))
      assert(Multimodal.dhash60(bmp24(w, h, grad, topDown = td)) == (1L << 60) - 1,
        s"brightness rises at every horizontal neighbor (topDown=$td)")
    val const = Array.fill(w * h * 3)(77.toByte)
    assert(Multimodal.dhash60(bmp24(w, h, const)) == 0L)
    // identical pixels through different container storage → identical hash,
    // and a one-pixel brightness spike flips only that neighborhood's bits
    val spiked = grad.clone()
    spiked(3 * (5 * w + 3)) = 255.toByte // row 5, col 3, R channel
    val d = java.lang.Long.bitCount(
      Multimodal.dhash60(bmp24(w, h, grad)) ^ Multimodal.dhash60(bmp24(w, h, spiked)))
    assert(d >= 1 && d <= 2, s"local edit stays local: $d bits")
  }

  test("afp60 hashes the decoded PCM energy envelope: a crescendo sets " +
    "every transition bit, silence none, and gain changes don't move " +
    "monotone transitions") {
    // 11 frames × 6 bands = 66 windows; amplitude strictly rising per
    // window → every frame-to-frame energy diff is positive → all 60 bits
    val cells = 66
    val rising = Array.tabulate(cells * 10)(i => ((i / 10 + 1) * 400).toShort)
    assert(Multimodal.afp60(wavPcm(8000, rising)) == (1L << 60) - 1,
      "energy rises at every frame transition")
    assert(Multimodal.afp60(wavPcm(8000, Array.fill(cells * 10)(0.toShort))) == 0L,
      "silence has no rising transitions")
    // constant amplitude: no strict rise anywhere → 0
    assert(Multimodal.afp60(wavPcm(8000, Array.fill(cells * 10)(5000.toShort))) == 0L)
    // a uniform gain change preserves every sign-of-difference → identical
    // fingerprint (the level-invariance the envelope hash is for)
    val half = rising.map(s => (s / 2).toShort)
    assert(Multimodal.afp60(wavPcm(8000, rising)) ==
      Multimodal.afp60(wavPcm(8000, half)), "fingerprint is gain-invariant")
    // non-WAV bytes fall back to the declared byte-grid stub
    val stubBytes = Array.tabulate[Byte](66)(i => i.toByte)
    assert(Multimodal.afp60(stubBytes) == (1L << 60) - 1,
      "stub grid: strictly rising bytes set every temporal diff bit")
  }

  test("frameHashes hashes decoded AVI frames with the image dHash, " +
    "dedupes repeats, and shared frames survive re-cutting") {
    val gradA = Array.tabulate(7 * 10 * 3) { i => ((i / 3 % 7) * 30).toByte }
    val gradB = gradA.map(b => (255 - (b & 0xff)).toByte)
    val black = Array.fill(7 * 10 * 3)(0.toByte)
    def f(px: Array[Byte]) = dibFrame(7, 10, px)
    // same frame twice → one hash (set semantics); the hash IS the dHash
    val hs = Multimodal.frameHashes(avi(7, 10, 24, Seq(f(gradA), f(gradA), f(black))))
    assert(hs.length == 2)
    assert(hs.contains(Multimodal.dhash60(bmp24(7, 10, gradA))),
      "frame hash equals the standalone image dHash of the same pixels")
    // a re-cut video (reordered + extra footage) still shares both frames
    val recut = Multimodal.frameHashes(
      avi(7, 10, 24, Seq(f(black), f(gradB), f(gradA))))
    assert(hs.toSet.intersect(recut.toSet).size == 2,
      "shared frames match independent of position and surrounding footage")
    // non-AVI bytes fall back to the window-grid stub, still total
    val stub = Multimodal.frameHashes(Array.tabulate[Byte](120)(_.toByte))
    assert(stub.length == 3, "120 bytes at 50-stride → 3 windows")
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

  test("uncompressed AVI decodes real frames: bottom-up DIB rows flip, " +
    "offsets point at the frame chunks, frame order preserved") {
    val inverted = rgb2x2.map(b => (~b).toByte)
    val bytes = avi(2, 2, 24, Seq(dibFrame(2, 2, rgb2x2), dibFrame(2, 2, inverted)))
    val frames = MediaDecode.decodeAviFrames(bytes).get
    assert(frames.length == 2)
    assert(frames(0).bitmap.width == 2 && frames(0).bitmap.height == 2)
    assert(frames(0).bitmap.rgb.toSeq == rgb2x2.toSeq,
      "frame 0 pixels decode exactly, rows flipped to top-down")
    assert(frames(1).bitmap.rgb.toSeq == inverted.toSeq, "frame 1 differs")
    assert(frames(0).offset < frames(1).offset &&
      frames.forall(f => f.offset > 12 && f.offset < bytes.length),
      "offsets are real container positions")
  }

  test("AVI guards: compressed streams, dimension bombs, and truncation " +
    "return None or skip — never throw") {
    val f = dibFrame(2, 2, rgb2x2)
    assert(MediaDecode.decodeAviFrames(avi(2, 2, 24, Seq(f), compression = 1)).isEmpty,
      "non-BI_RGB video needs a codec — declared stub boundary")
    assert(MediaDecode.decodeAviFrames(avi(2, 2, 24, Seq(f), frameId = "00dc")).isEmpty,
      "compressed frame chunks refuse even with a BI_RGB strf")
    assert(MediaDecode.decodeAviFrames(avi(Int.MaxValue, Int.MaxValue, 24, Seq(f)))
      .exists(_.isEmpty),
      "a dimension-bomb strf yields no frames (decodeDib division guard)")
    assert(MediaDecode.decodeAviFrames("RIFF".getBytes ++ le32(99999) ++
      "AVI ".getBytes ++ "LIST".getBytes ++ le32(Int.MaxValue)).forall(_.isEmpty),
      "a chunk size past the buffer ends the walk quietly, no frames")
    assert(MediaDecode.decodeAviFrames(wavPcm(8000, Array[Short](1))).isEmpty,
      "a RIFF that is not an AVI is not video")
    // frame chunk shorter than one row: skipped, the valid frame survives
    val mixed = avi(2, 2, 24, Seq(Array[Byte](1, 2, 3), f))
    assert(MediaDecode.decodeAviFrames(mixed).get.length == 1)
  }

  test("sampleFrames emits decoded RGB for uncompressed AVI (stride in " +
    "frames) and falls back to the byte-slice stub otherwise") {
    val session = spark
    import session.implicits._
    def asset(id: Long, bytes: Array[Byte]) =
      Multimodal.MediaAsset(id, "video", bytes,
        width = 0, height = 0, sample_rate = 0, duration_ms = 0L)
    val inverted = rgb2x2.map(b => (~b).toByte)
    val vid = avi(2, 2, 24,
      Seq(dibFrame(2, 2, rgb2x2), dibFrame(2, 2, inverted), dibFrame(2, 2, rgb2x2)))
    val out = Multimodal.sampleFrames(
      Seq(asset(1L, vid), asset(2L, "not a container".getBytes)).toDS(),
      stride = 2, frameSize = 4).collect()
    val real = out.filter(_.media_id == 1L).sortBy(_.frame_idx)
    assert(real.length == 2, "stride 2 keeps frames 0 and 2")
    assert(real(0).frame_bytes.toSeq == rgb2x2.toSeq &&
      real(1).frame_bytes.toSeq == rgb2x2.toSeq,
      "sampled frames carry DECODED pixels, not container slices")
    val stub = out.filter(_.media_id == 2L)
    assert(stub.nonEmpty && stub.forall(_.frame_bytes.length <= 4),
      "undecodable payloads keep the documented byte-slice stub")
  }
}
