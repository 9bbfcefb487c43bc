package graft.operators

/** Real pixel/sample decoding with zero external dependencies: our own
  * byte-math decoders for uncompressed BMP (BI_RGB 24/32-bit, to
  * row-major top-down RGB) and WAV PCM-16 (to interleaved samples), the
  * JDK's `javax.imageio` for PNG/GIF/JPEG pixels ([[decodeImage]]), and
  * the two feature passes a training pipeline runs on the decodes
  * (nearest-neighbor resample, RMS loudness). With these,
  * [[Multimodal]]'s decode stub is confined to the formats that
  * genuinely need a codec LIBRARY the JDK lacks (video frames,
  * compressed audio) — swap points documented there.
  *
  * Everything here is per-row compute inside a map/mapPartitions operator:
  * no shuffle, scales with input splits, and the decoded buffers live only
  * for the row (the columnar store keeps the opaque payload; only small
  * typed features re-enter the relational plan).
  */
object MediaDecode {

  /** Row-major, top-down, tightly-packed RGB (3 bytes/pixel). */
  case class Bitmap(width: Int, height: Int, rgb: Array[Byte])

  /** Interleaved PCM-16 samples across channels. */
  case class Pcm(sampleRate: Int, channels: Int, samples: Array[Short])

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) |
      (u8(b, i + 3).toLong << 24)

  /** Decode an uncompressed (BI_RGB) 24- or 32-bit BMP. Bottom-up rows
    * (positive biHeight) are flipped to top-down; 32-bit BGRA drops the
    * alpha byte; 24-bit rows honor the 4-byte stride padding. Returns
    * None for compressed/paletted BMPs (those need a real codec). */
  def decodeBmp(b: Array[Byte]): Option[Bitmap] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val pixOff = le32(b, 10).toInt
    val widthRaw = le32(b, 18).toInt
    val heightRaw = le32(b, 22).toInt
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (compression != 0L || (bpp != 24 && bpp != 32)) return None
    // Header fields are UNTRUSTED: every size derivation stays in Long
    // until proven to fit. Int math here lets width ≈ 2^30 at 24bpp wrap
    // rowSize negative (sliding past the bounds guard into a wrapped
    // allocation), and abs(Int.MinValue) is itself still negative.
    if (pixOff < 54) return None
    decodeDib(b, pixOff, b.length - pixOff, widthRaw, heightRaw, bpp)
  }

  /** Decode a raw BI_RGB DIB pixel array at `off` spanning at most
    * `limit` bytes (an AVI frame chunk, or a BMP's pixel section) with
    * fully UNTRUSTED dimensions — the shared core of [[decodeBmp]] and
    * [[decodeAviFrames]]. Negative `heightRaw` means top-down rows. */
  private[operators] def decodeDib(b: Array[Byte], off: Int, limit: Int,
      widthRaw: Int, heightRaw: Int, bpp: Int): Option[Bitmap] = {
    if (off < 0 || limit < 0 || off > b.length) return None
    val topDown = heightRaw < 0
    val widthL = widthRaw.toLong
    val heightL = math.abs(heightRaw.toLong)
    if (widthL <= 0 || heightL <= 0 || (bpp != 24 && bpp != 32)) return None
    val bytesPerPx = bpp / 8
    // ≤ ~2^33 — safe; but rowSizeL * heightL can exceed 2^63 when both
    // dims are ~2^31 (the w=h=Int.MaxValue corner wraps LONG math too),
    // so the fit check is DIVISION-form: no product is ever formed that
    // could overflow. Once it passes, rowSize·height ≤ avail ≤ 2^31 and
    // rgbLen ≤ avail (rowSize ≥ 3·width), so the Int casts are exact.
    val rowSizeL = ((widthL * bytesPerPx + 3) / 4) * 4
    val avail = math.min(limit.toLong, b.length.toLong - off)
    if (avail < rowSizeL || heightL > avail / rowSizeL) return None
    val rgbLenL = widthL * heightL * 3
    if (rgbLenL > Int.MaxValue) return None
    val width = widthL.toInt
    val height = heightL.toInt
    val rowSize = rowSizeL.toInt
    val rgb = new Array[Byte](rgbLenL.toInt)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      var x = 0
      while (x < width) {
        val s = off + srcRow * rowSize + x * bytesPerPx
        val d = (y * width + x) * 3
        // BMP stores BGR(A)
        rgb(d) = b(s + 2); rgb(d + 1) = b(s + 1); rgb(d + 2) = b(s)
        x += 1
      }
      y += 1
    }
    Some(Bitmap(width, height, rgb))
  }

  // ImageIO's default behavior writes a disk-backed cache file per
  // decode — wrong on executors; flip it to in-memory once per JVM.
  private lazy val imageIoReady: Boolean = {
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
    true
  }

  /** Decode any JDK-decodable image container — PNG, GIF, JPEG (and BMP
    * variants beyond BI_RGB) via `javax.imageio.ImageIO`, which ships in
    * the JDK and runs headless — normalized to the same top-down
    * tightly-packed RGB [[Bitmap]]. Our own [[decodeBmp]] runs first: it
    * is allocation-checked against adversarial headers and covers the
    * uncompressed fast path without the AWT color-model machinery.
    * Returns None (never throws) on anything ImageIO cannot read —
    * which keeps video and compressed audio as the only formats left to
    * a real codec library. */
  def decodeImage(b: Array[Byte]): Option[Bitmap] =
    decodeBmp(b).orElse(decodeImageIo(b))

  /** Pixel-count ceiling for ImageIO decodes (64 Mpx ≈ a 256 MB getRGB
    * buffer) — a per-task allocation bound, not an image-size opinion. */
  private val MaxImageIoPixels = 1L << 26

  private def decodeImageIo(b: Array[Byte]): Option[Bitmap] =
    try {
      require(imageIoReady)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (readers == null || !readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            // header-only dimension probe BEFORE any pixel read:
            // ImageIO's readers allocate buffers sized by the UNTRUSTED
            // header, so a crafted 1×2^31 image would OutOfMemoryError
            // the task inside read() — an Error, which no NonFatal
            // handler sees (the decodeBmp lesson, one layer down; found
            // by the structured-header fuzzer)
            val w = reader.getWidth(0)
            val h = reader.getHeight(0)
            if (w <= 0 || h <= 0 || w.toLong * h > MaxImageIoPixels) None
            else {
              val img = reader.read(0)
              // one bulk getRGB: handles every color model (palette GIF,
              // gray PNG, YCbCr JPEG) by converting to default sRGB ints
              val px = img.getRGB(0, 0, w, h, null, 0, w)
              val rgb = new Array[Byte](w * h * 3)
              var i = 0
              while (i < px.length) {
                val p = px(i)
                rgb(3 * i) = ((p >> 16) & 0xff).toByte
                rgb(3 * i + 1) = ((p >> 8) & 0xff).toByte
                rgb(3 * i + 2) = (p & 0xff).toByte
                i += 1
              }
              Some(Bitmap(w, h, rgb))
            }
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Nearest-neighbor resample — the real pixel pass behind
    * [[Multimodal.resize]] for decodable payloads. */
  def resizeNearest(bm: Bitmap, outW: Int, outH: Int): Bitmap = {
    require(outW > 0 && outH > 0)
    val out = new Array[Byte](outW * outH * 3)
    var y = 0
    while (y < outH) {
      val sy = math.min(bm.height - 1, y * bm.height / outH)
      var x = 0
      while (x < outW) {
        val sx = math.min(bm.width - 1, x * bm.width / outW)
        val s = (sy * bm.width + sx) * 3
        val d = (y * outW + x) * 3
        out(d) = bm.rgb(s); out(d + 1) = bm.rgb(s + 1); out(d + 2) = bm.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    Bitmap(outW, outH, out)
  }

  /** Decode WAV PCM-16 (audioFormat 1, 16 bits/sample) to interleaved
    * samples. Chunk-walks like [[MediaHeaders.parseWav]]; returns None
    * for non-PCM or non-16-bit payloads (codec territory). */
  def decodeWavPcm(b: Array[Byte]): Option[Pcm] = {
    if (b.length < 44 || !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var i = 12
    var fmt = 0; var channels = 0; var rate = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, "US-ASCII")
      val len = le32(b, i + 4)
      if (len > b.length - i - 8) { i = b.length }
      else {
        if (id == "fmt " && len >= 16) {
          fmt = le16(b, i + 8); channels = le16(b, i + 10)
          rate = le32(b, i + 12).toInt; bits = le16(b, i + 22)
        } else if (id == "data") { dataOff = i + 8; dataLen = len.toInt }
        i += 8 + len.toInt + (len.toInt & 1)
      }
    }
    if (fmt != 1 || bits != 16 || rate <= 0 || channels <= 0 || dataOff < 0) return None
    val n = dataLen / 2
    val samples = new Array[Short](n)
    var k = 0
    while (k < n) {
      samples(k) = le16(b, dataOff + 2 * k).toShort
      k += 1
    }
    Some(Pcm(rate, channels, samples))
  }

  /** RMS loudness over all channels, in [0, 1] of full scale. */
  def rms(p: Pcm): Double =
    if (p.samples.isEmpty) 0.0
    else math.sqrt(p.samples.foldLeft(0.0) { (acc, s) =>
      val v = s / 32768.0; acc + v * v
    } / p.samples.length)

  /** One decoded video frame: byte offset of its chunk payload in the
    * container (provenance) + the pixels. */
  case class VideoFrame(offset: Long, bitmap: Bitmap)

  private def fourcc(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)),
      java.nio.charset.StandardCharsets.US_ASCII)

  /** Decode the video frames of an UNCOMPRESSED ('DIB '/BI_RGB) AVI:
    * RIFF walk → `hdrl` for the 'vids' stream's BITMAPINFOHEADER
    * (width/height/bpp, compression must be 0) → `movi` for the `##db`
    * raw-DIB frame chunks, each decoded by [[decodeDib]] under its own
    * chunk limit. Returns None for anything that is not a RIFF-AVI or
    * whose video stream needs a real codec ('00dc' compressed frames,
    * non-BI_RGB formats) — THAT is where the declared codec stub now
    * starts; the container walk and raw-frame pixel path are real.
    *
    * Robustness: every chunk size is untrusted — offsets advance in Long,
    * a size past the buffer ends the walk, odd sizes pad per RIFF, and
    * `maxFrames` bounds total decoded allocation (each frame is already
    * dimension-checked by decodeDib's division-form guards). Never
    * throws on adversarial bytes. */
  def decodeAviFrames(b: Array[Byte], maxFrames: Int = 64): Option[Vector[VideoFrame]] = {
    if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ")
      return None
    var width = 0; var height = 0; var bpp = 0
    var compression = -1L; var isVids = false
    val frames = Vector.newBuilder[VideoFrame]
    var nFrames = 0

    // walk one LIST body [lo, hi); returns false to abort the whole parse
    def walk(lo: Long, hi: Long, depth: Int): Boolean = {
      if (depth > 8) return true // malformed recursion bomb: stop quietly
      var i = lo
      while (i + 8 <= hi && i + 8 <= b.length) {
        val id = fourcc(b, i.toInt)
        val len = le32(b, i.toInt + 4)
        val dataOff = i + 8
        val dataEnd = dataOff + len
        if (dataEnd > hi || dataEnd > b.length) return true // truncated: stop
        id match {
          case "LIST" if len >= 4 =>
            val listType = fourcc(b, dataOff.toInt)
            if (listType == "hdrl" || listType == "strl" || listType == "movi") {
              if (!walk(dataOff + 4, dataEnd, depth + 1)) return false
            }
          case "strh" if len >= 8 =>
            // a new stream header scopes the following strf
            isVids = fourcc(b, dataOff.toInt) == "vids"
          case "strf" if isVids && len >= 20 =>
            width = le32(b, dataOff.toInt + 4).toInt
            height = le32(b, dataOff.toInt + 8).toInt
            bpp = le16(b, dataOff.toInt + 14)
            compression = le32(b, dataOff.toInt + 16)
          case _ if id.length == 4 && id.endsWith("db") =>
            // raw-DIB frame: decodable only once a BI_RGB strf was seen
            if (compression != 0L) return false
            if (nFrames < maxFrames) {
              decodeDib(b, dataOff.toInt, len.toInt, width, height, bpp)
                .foreach { bm => frames += VideoFrame(dataOff, bm); nFrames += 1 }
            }
          case _ if id.endsWith("dc") =>
            return false // compressed frames: genuinely needs a codec
          case _ => // audio/index/other chunks: skip
        }
        i = dataEnd + (len & 1L) // RIFF pads chunks to even sizes
      }
      true
    }
    if (!walk(12L, b.length.toLong, 0)) return None
    if (compression != 0L || (bpp != 24 && bpp != 32)) return None
    Some(frames.result())
  }
}
