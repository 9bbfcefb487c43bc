package graft.operators

/** Real media-container header parsing — pure JVM byte math, no codec
  * libraries. This is the genuine part of the multimodal decode step: for
  * actual media payloads the dimensions/sample-rate come from the
  * container header exactly as an image library would report them; only
  * pixel/sample DECODING (not needed for metadata) remains out of scope
  * in this build. [[Multimodal.decodeMeta]] consults these first and only
  * falls back to its deterministic synthetic stub for non-media bytes
  * (the sandbox test corpus).
  */
object MediaHeaders {

  case class ImageMeta(format: String, width: Int, height: Int)
  case class AudioMeta(format: String, sampleRate: Int, durationMs: Long)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) |
      (u8(b, i + 3).toLong << 24)

  /** PNG (spec: 8-byte signature, IHDR width/height big-endian at 16/20),
    * GIF87a/89a (logical screen uint16 LE at 6/8), BMP (BITMAPINFOHEADER
    * int32 LE at 18/22), JPEG (SOF0/1/2 marker scan).
    *
    * Dimension fields are range-checked: a 32-bit width/height with the
    * sign bit set (or zero) is not a big image, it is a malformed or
    * adversarial header — image libraries reject these, so this parser
    * answers None rather than reporting a negative dimension (found by
    * MediaBytesPropSpec fuzzing; note `math.abs(Int.MinValue)` is still
    * negative, which the positivity check also rejects). */
  def parseImage(b: Array[Byte]): Option[ImageMeta] = {
    val parsed =
      if (b.length >= 24 &&
          b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
          b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a)
        Some(ImageMeta("png", be32(b, 16).toInt, be32(b, 20).toInt))
      else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
          b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
        Some(ImageMeta("gif", le16(b, 6), le16(b, 8)))
      else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
        // biHeight is SIGNED: negative means a top-down bitmap (common for
        // Windows tooling) — libraries report the magnitude
        Some(ImageMeta("bmp", le32(b, 18).toInt, math.abs(le32(b, 22).toInt)))
      else if (b.length >= 4 && b(0) == 0xff.toByte && b(1) == 0xd8.toByte)
        parseJpegSof(b)
      else None
    parsed.filter(m => m.width > 0 && m.height > 0)
  }

  /** Walk JPEG marker segments to the first SOF0/SOF1/SOF2 frame header:
    * [FF Cn len prec height16 width16 ...]. */
  private def parseJpegSof(b: Array[Byte]): Option[ImageMeta] = {
    var i = 2
    while (i + 3 < b.length) {
      if (b(i) != 0xff.toByte) return None // lost marker sync
      // the spec allows any number of 0xFF fill bytes before a marker
      var j = i + 1
      while (j < b.length && b(j) == 0xff.toByte) j += 1
      if (j + 1 >= b.length) return None
      val marker = u8(b, j)
      // standalone markers (no length field): SOI, RSTn, EOI, TEM
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) ||
          marker == 0xd9 || marker == 0x01) i = j + 1
      else if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
        if (j + 8 >= b.length) return None
        return Some(ImageMeta("jpeg", be16(b, j + 6), be16(b, j + 4)))
      } else {
        if (j + 2 >= b.length) return None
        val len = be16(b, j + 1)
        if (len < 2) return None
        i = j + 1 + len
      }
    }
    None
  }

  /** WAV/RIFF: fmt chunk sample rate (LE32), duration from the data
    * chunk size over the byte rate. Chunk-walks so reordered/extra
    * chunks (LIST, fact) parse too. */
  def parseWav(b: Array[Byte]): Option[AudioMeta] = {
    if (b.length < 36 || !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var i = 12
    var rate = 0
    var byteRate = 0L
    var dataLen = -1L
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, "US-ASCII")
      val len = le32(b, i + 4)
      if (id == "fmt ") {
        if (i + 16 + 8 > b.length) return None
        rate = le32(b, i + 12).toInt
        byteRate = le32(b, i + 16)
      } else if (id == "data") dataLen = len
      // len is an UNSIGNED 32-bit field: a malformed value larger than the
      // remaining buffer must end the walk — truncating it with .toInt
      // could go negative and leave the cursor stuck (an infinite loop on
      // adversarial bytes). Chunks are word-aligned.
      if (len > b.length - i - 8) i = b.length
      else i += 8 + len.toInt + (len.toInt & 1)
    }
    if (rate <= 0) None
    else Some(AudioMeta("wav", rate,
      if (byteRate > 0 && dataLen >= 0) dataLen * 1000 / byteRate else 0L))
  }
}
