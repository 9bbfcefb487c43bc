package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaHeaders, Multimodal}

/** Real container-header parsing: handcrafted minimal-but-valid PNG, GIF,
  * BMP, JPEG, and WAV byte streams; dimensions/sample-rate must come out
  * byte-exact, and Multimodal.decodeMeta must prefer the real parse over
  * the synthetic stub. */
class MediaHeadersSpec extends AnyFunSuite {

  private def be32(v: Int) = Array[Byte](
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def le32(v: Int) = Array[Byte](
    v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
  private def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
  private def be16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)

  private def png(w: Int, h: Int): Array[Byte] =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h) ++
      Array[Byte](8, 6, 0, 0, 0) ++ be32(0)

  private def gif(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes ++ le16(w) ++ le16(h) ++ Array[Byte](0, 0, 0)

  private def bmp(w: Int, h: Int): Array[Byte] =
    "BM".getBytes ++ le32(122) ++ le32(0) ++ le32(54) ++ // file header
      le32(40) ++ le32(w) ++ le32(h) ++ Array[Byte](1, 0, 24, 0)

  private def jpeg(w: Int, h: Int): Array[Byte] =
    Array[Byte](0xff.toByte, 0xd8.toByte) ++                          // SOI
      Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++ new Array[Byte](14) ++ // APP0
      Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(17) ++            // SOF0
      Array[Byte](8) ++ be16(h) ++ be16(w) ++ new Array[Byte](10)

  private def wav(rate: Int, dataLen: Int): Array[Byte] = {
    val byteRate = rate * 2 // mono 16-bit
    "RIFF".getBytes ++ le32(36 + dataLen) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(rate) ++ le32(byteRate) ++ le16(2) ++ le16(16) ++
      "data".getBytes ++ le32(dataLen) ++ new Array[Byte](dataLen)
  }

  test("png/gif/bmp dimensions parse byte-exact") {
    assert(MediaHeaders.parseImage(png(1920, 1080)) ==
      Some(MediaHeaders.ImageMeta("png", 1920, 1080)))
    assert(MediaHeaders.parseImage(gif(320, 200)) ==
      Some(MediaHeaders.ImageMeta("gif", 320, 200)))
    assert(MediaHeaders.parseImage(bmp(800, 600)) ==
      Some(MediaHeaders.ImageMeta("bmp", 800, 600)))
  }

  test("jpeg SOF marker scan finds the frame header past APP segments") {
    assert(MediaHeaders.parseImage(jpeg(640, 480)) ==
      Some(MediaHeaders.ImageMeta("jpeg", 640, 480)))
    // truncated stream: no SOF → no parse, no crash
    assert(MediaHeaders.parseImage(Array[Byte](0xff.toByte, 0xd8.toByte)) == None)
  }

  test("wav sample rate and duration from the chunk walk") {
    val b = wav(44100, 88200) // 1 second of mono 16-bit
    assert(MediaHeaders.parseWav(b) ==
      Some(MediaHeaders.AudioMeta("wav", 44100, 1000L)))
    assert(MediaHeaders.parseWav("RIFFxxxx".getBytes) == None)
  }

  test("malformed containers terminate: oversized RIFF chunk, fill-byte " +
    "JPEG, top-down BMP") {
    // a RIFF chunk claiming 0xFFFFFFF8 bytes must end the walk, not spin
    // the cursor in place forever
    val evil = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ Array[Byte](0xf8.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte) ++
      new Array[Byte](8)
    assert(MediaHeaders.parseWav(evil).isEmpty, "no fmt chunk reachable → None")

    // spec-valid JPEG with 0xFF fill bytes before the SOF marker
    val filled: Array[Byte] =
      Array[Byte](0xff.toByte, 0xd8.toByte) ++
        Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte, 0xc0.toByte) ++ be16(17) ++
        Array[Byte](8) ++ be16(480) ++ be16(640) ++ new Array[Byte](10)
    assert(MediaHeaders.parseImage(filled).contains(
      MediaHeaders.ImageMeta("jpeg", 640, 480)))

    // top-down BMP stores a negative biHeight; libraries report magnitude
    assert(MediaHeaders.parseImage(bmp(640, -480)).contains(
      MediaHeaders.ImageMeta("bmp", 640, 480)))
  }

  test("decodeMeta prefers the real parse; non-media falls back to the stub") {
    val (w, h, _, _) = Multimodal.decodeMeta(png(12, 34), "image")
    assert((w, h) == (12, 34), "real header wins")
    val (_, _, sr, dur) = Multimodal.decodeMeta(wav(16000, 32000), "audio")
    assert(sr == 16000 && dur == 1000L)
    val stub = Multimodal.decodeMeta("not an image".getBytes, "image")
    assert(stub == Multimodal.decodeMeta("not an image".getBytes, "image"),
      "stub fallback stays deterministic for the synthetic corpus")
  }
}
