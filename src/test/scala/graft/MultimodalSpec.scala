package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal._

/** Multimodal plumbing tests: deterministic stub decode, batch feature
  * extraction shape, frame sampling arithmetic, resize invariants. */
class MultimodalSpec extends AnyFunSuite with SparkSpec {

  def asset(id: Long, kind: String, payload: String): MediaAsset = {
    val bytes = payload.getBytes("UTF-8")
    val (w, h, sr, dur) = decodeMeta(bytes, kind)
    MediaAsset(id, kind, bytes, w, h, sr, dur)
  }

  test("stub decode is deterministic and kind-shaped") {
    val a1 = decodeMeta("payload".getBytes, "image")
    assert(a1 == decodeMeta("payload".getBytes, "image"))
    assert(a1._1 >= 64 && a1._2 >= 64 && a1._3 == 0)
    val au = decodeMeta("payload".getBytes, "audio")
    assert(Seq(16000, 22050, 44100).contains(au._3))
    val v = decodeMeta("payload".getBytes, "video")
    assert(v._4 == "payload".getBytes.length.toLong * 40)
  }

  test("feature extraction: batch operator keeps ids and emits fixed dims") {
    import spark.implicits._
    val assets = spark.createDataset(Seq(
      asset(1, "image", "aaaa"), asset(2, "audio", "bbbb"), asset(3, "video", "cc")))
    val feats = Multimodal.extractFeatures(assets, dims = 8).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats.keySet == Set(1L, 2L, 3L))
    assert(feats.values.forall(_.embedding.length == 8))
    // deterministic: 'a' = 97 → dim0 gets bytes 0 and... "aaaa": idx 0→d0,1→d1,2→d2,3→d3
    assert(math.abs(feats(1L).embedding(0) - 97 / 255.0f) < 1e-6)
    assert(feats(1L).embedding(4) == 0.0f)
  }

  test("frame sampling: stride arithmetic and tail clamp") {
    import spark.implicits._
    val assets = spark.createDataset(Seq(asset(9, "video", "x" * 120), asset(10, "image", "y")))
    val frames = Multimodal.sampleFrames(assets, stride = 50, frameSize = 16).collect()
    assert(frames.forall(_.media_id == 9), "only video assets sample frames")
    assert(frames.map(_.offset).toSeq.sorted == Seq(0L, 50L, 100L))
    val tail = frames.find(_.offset == 100L).get
    assert(tail.frame_bytes.length == 16)
    val clamped = Multimodal.sampleFrames(
      spark.createDataset(Seq(asset(9, "video", "x" * 110))), 50, 16).collect()
    assert(clamped.find(_.offset == 100L).get.frame_bytes.length == 10, "tail frame clamps")
  }

  test("resize: aspect preserved, never upscales, floor of box") {
    import spark.implicits._
    val imgs = spark.createDataset(Seq(asset(1, "image", "abc"), asset(2, "image", "defg")))
    val out = Multimodal.resize(imgs, maxSide = 256).collect()
    val dims = imgs.collect().map(a => a.media_id -> (a.width, a.height)).toMap
    out.foreach { r =>
      val (w, h) = dims(r.media_id)
      assert(r.out_width <= 256 || w <= 256)
      assert(r.out_width <= w && r.out_height <= h, "no upscaling")
      assert(r.n_bytes == r.out_width * r.out_height * 3)
      // aspect ratio within integer-floor tolerance
      assert(math.abs(r.out_width.toDouble / r.out_height - w.toDouble / h) < 0.1)
    }
  }

  test("media table synthesis round-robins modality and keeps payload bytes") {
    import spark.implicits._
    val docs = Seq((0L, "zero"), (1L, "one"), (2L, "two")).toDF("doc_id", "text")
    val media = Multimodal.mediaFromDocuments(docs).collect().map(a => a.media_id -> a).toMap
    assert(media(0L).kind == "image" && media(1L).kind == "audio" && media(2L).kind == "video")
    assert(new String(media(2L).bytes, "UTF-8") == "two")
  }
}
