package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: images/audio/video as opaque `binary` payloads with
  * typed metadata, processed by batch-shaped per-partition operators.
  *
  * The Spark-side plumbing is real — schemas, partitioning, batch
  * iteration, feature vectors — and so is decode for everything the JVM
  * can read without an external library: container headers
  * (PNG/GIF/BMP/JPEG/WAV, [[MediaHeaders]]), pixel decode for
  * BMP/PNG/GIF/JPEG ([[MediaDecode.decodeImage]], JDK `javax.imageio`
  * for the compressed formats), WAV PCM-16 samples, uncompressed-AVI
  * video frames ([[MediaDecode.decodeAviFrames]]), and a real
  * nearest-neighbor resample. Only codec-LIBRARY work (compressed video
  * frames, compressed audio) is STUBBED with deterministic byte math —
  * this container ships no codecs. Each stub is marked; swapping it for a
  * real codec changes no plan shape. The design mirrors how a 100 TB
  * media pipeline runs:
  * opaque bytes flow through columnar storage untouched, codec work
  * happens once per partition batch (amortizing per-batch setup the way
  * `mapInPandas`/Arrow batches do in PySpark), and only small typed
  * features re-enter the relational plan.
  */
object Multimodal {

  /** One media asset: id, modality kind, raw payload, typed metadata. */
  case class MediaAsset(
      media_id: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      duration_ms: Long)

  case class MediaFeature(media_id: Long, kind: String, embedding: Array[Float])

  case class Frame(media_id: Long, frame_idx: Int, offset: Long, frame_bytes: Array[Byte])

  case class Resized(media_id: Long, out_width: Int, out_height: Int, n_bytes: Int)

  /** Decode metadata. REAL media containers (PNG/GIF/BMP/JPEG/WAV) are
    * parsed genuinely — [[MediaHeaders]] reads the dimensions/sample-rate
    * from the container header, byte-exact with what an image library
    * reports. Payloads that are not real media (the sandbox's synthetic
    * corpus) fall back to the deterministic STUB below, whose values the
    * DuckDB oracle reproduces from the portable hash family. Pixel/sample
    * decoding (not needed for metadata) is the only remaining stub. */
  def decodeMeta(bytes: Array[Byte], kind: String): (Int, Int, Int, Long) =
    (kind match {
      case "image" | "video" =>
        MediaHeaders.parseImage(bytes).map(m => (m.width, m.height, 0, 0L))
      case "audio" =>
        MediaHeaders.parseWav(bytes).map(m => (0, 0, m.sampleRate, m.durationMs))
      case _ => None
    }).getOrElse(stubMeta(bytes, kind))

  /** STUB fallback for non-media bytes: deterministic "metadata" from the
    * portable md5-family hash, value-reproducible in the oracle. */
  private def stubMeta(bytes: Array[Byte], kind: String): (Int, Int, Int, Long) = {
    val n = bytes.length
    val h = graft.functions.TextHashes.hash31(new String(bytes, "UTF-8"))
    kind match {
      case "image" => ((64 + h % 1024).toInt, (64 + (h / 1024) % 1024).toInt, 0, 0L)
      case "audio" => (0, 0, Seq(16000, 22050, 44100)((h % 3).toInt), n.toLong * 1000 / 32)
      case _       => ((320 + h % 640).toInt, (240 + (h / 640) % 480).toInt, 0, n.toLong * 40)
    }
  }

  /** Feature extractor: an 8-dim float embedding. For DECODABLE payloads
    * (BMP/PNG/GIF/JPEG pixels, WAV PCM-16 samples — [[MediaDecode]]) the
    * features are computed over the REAL decoded pixels/samples, which is
    * the honest analog of a model forward pass over decoded media; for
    * everything else the accumulation runs over raw payload bytes as a
    * marked STUB (stands in for codec + model; deterministic so tests and
    * the oracle can pin it — the synthetic corpus always takes this path). */
  def embed(bytes: Array[Byte], dims: Int = 8): Array[Float] = {
    MediaDecode.decodeImage(bytes) match {
      case Some(bm) => return accumulate(bm.rgb, dims)
      case None =>
    }
    MediaDecode.decodeWavPcm(bytes) match {
      case Some(pcm) =>
        val out = new Array[Float](dims)
        var i = 0
        while (i < pcm.samples.length) {
          out(i % dims) += math.abs(pcm.samples(i) / 32768.0f)
          i += 1
        }
        return out
      case None =>
    }
    accumulate(bytes, dims) // STUB path: raw payload bytes
  }

  private def accumulate(bytes: Array[Byte], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    var i = 0
    while (i < bytes.length) {
      out(i % dims) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Batch feature extraction as a per-partition operator: the "model" is
    * constructed once per partition (like a Pandas UDF loading weights once
    * per Arrow batch), then applied to every row in the batch. */
  def extractFeatures(assets: Dataset[MediaAsset], dims: Int = 8): Dataset[MediaFeature] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { batch =>
      // per-partition setup happens HERE (e.g. load a codec/model); the
      // stub's setup is trivially a no-op
      batch.map(a => MediaFeature(a.media_id, a.kind, embed(a.bytes, dims)))
    }
  }

  /** Frame sampling: one output row per sampled frame. A generator-shaped
    * flatMap — no shuffle, output proportional to frames kept.
    *
    * Payloads that parse as an UNCOMPRESSED AVI get REAL frames
    * ([[MediaDecode.decodeAviFrames]]): `stride` counts FRAMES (every
    * stride-th decoded frame emits), `offset` is the frame chunk's byte
    * position in the container, and `frame_bytes` is the decoded RGB.
    * Anything else falls back to the declared stub — a byte slice every
    * `stride` BYTES stands in for a decoded frame — which is now
    * confined to codec-compressed video. */
  def sampleFrames(assets: Dataset[MediaAsset], stride: Int, frameSize: Int): Dataset[Frame] = {
    val spark = assets.sparkSession
    import spark.implicits._
    // clamp once for BOTH branches: a zero/negative stride would throw in
    // Iterator.range on the stub path (the AVI path already clamped)
    val step = math.max(stride, 1)
    assets.filter(_.kind == "video").flatMap { a =>
      MediaDecode.decodeAviFrames(a.bytes) match {
        case Some(frames) =>
          frames.iterator.zipWithIndex
            .filter { case (_, i) => i % step == 0 }
            .zipWithIndex.map { case ((f, _), outIdx) =>
              Frame(a.media_id, outIdx, f.offset, f.bitmap.rgb)
            }
        case None =>
          Iterator.range(0, math.max(a.bytes.length, 1), step).zipWithIndex.map {
            case (off, idx) =>
              // STUB frame decode: a byte slice stands in for the frame
              Frame(a.media_id, idx, off.toLong,
                a.bytes.slice(off, math.min(off + frameSize, a.bytes.length)))
          }
      }
    }
  }

  /** Resize: target box per asset, aspect-preserving integer math. For
    * decodable payloads (BMP/PNG/GIF/JPEG) the resample is REAL —
    * nearest-neighbor over decoded pixels ([[MediaDecode.resizeNearest]]);
    * non-image payloads report the target geometry with the pixel pass
    * stubbed to a length calculation. */
  def resize(assets: Dataset[MediaAsset], maxSide: Int): Dataset[Resized] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(_.kind == "image").map { a =>
      val scale = math.min(1.0, maxSide.toDouble / math.max(math.max(a.width, a.height), 1))
      val (w, h) = (math.max(1, (a.width * scale).toInt), math.max(1, (a.height * scale).toInt))
      MediaDecode.decodeImage(a.bytes) match {
        case Some(bm) =>
          val out = MediaDecode.resizeNearest(bm, w, h)
          Resized(a.media_id, out.width, out.height, out.rgb.length)
        case None =>
          // STUB pixel resample: output size = w*h*3 (RGB), bytes untouched
          Resized(a.media_id, w, h, w * h * 3)
      }
    }
  }

  /** 60-bit difference hash (dHash) — the perceptual fingerprint for image
    * near-dup detection. Real images (BMP/PNG/GIF/JPEG) decode via
    * [[MediaDecode.decodeImage]], resample to a 7-wide × 10-tall grayscale
    * grid with the same nearest-neighbor kernel the resize operator uses,
    * and each bit records whether brightness rises between horizontal
    * neighbors (6 diffs × 10 rows = 60 bits). Non-decodable payloads (the
    * synthetic corpus) derive the grid from the raw bytes with the
    * declared deterministic STUB the DuckDB oracle reproduces —
    * grid[i] = bytes[i mod len]. 60 bits rather than the textbook 64
    * keeps the fingerprint in the sign-safe positive-BIGINT family shared
    * with simhash60, so the same 4×15-bit LSH band split serves both
    * (dd_simhash_pairs / dd_phash_pairs). */
  def dhash60(bytes: Array[Byte]): Long = {
    val gw = 7; val gh = 10
    val grid: Array[Int] = MediaDecode.decodeImage(bytes) match {
      case Some(bm) => grayGrid(bm, gw, gh)
      case None =>
        if (bytes.isEmpty) new Array[Int](gw * gh)
        else Array.tabulate(gw * gh)(i => bytes(i % bytes.length) & 0xff)
    }
    dhashOfGrid(grid, gw, gh)
  }

  /** Grayscale gw×gh resample of a decoded bitmap (shared by the image
    * dHash and the per-frame video hash). */
  private def grayGrid(bm: MediaDecode.Bitmap, gw: Int, gh: Int): Array[Int] = {
    val small = MediaDecode.resizeNearest(bm, gw, gh)
    Array.tabulate(gw * gh) { i =>
      ((small.rgb(i * 3) & 0xff) + (small.rgb(i * 3 + 1) & 0xff) +
        (small.rgb(i * 3 + 2) & 0xff)) / 3
    }
  }

  private def dhashOfGrid(grid: Array[Int], gw: Int, gh: Int): Long = {
    var h = 0L
    var y = 0
    while (y < gh) {
      var x = 0
      while (x < gw - 1) {
        if (grid(y * gw + x + 1) > grid(y * gw + x)) h |= 1L << (y * 6 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** 60-bit dHash of one already-decoded frame bitmap. */
  def dhash60Frame(bm: MediaDecode.Bitmap): Long =
    dhashOfGrid(grayGrid(bm, 7, 10), 7, 10)

  /** Column form of [[dhash60]] over a text-payload column (UTF-8 bytes —
    * the synthetic corpus path; real pipelines apply it to the binary
    * payload column directly). */
  val dhash60Udf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((s: String) => if (s == null) 0L else dhash60(s.getBytes("UTF-8")))

  /** 60-bit audio energy-envelope fingerprint — the audio leg of the
    * near-dup family (dd_afp_pairs), structured after the Haitsma-Kalker
    * sign-of-energy-difference hash (A Highly Robust Audio Fingerprinting
    * System, ISMIR 2002) with a time-domain energy envelope standing in
    * for spectral bands (no FFT dependency in this sandbox). Real WAVs
    * ([[MediaDecode.decodeWavPcm]]) split into 11 equal frames × 6
    * sub-band windows; each cell is the mean |amplitude| of its window,
    * and bit (t,b) records whether band b's energy RISES from frame t to
    * frame t+1 (6 bands × 10 transitions = 60 bits). The temporal diff —
    * vs dHash's spatial diff — is what makes it level-invariant-ish and
    * genuinely a different fingerprint from the image hash on the same
    * bytes. Non-decodable payloads (the synthetic corpus) use the same
    * declared byte-grid STUB family as [[dhash60]]: cell i = bytes[i mod
    * len], reproduced by the DuckDB oracle. 60 bits keeps it in the
    * positive-BIGINT family the shared 4×15-bit LSH band split serves. */
  def afp60(bytes: Array[Byte]): Long = {
    val frames = 11; val bands = 6
    val e: Array[Double] = MediaDecode.decodeWavPcm(bytes) match {
      case Some(p) if p.samples.nonEmpty =>
        val cells = frames * bands
        Array.tabulate(cells) { i =>
          val lo = (i.toLong * p.samples.length / cells).toInt
          val hi = math.max(lo + 1, ((i + 1).toLong * p.samples.length / cells).toInt)
          var acc = 0.0; var k = lo
          while (k < hi) { acc += math.abs(p.samples(k) / 32768.0); k += 1 }
          acc / (hi - lo)
        }
      case _ =>
        if (bytes.isEmpty) new Array[Double](frames * bands)
        else Array.tabulate(frames * bands)(i => (bytes(i % bytes.length) & 0xff).toDouble)
    }
    var h = 0L
    var t = 0
    while (t < frames - 1) {
      var b = 0
      while (b < bands) {
        if (e((t + 1) * bands + b) > e(t * bands + b)) h |= 1L << (t * bands + b)
        b += 1
      }
      t += 1
    }
    h
  }

  /** Column form of [[afp60]] over a text-payload column (UTF-8 bytes —
    * the synthetic corpus path; real pipelines apply it to the binary
    * payload column directly). */
  val afp60Udf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((s: String) => if (s == null) 0L else afp60(s.getBytes("UTF-8")))

  /** Distinct per-frame content hashes of a video payload — the
    * fingerprint set for frame-level video matching (dd_video_pairs, the
    * content-ID shape: two videos near-duplicate iff they SHARE frames,
    * however the surrounding footage is cut). Real uncompressed AVIs
    * ([[MediaDecode.decodeAviFrames]]) hash each decoded frame with the
    * image dHash ([[dhash60Frame]]) so re-encoded-but-visually-identical
    * frames collide. Non-decodable payloads derive frames from the SAME
    * sampling grid as mm_frame_sample (16-byte windows at 50-byte
    * stride) hashed with the portable 64-bit hash, reproduced by the
    * DuckDB oracle. Set semantics: a frame repeated within one video
    * counts once. */
  def frameHashes(bytes: Array[Byte]): Array[Long] = {
    val hs: Seq[Long] = MediaDecode.decodeAviFrames(bytes) match {
      case Some(frames) if frames.nonEmpty =>
        frames.map(f => dhash60Frame(f.bitmap))
      case _ =>
        if (bytes.isEmpty) Seq.empty
        else (0 until bytes.length by 50).map { off =>
          val len = math.min(16, bytes.length - off)
          graft.functions.TextHashes.hash64(
            new String(bytes, off, len, java.nio.charset.StandardCharsets.UTF_8))
        }
    }
    hs.distinct.toArray
  }

  /** Column form of [[frameHashes]] over a text-payload column. */
  val frameHashesUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((s: String) => if (s == null) Array.empty[Long]
      else frameHashes(s.getBytes("UTF-8")))

  /** Build a deterministic media table from the documents table: the text
    * bytes stand in for the opaque payload; modality round-robins by id.
    * (The synthetic corpus has no real media; everything downstream only
    * sees `binary` + metadata, exactly as with real payloads.) */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaAsset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .map { r =>
        val id = r.getLong(0)
        val bytes = r.getString(1).getBytes("UTF-8")
        val kind = Seq("image", "audio", "video")((id % 3).toInt)
        val (w, h, sr, dur) = decodeMeta(bytes, kind)
        MediaAsset(id, kind, bytes, w, h, sr, dur)
      }
  }
}
