package graft.catalog

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal
import graft.functions.PortableHash

/** Multimodal-column operators over synthesized binary payloads (see
  * graft.operators.Multimodal — the codecs are deterministic stubs, the
  * Spark plumbing is real). Every query here is oracle-checked: the stub
  * math is built on the portable md5 hash family, so DuckDB reproduces
  * metadata, frame sampling, and resize values exactly; the float
  * embedding is compared at 3dp to absorb float-vs-double accumulation.
  */
object MultimodalCatalog extends Catalog {

  private val P = PortableHash.Mersenne31
  private def hSql = s"(('0x' || substr(md5(text), 1, 15))::BIGINT % $P)"
  private val kindSql = "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"

  /** DuckDB mirror of [[Multimodal.dhash60]]'s STUB grid path — the 7×10
    * byte grid grid[i] = bytes[i mod len] — valid for ASCII payloads where
    * substr-per-char equals byte indexing (both phash queries filter to
    * ASCII for exactly this reason; real images take the decode path,
    * spec-verified in MultimodalSpec with real BMPs). */
  val DhashGridSql: String =
    """list_transform(range(0, 70), i ->
         CASE WHEN octet_length(encode(text)) = 0 THEN 0
         ELSE ord(substr(text, CAST(i % octet_length(encode(text)) AS INT) + 1, 1)) END)"""

  /** Packs a `grid` list column into the 60-bit dHash (6 horizontal
    * brightness diffs × 10 rows; 1-based list indexing). */
  val Dhash60FromGridSql: String =
    """CAST(list_sum(list_transform(range(0, 60), b ->
         CASE WHEN grid[CAST((b // 6) * 7 + (b % 6) AS INT) + 2]
                 > grid[CAST((b // 6) * 7 + (b % 6) AS INT) + 1]
         THEN CAST(pow(2.0, b) AS BIGINT) ELSE 0 END)) AS BIGINT)"""

  /** The audio fingerprint's 66-cell stub energy grid (11 frames × 6
    * bands; same bytes[i mod len] family as [[DhashGridSql]]). */
  val AfpGridSql: String =
    """list_transform(range(0, 66), i ->
         CASE WHEN octet_length(encode(text)) = 0 THEN 0
         ELSE ord(substr(text, CAST(i % octet_length(encode(text)) AS INT) + 1, 1)) END)"""

  /** Packs the energy grid into the 60-bit audio fingerprint: bit (t,b)
    * set iff band b's energy rises from frame t to t+1 (TEMPORAL diff —
    * grid cell t*6+b, 1-based list indexing). */
  val Afp60FromGridSql: String =
    """CAST(list_sum(list_transform(range(0, 60), b ->
         CASE WHEN grid[CAST((b // 6 + 1) * 6 + (b % 6) AS INT) + 1]
                 > grid[CAST((b // 6) * 6 + (b % 6) AS INT) + 1]
         THEN CAST(pow(2.0, b) AS BIGINT) ELSE 0 END)) AS BIGINT)"""

  def queries: Map[String, QFn] = Map(

    // ── decode: opaque bytes → typed metadata row ──
    "mm_metadata" -> ((s, d) => {
      import s.implicits._
      Multimodal.mediaFromDocuments(Tables.documents(s, d))
        .map(a => (a.media_id, a.kind, a.bytes.length, a.width, a.height,
          a.sample_rate, a.duration_ms))
        .toDF("media_id", "kind", "n_bytes", "width", "height",
          "sample_rate", "duration_ms")
        .orderBy("media_id")
    }),

    // ── frame sampling: generator over the video payloads ──
    "mm_frame_sample" -> ((s, d) => {
      import s.implicits._
      Multimodal.sampleFrames(
        Multimodal.mediaFromDocuments(Tables.documents(s, d)),
        stride = 50, frameSize = 16)
        .map(f => (f.media_id, f.frame_idx, f.offset, f.frame_bytes.length))
        .toDF("media_id", "frame_idx", "offset", "frame_len")
        .orderBy("media_id", "frame_idx")
    }),

    // ── aspect-preserving resize plumbing over the image payloads ──
    "mm_resize" -> ((s, d) => {
      import s.implicits._
      Multimodal.resize(
        Multimodal.mediaFromDocuments(Tables.documents(s, d)), maxSide = 256)
        .toDF().orderBy("media_id")
    }),

    // ── perceptual hash: 60-bit dHash per image asset, the fingerprint
    // dd_phash_pairs bands for image near-dup detection. Pure map-side
    // per-asset compute — the hash is 8 bytes however large the image,
    // which is what makes image dedup feasible at 100 TB: only
    // fingerprints ever reach a shuffle. ASCII filter: see DhashGridSql. ──
    "mm_phash" -> ((s, d) => {
      import s.implicits._
      val ascii = Tables.documents(s, d).filter(col("text").rlike("^[\\x00-\\x7F]*$"))
      Multimodal.mediaFromDocuments(ascii)
        .filter(_.kind == "image")
        .map(a => (a.media_id, Multimodal.dhash60(a.bytes)))
        .toDF("media_id", "phash")
        .orderBy("media_id")
    }),

    // ── audio fingerprint: 60-bit energy-envelope hash per audio asset,
    // the fingerprint dd_afp_pairs bands for audio near-dup detection.
    // Same map-side economics as mm_phash: 8 bytes per asset regardless
    // of duration, so only fingerprints ever reach a shuffle. ──
    "mm_afp" -> ((s, d) => {
      import s.implicits._
      val ascii = Tables.documents(s, d).filter(col("text").rlike("^[\\x00-\\x7F]*$"))
      Multimodal.mediaFromDocuments(ascii)
        .filter(_.kind == "audio")
        .map(a => (a.media_id, Multimodal.afp60(a.bytes)))
        .toDF("media_id", "afp")
        .orderBy("media_id")
    }),

    // ── video fingerprint: the distinct per-frame content-hash set per
    // video asset (frame count + min hash as the row digest). The frame
    // hashes are what dd_video_pairs equi-joins for frame-level match —
    // set-sized output per asset, so like mm_phash/mm_afp only
    // fingerprints ever shuffle. ──
    "mm_vhash" -> ((s, d) => {
      import s.implicits._
      // empty payloads are excluded rather than emitted as (id, 0, 0):
      // the oracle's frame CTE naturally drops zero-frame assets, and a
      // frameless "video" has no fingerprint to report
      val ascii = Tables.documents(s, d)
        .filter(col("text").rlike("^[\\x00-\\x7F]*$") && length(col("text")) > 0)
      Multimodal.mediaFromDocuments(ascii)
        .filter(_.kind == "video")
        .map(a => {
          val fh = Multimodal.frameHashes(a.bytes)
          (a.media_id, fh.length.toLong, if (fh.isEmpty) 0L else fh.min)
        })
        .toDF("media_id", "n_frames", "min_frame_hash")
        .orderBy("media_id")
    }),

    // ── batch feature extraction → embedding head. The oracle folds the
    // same bytes in double (ASCII-only rows so text chars == bytes); the
    // engine-side fold here is double too, same order, so floor(3dp) is
    // bit-identical. extractFeatures (the float production path) is
    // covered by MultimodalSpec. ──
    "mm_embed" -> ((s, d) => {
      import s.implicits._
      val ascii = Tables.documents(s, d).filter(col("text").rlike("^[\\x00-\\x7F]*$"))
      Multimodal.mediaFromDocuments(ascii)
        .mapPartitions(_.map { a =>
          val acc = new Array[Double](8)
          var i = 0
          while (i < a.bytes.length) {
            acc(i % 8) += (a.bytes(i) & 0xff) / 255.0
            i += 1
          }
          (a.media_id, math.floor(acc(0) * 1000) / 1000, math.floor(acc(7) * 1000) / 1000)
        })
        .toDF("media_id", "dim0", "dim7")
        .orderBy("media_id")
    }),

    // ── Cross-modal alignment score — the LAION/DataComp admission gate
    // (Schuhmann 2022: keep a (caption, image) pair iff CLIP cosine
    // clears a threshold), with both towers deterministic stand-ins for
    // the missing model: the media tower is mm_embed's 8-dim byte-fold,
    // the text tower an 8-bucket word-hash count vector (the tx_dsir
    // hashing trick at dimension 8). The Spark shape is what matters at
    // 100 TB: both towers derive map-side next to the scan, the cosine
    // reduces over (doc × 8)-row frames joined on an 8-byte composite
    // key, and nothing corpus-sized is ever broadcast — swap either
    // tower's derivation for a real model UDF and the plan is unchanged.
    "mm_modal_align" -> ((s, d) =>
      alignScores(s, d)
        .select(col("doc_id").as("media_id"), col("align_score"))
        .withColumn("aligned", col("align_score") >= 0.85)
        .orderBy(col("media_id"))))

  /** (doc_id, align_score) cross-modal cosine frame over the non-empty
    * ASCII domain — mm_modal_align's core, shared with the composed
    * pl_media_prep funnel so "aligned" means one thing everywhere. */
  private[graft] def alignScores(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val ascii = Tables.documents(s, d)
      .filter(col("text").rlike("^[\\x00-\\x7F]*$") && length(col("text")) > 0)
    val media = Multimodal.mediaFromDocuments(ascii)
      .mapPartitions(_.flatMap { a =>
        val acc = new Array[Double](8)
        var i = 0
        while (i < a.bytes.length) {
          acc(i % 8) += (a.bytes(i) & 0xff) / 255.0
          i += 1
        }
        (0 until 8).map(k => (a.media_id, k.toLong, acc(k)))
      })
      .toDF("doc_id", "k", "mv")
    val text = ascii
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn("k", pmod(
        PortableHash.hash64(concat(lit("align:"), col("w"))), lit(8L)))
      .groupBy(col("doc_id"), col("k"))
      .agg(count(lit(1)).cast("double").as("tc"))
    // single pass: the media tower emits ALL 8 k-rows per asset, so a
    // left join from it carries every term of both norms AND the dot
    // product through ONE (doc_id, k) frame — each tower derives (and
    // scans documents) exactly once, where the dots/tnorm/mnorm three-join
    // form re-derived each tower per consumer (plan-pinned in
    // PlanAuditSpec: three live documents scans for the whole funnel).
    // Missing text buckets contribute exact 0.0 terms, so the double sums
    // are the same multisets as the per-tower form
    media.join(text, Seq("doc_id", "k"), "left_outer")
      .select(col("doc_id"), coalesce(col("tc"), lit(0.0)).as("tc"), col("mv"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tc") * col("mv")).as("dp"),
        sqrt(sum(col("tc") * col("tc"))).as("tnorm"),
        sqrt(sum(col("mv") * col("mv"))).as("mnorm"))
      .select(col("doc_id"),
        round(col("dp") / (col("tnorm") * col("mnorm")), 6).as("align_score"))
  }

  def oracle: Map[String, String] = Map(
    "mm_metadata" ->
      s"""SELECT doc_id AS media_id, $kindSql AS kind,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           CAST(CASE doc_id % 3 WHEN 0 THEN 64 + $hSql % 1024
                WHEN 1 THEN 0 ELSE 320 + $hSql % 640 END AS INT) AS width,
           CAST(CASE doc_id % 3 WHEN 0 THEN 64 + ($hSql // 1024) % 1024
                WHEN 1 THEN 0 ELSE 240 + ($hSql // 640) % 480 END AS INT) AS height,
           CAST(CASE doc_id % 3 WHEN 1 THEN ([16000, 22050, 44100])[CAST($hSql % 3 AS INT) + 1]
                ELSE 0 END AS INT) AS sample_rate,
           CAST(CASE doc_id % 3 WHEN 0 THEN 0
                WHEN 1 THEN octet_length(encode(text)) * 1000 // 32
                ELSE octet_length(encode(text)) * 40 END AS BIGINT) AS duration_ms
         FROM documents ORDER BY media_id""",
    "mm_frame_sample" ->
      """SELECT doc_id AS media_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY off) - 1 AS INT) AS frame_idx,
           CAST(off AS BIGINT) AS offset,
           CAST(least(16, octet_length(encode(text)) - off) AS INT) AS frame_len
         FROM (SELECT doc_id, text, unnest(range(0, greatest(octet_length(encode(text)), 1), 50)) AS off
               FROM documents WHERE doc_id % 3 = 2)
         ORDER BY media_id, frame_idx""",
    "mm_resize" ->
      s"""WITH img AS (
           SELECT doc_id AS media_id,
             CAST(64 + $hSql % 1024 AS INT) AS w,
             CAST(64 + ($hSql // 1024) % 1024 AS INT) AS h
           FROM documents WHERE doc_id % 3 = 0),
         scaled AS (
           SELECT media_id,
             greatest(1, CAST(floor(w * least(1.0, 256.0 / greatest(w, h))) AS INT)) AS out_width,
             greatest(1, CAST(floor(h * least(1.0, 256.0 / greatest(w, h))) AS INT)) AS out_height
           FROM img)
         SELECT media_id, out_width, out_height,
           CAST(out_width * out_height * 3 AS INT) AS n_bytes
         FROM scaled ORDER BY media_id""",
    "mm_phash" ->
      s"""WITH img AS (SELECT doc_id, $DhashGridSql AS grid FROM documents
           WHERE doc_id % 3 = 0 AND regexp_matches(text, '^[\\x00-\\x7F]*$$'))
         SELECT doc_id AS media_id, $Dhash60FromGridSql AS phash
         FROM img ORDER BY media_id""",
    "mm_afp" ->
      s"""WITH aud AS (SELECT doc_id, $AfpGridSql AS grid FROM documents
           WHERE doc_id % 3 = 1 AND regexp_matches(text, '^[\\x00-\\x7F]*$$'))
         SELECT doc_id AS media_id, $Afp60FromGridSql AS afp
         FROM aud ORDER BY media_id""",
    "mm_vhash" ->
      s"""WITH vid AS (SELECT doc_id, text FROM documents
           WHERE doc_id % 3 = 2 AND regexp_matches(text, '^[\\x00-\\x7F]*$$')),
         fr AS (SELECT doc_id, text,
             unnest(range(0, octet_length(encode(text)), 50)) AS off FROM vid),
         fh AS (SELECT DISTINCT doc_id,
             ${PortableHash.hash64Sql("substr(text, CAST(off AS INT) + 1, 16)")} AS fh
           FROM fr)
         SELECT doc_id AS media_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
           MIN(fh) AS min_frame_hash
         FROM fh GROUP BY doc_id ORDER BY media_id""",
    "mm_embed" ->
      """SELECT doc_id AS media_id,
           floor(list_sum(list_transform(
             generate_series(1, octet_length(encode(text))),
             i -> CASE WHEN (i - 1) % 8 = 0 THEN ord(substr(text, i, 1)) / 255.0 ELSE 0 END)) * 1000) / 1000 AS dim0,
           floor(list_sum(list_transform(
             generate_series(1, octet_length(encode(text))),
             i -> CASE WHEN (i - 1) % 8 = 7 THEN ord(substr(text, i, 1)) / 255.0 ELSE 0 END)) * 1000) / 1000 AS dim7
         FROM documents WHERE regexp_matches(text, '^[\x00-\x7F]*$')
         ORDER BY media_id""",
    "mm_modal_align" ->
      s"""WITH $AlignScoreCte
         SELECT doc_id AS media_id, align_score, align_score >= 0.85 AS aligned
         FROM sc ORDER BY media_id""")

  /** DuckDB CTE chain producing `sc(doc_id, align_score)` — the oracle
    * twin of [[alignScores]], shared by mm_modal_align and pl_media_prep.
    * CTE names (a/t/m/dp/tn/mn/sc) are disjoint from
    * DedupCatalog.MediaComponentsCte's so the two compose in one WITH. */
  private[graft] lazy val AlignScoreCte: String = {
    val wb = PortableHash.hash64Sql("'align:' || w")
    s"""a AS (SELECT doc_id, text FROM documents
           WHERE regexp_matches(text, '^[\\x00-\\x7F]*$$') AND length(text) > 0),
         t AS (SELECT doc_id, $wb % 8 AS k, CAST(COUNT(*) AS DOUBLE) AS tc
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM a)
           GROUP BY 1, 2),
         m AS (SELECT doc_id, u.k AS k,
             list_sum(list_transform(generate_series(1, length(text)),
               i -> CASE WHEN (i - 1) % 8 = u.k
                    THEN ord(substr(text, CAST(i AS INT), 1)) / 255.0
                    ELSE 0 END)) AS mv
           FROM a, generate_series(0, 7) AS u(k)),
         dp AS (SELECT t.doc_id, SUM(tc * mv) AS dp
           FROM t JOIN m ON t.doc_id = m.doc_id AND t.k = m.k GROUP BY 1),
         tn AS (SELECT doc_id, sqrt(SUM(tc * tc)) AS tnorm FROM t GROUP BY 1),
         mn AS (SELECT doc_id, sqrt(SUM(mv * mv)) AS mnorm FROM m GROUP BY 1),
         sc AS (SELECT tn.doc_id,
             round(COALESCE(dp.dp, 0) / (tn.tnorm * mn.mnorm), 6) AS align_score
           FROM tn JOIN mn ON tn.doc_id = mn.doc_id
           LEFT JOIN dp ON tn.doc_id = dp.doc_id)"""
  }
}
