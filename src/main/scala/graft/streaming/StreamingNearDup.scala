package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Near-dup detection on ingest: each arriving document is checked
  * against the STANDING CORPUS's persisted MinHash fingerprint index —
  * the streaming form of `dd_incremental` (whose batch side documents the
  * index's construction), completing the pair: `StreamingDedup` drops
  * exact copies with 16 B/key state, this flags near-copies by probing
  * the banded index.
  *
  * Spark-first shape: a STREAM-STATIC LEFT OUTER equi-join on the band
  * key, then a per-document group step. The stream side carries only
  * (doc_id, shingle hashes, band_idx, band_val) — 4 band rows per
  * document however long the text — and the static side is the corpus
  * fingerprint index keyed (band_idx, band_val), exactly the table a
  * production pipeline maintains anyway. The LEFT join keeps documents
  * with zero band collisions, so every arriving doc emits a verdict.
  * The per-doc reduction (best qualifying corpus match) runs in
  * `flatMapGroupsWithState` — stateless in effect (nothing is stored;
  * stream doc_ids are unique), used because plain streaming groupBy
  * aggregation would demand a watermark this bounded per-batch
  * reduction doesn't need. At-least-once replays re-emit identical
  * verdicts (no state mutates), so idempotent sinks converge.
  *
  * At 100 TB the static index is the scale lever: 4 band rows per corpus
  * document (not documents), append-only as batches are admitted; the
  * stream never joins corpus text — the verify reads the candidate's
  * shingle hashes, bounded by band-collision counts.
  */
object StreamingNearDup {

  case class Doc(doc_id: Long, text: String)
  /** Per arriving doc: the matched corpus doc (lowest id ≥ threshold) or
    * None, plus the best Jaccard among qualifying candidates (0.0 when
    * none qualifies). */
  case class NearDupVerdict(doc_id: Long, dup_of: Option[Long], jaccard: Double)

  private val Mersenne31 = graft.functions.PortableHash.Mersenne31

  /** (doc_id, sh, band_idx, band_val) fingerprint rows for any document
    * frame — 4 LSH bands × 2 of 8 minhashes over 3-gram shingle hashes,
    * the dd_incremental banding. `sh` (the distinct shingle-hash array)
    * rides along for the verify step. */
  def fingerprintIndex(docs: DataFrame): DataFrame = {
    val mh = docs
      .withColumn("sh", graft.functions.TextHashes.shingleHashesUdf(col("text")))
      .withColumn("mh", graft.functions.TextHashes.minhashesUdf(8)(col("text")))
    mh.select(col("doc_id"), col("sh"),
        explode(array((0 until 4).map(k => struct(
          lit(k).as("band_idx"),
          (element_at(col("mh"), 2 * k + 1) * Mersenne31 +
            element_at(col("mh"), 2 * k + 2)).as("band_val"))): _*)).as("b"))
      .select(col("doc_id"), col("sh"),
        col("b.band_idx").as("band_idx"), col("b.band_val").as("band_val"))
  }

  /** The per-document reduction shared by the stream and batch forms:
    * dup_of = MIN qualifying corpus id (the batch dd_incremental
    * contract); jaccard = the max among qualifiers, as the reported
    * confidence. */
  private def verdictOf(newId: Long,
      rows: Iterator[(Long, Array[Long], Option[Long], Option[Array[Long]])],
      threshold: Double): NearDupVerdict = {
    var newSh: Set[Long] = null
    val seen = scala.collection.mutable.HashSet.empty[Long]
    var minId = Long.MaxValue
    var maxJ = 0.0
    rows.foreach { case (_, sh, oldId, oldSh) =>
      if (newSh == null) newSh = sh.toSet
      for (oid <- oldId; osh <- oldSh; if seen.add(oid)) {
        val oset = osh.toSet
        val inter = oset.count(newSh.contains)
        val j = inter.toDouble / (newSh.size + oset.size - inter)
        if (j >= threshold) {
          if (oid < minId) minId = oid
          if (j > maxJ) maxJ = j
        }
      }
    }
    NearDupVerdict(newId,
      if (minId != Long.MaxValue) Some(minId) else None, maxJ)
  }

  /** The candidate generation shared by both forms: band-key LEFT join
    * against the standing index (left keeps zero-collision docs so every
    * arriving doc gets a verdict). */
  private def candidates(docs: DataFrame, corpusIndex: DataFrame)
      : Dataset[(Long, Array[Long], Option[Long], Option[Array[Long]])] = {
    val s = docs.sparkSession
    import s.implicits._
    fingerprintIndex(docs)
      .withColumnRenamed("doc_id", "new_id")
      .withColumnRenamed("sh", "new_sh")
      .join(
        corpusIndex.select(col("doc_id").as("old_id"),
          col("sh").as("old_sh"), col("band_idx"), col("band_val")),
        Seq("band_idx", "band_val"), "left_outer")
      .select(col("new_id"), col("new_sh"), col("old_id"), col("old_sh"))
      .as[(Long, Array[Long], Option[Long], Option[Array[Long]])]
  }

  /** Stream of verdicts: one row per arriving doc per micro-batch. */
  def nearDupStream(stream: Dataset[Doc], corpusIndex: DataFrame,
      threshold: Double = 0.5): Dataset[NearDupVerdict] = {
    val s = stream.sparkSession
    import s.implicits._
    candidates(stream.toDF(), corpusIndex).groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (newId: Long,
         rows: Iterator[(Long, Array[Long], Option[Long], Option[Array[Long]])],
         state: GroupState[Boolean]) =>
          Iterator(verdictOf(newId, rows, threshold))
      }
  }

  /** Batch form: verdicts for one probe frame against one resolved index
    * snapshot — the foreachBatch shape a deployment uses when every
    * batch must RE-RESOLVE the standing store (so index maintenance —
    * compaction, vacuum — landing between batches is observed instead of
    * frozen out by a plan-time snapshot). Same candidate join and
    * reduction as the stream form; verdicts are identical for identical
    * (probe, index) inputs. */
  def nearDupBatch(docs: Dataset[Doc], corpusIndex: DataFrame,
      threshold: Double = 0.5): Dataset[NearDupVerdict] = {
    val s = docs.sparkSession
    import s.implicits._
    candidates(docs.toDF(), corpusIndex).groupByKey(_._1)
      .mapGroups((newId, rows) => verdictOf(newId, rows, threshold))
  }
}
