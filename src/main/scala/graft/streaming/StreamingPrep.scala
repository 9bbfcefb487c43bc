package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The corpus-prep admission pipeline on INGEST — the streaming form of
  * the batch `pl_corpus_prep` funnel, so a crawl feed is scrubbed,
  * filtered, deduped, decontaminated, and classifier-gated document by
  * document instead of by corpus rewrite.
  *
  * Spark-first shape: every stateless stage (scrub, Gopher rules,
  * classifier, content key, gram hashes) is literally the batch
  * catalog's `PrepPipelineCatalog.admissionFlags` applied to the
  * micro-batch — batch and stream CANNOT drift because they share the
  * column expressions. The two corpus-dependent stages translate as:
  *  - decontamination: the benchmark gram index is collected once at
  *    stream construction (bounded by the BENCHMARK, thousands of docs
  *    however big the corpus) and broadcast; membership runs inside the
  *    map stage — no join, no shuffle, no second stateful operator;
  *  - exact dedup: the only stateful step — `flatMapGroupsWithState`
  *    keyed on the content hash with a Boolean per seen hash (16 B/key,
  *    the StreamingDedup state discipline). Within a micro-batch the
  *    lowest qualifying doc_id is canonical (the batch min-id contract);
  *    across batches the state marks the hash as taken. Docs that fail
  *    the filter carry a unique sentinel key, so they never claim or
  *    consume dedup state.
  *
  * Verdicts are deterministic per (state, batch) and state only ever
  * moves false→true, so at-least-once replays re-emit identical rows —
  * idempotent sinks converge.
  */
object StreamingPrep {

  case class PrepDoc(doc_id: Long, text: String, lang: String, source: String)

  /** stage ∈ filtered | duplicate | contaminated | rejected_clf | admitted
    * — the first gate the doc failed, in funnel order. */
  case class PrepVerdict(doc_id: Long, source: String, stage: String,
      pii_total: Long, n_words: Long)

  /** Internal row shape between the stateless pass and the dedup step
    * (public: Spark's generated deserializer must construct it). */
  case class FlagRow(doc_id: Long, source: String, pii_total: Long,
      n_words: Long, pass_filter: Boolean, clf_keep: Boolean,
      contaminated: Boolean, content_hash: Long)

  /** `evalGrams`: the benchmark's distinct 3-gram hashes (the collected
    * form of pl_corpus_prep's broadcast index).
    * `retention`: evict a content hash after this much processing time
    * without a sighting (None = keep forever). Same lifecycle contract as
    * `StreamingDedup.dedupStream`: the timeout refreshes on EVERY
    * sighting, so circulating content stays deduped and only hashes
    * silent for a full `retention` age out — after which a fresh copy
    * re-enters the funnel as canonical (bounded state traded for the
    * rolling-window duplicate rate). Replays restart from the
    * checkpointed state+timer, so verdicts replay identically (ST4). */
  def prepStream(stream: Dataset[PrepDoc], evalGrams: Array[Long],
      contaminationFloor: Int = 2,
      retention: Option[scala.concurrent.duration.FiniteDuration] = None)
      : Dataset[PrepVerdict] = {
    val s = stream.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(evalGrams.toSet)
    val overlapUdf = udf((g: Seq[Long]) => g.count(bc.value.contains).toLong)
    val timeoutConf =
      if (retention.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    val flags = graft.catalog.PrepPipelineCatalog
      .admissionFlags(stream.toDF().withColumnRenamed("text", "pii_text"))
      .withColumn("contaminated",
        overlapUdf(col("grams")) >= contaminationFloor)
      .select(col("doc_id"), col("source"), col("pii_total"), col("n_words"),
        col("pass_filter"), col("clf_keep"), col("contaminated"),
        col("content_hash"))
      .as[FlagRow]
    flags.groupByKey(_.content_hash)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (hash: Long, rows: Iterator[FlagRow], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
          val docs = rows.toArray.sortBy(_.doc_id)
          val taken = state.exists
          // canonical = lowest-id filter survivor of an unseen hash; mark
          // the hash taken whenever any survivor carried it (the batch
          // funnel's n_unique contract: duplicates drop regardless of
          // whether the canonical doc later fails a downstream gate)
          val canonicalId =
            if (taken) None else docs.find(_.pass_filter).map(_.doc_id)
          if (docs.exists(_.pass_filter) && !taken) state.update(true)
          if (state.exists)
            retention.foreach(r => state.setTimeoutDuration(r.toMillis))
          docs.iterator.map { r =>
            val stage =
              if (!r.pass_filter) "filtered"
              else if (!canonicalId.contains(r.doc_id)) "duplicate"
              else if (r.contaminated) "contaminated"
              else if (!r.clf_keep) "rejected_clf"
              else "admitted"
            PrepVerdict(r.doc_id, r.source, stage, r.pii_total, r.n_words)
          }
          }
      }
  }
}
