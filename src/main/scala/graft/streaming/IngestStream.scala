package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

import graft.records.{MasterRecord, UpdateMessage}

/** Streaming ingest (SURVEY.md §2.10; reference adsmp/tasks.py:113-198,
  * 317-337, run.py:103-232).
  *
  * The reference is a Celery topology: per-record messages land on queues,
  * a cron later selects changed records whose three core payloads
  * (bib_data, nonbib_data, orcid_claims) have all arrived, and late slots
  * (fulltext, metrics, augments) trigger a re-index — "a document will get
  * indexed twice; first with only metadata and later incl fulltext".
  *
  * Spark-first shape: one Structured Streaming query. `UpdateMessage`s are
  * grouped by bibcode into `flatMapGroupsWithState`, whose state is the
  * record's slot map. The gate (ST2) emits a master-record snapshot when
  * the record first becomes complete AND on every later slot arrival for an
  * already-complete record. Force mode (ST3) is a processing-time timeout:
  * a record stuck incomplete for `forceAfterMs` flushes if it has bib_data.
  * State is bounded per bibcode; the checksum gate downstream (P4) keeps
  * replays idempotent (ST4), so at-least-once delivery is safe.
  */
object IngestStream {

  /** Per-bibcode slot state: payload + arrival micros per slot, plus
    * whether the record has ever been emitted complete. */
  case class SlotState(
      payloads: Map[String, String],
      arrivals: Map[String, Long],
      everEmitted: Boolean)

  private val CoreSlots = Seq("bib_data", "nonbib_data", "orcid_claims")

  def toRecord(bibcode: String, st: SlotState): MasterRecord = {
    def p(s: String): Option[String] = st.payloads.get(s)
    def t(s: String): Option[Timestamp] = st.arrivals.get(s).map(new Timestamp(_))
    val updated = if (st.arrivals.isEmpty) None else Some(new Timestamp(st.arrivals.values.max))
    MasterRecord.empty(bibcode).copy(
      bib_data = p("bib_data"), nonbib_data = p("nonbib_data"),
      orcid_claims = p("orcid_claims"), fulltext = p("fulltext"),
      metrics = p("metrics"), augments = p("augments"),
      classifications = p("classifications"), boost_factors = p("boost_factors"),
      bib_data_updated = t("bib_data"), nonbib_data_updated = t("nonbib_data"),
      orcid_claims_updated = t("orcid_claims"), fulltext_updated = t("fulltext"),
      metrics_updated = t("metrics"), augments_updated = t("augments"),
      classifications_updated = t("classifications"),
      boost_factors_updated = t("boost_factors"),
      updated = updated)
  }

  /** The ST2/ST3 gate as a flatMapGroupsWithState function.
    *
    * Emission rule: a record emits when it is complete and changed, and —
    * once it has ever been emitted (including via force flush) — on every
    * later change, mirroring the reference where an already-indexed
    * record is re-indexed by the next cron whenever any slot updates.
    * State holds at most one entry per bibcode (bounded by corpus size,
    * like the reference's records table); incomplete entries keep a
    * re-armed force timeout so stragglers flush every cycle.
    */
  def gate(forceAfterMs: Long)(
      bibcode: String, msgs: Iterator[UpdateMessage],
      state: GroupState[SlotState]): Iterator[MasterRecord] = {
    val prev = state.getOption.getOrElse(SlotState(Map.empty, Map.empty, everEmitted = false))

    if (msgs.isEmpty && state.hasTimedOut) {
      // ST3 force flush: index whatever has bib_data. The timer is NOT
      // re-armed here: after a flush the data path re-emits on change, and
      // a bib-less record gets its timer back when its next message
      // arrives — re-arming unconditionally would give every dormant
      // record a perpetual no-op timer firing each cycle
      val flush = !prev.everEmitted && prev.payloads.contains("bib_data")
      if (flush) state.update(prev.copy(everEmitted = true))
      if (flush) Iterator.single(toRecord(bibcode, prev)) else Iterator.empty
    } else {
      // newest-wins within the batch per slot (same as MergeEngine.upsert).
      // A deleted-status message CLEARS its slot rather than storing a
      // null payload — a null entry would count toward completeness and
      // emit a record whose bib_data is Some(null), which the transform
      // NPEs on (the merge path already handles the same message as a
      // slot clear; the gate must agree)
      val next = msgs.foldLeft(prev) { (st, m) =>
        MasterRecord.typeToSlot.get(m.mtype) match {
          case Some(slot) if st.arrivals.get(slot).forall(_ <= m.ts.getTime) =>
            if (m.status.contains("deleted") || m.payload == null)
              st.copy(payloads = st.payloads - slot,
                arrivals = st.arrivals + (slot -> m.ts.getTime))
            else
              st.copy(payloads = st.payloads + (slot -> m.payload),
                arrivals = st.arrivals + (slot -> m.ts.getTime))
          case _ => st
        }
      }
      val complete = CoreSlots.forall(next.payloads.contains)
      val changed = next != prev
      // once force-flushed, later updates re-emit even while incomplete —
      // otherwise a post-flush bib_data v2 would be stranded forever
      val emit = changed && (complete || prev.everEmitted)
      state.update(next.copy(everEmitted = next.everEmitted || emit))
      if (forceAfterMs > 0 && !complete)
        state.setTimeoutDuration(forceAfterMs)
      if (emit) Iterator.single(toRecord(bibcode, next)) else Iterator.empty
    }
  }

  /** Wire the gate over a stream (or batch Dataset) of update messages.
    * Keyed state shuffles once on bibcode — the same key the master table
    * is bucketed by, so the downstream merge join is co-located. */
  def completenessGate(updates: Dataset[UpdateMessage],
      forceAfterMs: Long = 0): Dataset[MasterRecord] = {
    val spark = updates.sparkSession
    import spark.implicits._
    val timeout =
      if (forceAfterMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    updates.groupByKey(_.bibcode)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(gate(forceAfterMs))
  }
}

/** ST5 — progressive retry schedule (adsmp/tasks.py:1057-1108,
  * config.py:56-58): the reference polls a pending count with 10s×20 +
  * 30s×30 + 60s×50 backoff (~90 min budget). In Spark the job DAG
  * replaces queue polling, but external services (a SOLR commit, a
  * downstream registry) still need the same bounded-backoff loop on the
  * driver. Pure schedule + driver, testable without sleeping. */
object RetrySchedule {
  /** Delay in seconds before retry `attempt` (0-based); None = give up. */
  def delay(attempt: Int, maxRetries: Int = 100): Option[Int] =
    if (attempt >= maxRetries) None
    else if (attempt < 20) Some(10)
    else if (attempt < 50) Some(30)
    else Some(60)

  def totalBudgetSeconds(maxRetries: Int = 100): Int =
    Iterator.from(0).map(delay(_, maxRetries)).takeWhile(_.isDefined)
      .flatten.sum

  /** Retry `poll` until it yields Some(result) or the schedule is
    * exhausted; `sleep` is injectable for tests. */
  def retryUntil[A](poll: () => Option[A], maxRetries: Int = 100,
      sleep: Int => Unit = s => Thread.sleep(s * 1000L)): Option[A] = {
    var attempt = 0
    var out: Option[A] = None
    var exhausted = false
    while (out.isEmpty && !exhausted) {
      out = poll()
      if (out.isEmpty) delay(attempt, maxRetries) match {
        case Some(d) => sleep(d); attempt += 1
        case None    => exhausted = true
      }
    }
    out
  }
}

/** ST1 — watermark store: the reference's `KeyValue` table holding
  * `last.reindex.normal` / `last.reindex.forced` (run.py:110-137). In
  * batch mode this is a 2-column parquet read/overwritten around each
  * incremental run; Structured Streaming replaces it with the checkpoint.
  */
object Watermark {
  private def exists(spark: SparkSession, p: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
  }

  def read(spark: SparkSession, path: String, key: String): Option[Timestamp] = {
    import spark.implicits._
    // only a genuinely missing dir means "no watermark" — a transient FS
    // error must propagate, or the caller would silently fall back to a
    // full-corpus reprocess
    def readDir(p: String) =
      if (!exists(spark, p)) None
      else spark.read.parquet(p).filter($"key" === key)
        .select($"value").as[Timestamp].collect().headOption
    // fall back to the parked backup if a crashed advance left no live dir
    readDir(path).orElse(readDir(path + ".old"))
  }

  /** Replace the key's value (rollback on failure = simply not advancing,
    * run.py:224-229). Writes via temp dir + rename through the Hadoop
    * FileSystem API — the watermark may live on HDFS/S3 next to the master
    * snapshots, where java.io.File ops would silently address local disk
    * and the watermark would never advance (every incremental run would
    * reprocess the full corpus). Fails loudly on a refused rename.
    *
    * Swap order: park the live dir aside as `.old`, rename the temp in,
    * then drop the backup. A crash between the park and the rename-in
    * leaves `.old` readable (see [[read]]'s fallback), so no crash point
    * loses ALL keys' watermarks — the prior delete-then-rename had exactly
    * that window, which at 28.8M rows means a surprise full reprocess of
    * every stream. */
  def advance(spark: SparkSession, path: String, key: String, value: Timestamp): Unit = {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    // other keys' values must survive the swap even when recovering from
    // a crash that left only the backup dir. Missing dir → no data; any
    // OTHER failure (transient FS error, corrupt file) propagates — a
    // swallowed error here would rewrite the store with only the advanced
    // key and permanently drop every other stream's watermark
    def keysOf(p: String): Option[Seq[(String, Timestamp)]] =
      if (!exists(spark, p)) None
      else Some(spark.read.parquet(p).filter($"key" =!= key)
        .as[(String, Timestamp)].collect().toSeq)
    val existing = keysOf(path).orElse(keysOf(path + ".old"))
      .getOrElse(Seq.empty)
    val next = existing :+ (key -> value)
    val tmp = path + ".tmp"
    next.toDF("key", "value").coalesce(1).write.mode("overwrite").parquet(tmp)
    val target = new Path(path)
    val backup = new Path(path + ".old")
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(backup) && !fs.delete(backup, true))
      throw new java.io.IOException(s"watermark advance: cannot clear $backup")
    if (fs.exists(target) && !fs.rename(target, backup))
      throw new java.io.IOException(s"watermark advance: cannot park $path aside")
    if (!fs.rename(new Path(tmp), target))
      throw new java.io.IOException(s"watermark advance: rename $tmp -> $path refused")
    fs.delete(backup, true) // best-effort; a leftover backup is harmless
    ()
  }

  /** Generation-cursor flavor: the feed-driven sweep's "last indexed
    * generation" (Pipeline.runFeedSweep) rides the SAME crash-safe
    * park-swap-drop store as the timestamp watermarks — the store's value
    * column is a Timestamp, and a generation is a small long encoded
    * losslessly in its millis field. One proven swap/recovery path
    * instead of a second store with its own crash windows. */
  def readGen(spark: SparkSession, path: String, key: String): Option[Long] =
    read(spark, path, key).map(_.getTime)

  def advanceGen(spark: SparkSession, path: String, key: String, gen: Long): Unit =
    advance(spark, path, key, new Timestamp(gen))
}
