package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.records._
import graft.operators.{IndexJob, MergeEngine, Sitemap, SitemapCadence, SitemapMembers, SitemapState}
import graft.sources.{MasterStore, Sinks}
import graft.streaming.Watermark

/** The whole reference topology as one batch job (SURVEY.md §3):
  * ingest messages → merge into the master snapshot → eligibility gate →
  * build the three sink payloads → push with retry ladders → stamp
  * processed/checksum/status → next snapshot. What took the reference 13
  * Celery queues and three databases is three Spark jobs over one
  * snapshot store; every stage is an operator tested on its own.
  */
object Pipeline {

  /** `merged` counts the batch's post-merge working set: the whole table
    * for a sweep-shaped run, the touched keys for a keyLocal queue batch. */
  case class RunReport(
      version: Long,
      merged: Long,
      indexed: Long,
      solrOk: Long, solrFailed: Long,
      metricsOk: Long, linksOk: Long,
      boostOk: Long = 0L, boostFailed: Long = 0L,
      augmentOk: Long = 0L, augmentFailed: Long = 0L)

  /** One micro-batch: the batch analog of the reference's
    * `cron → reindex → task_index_records → sinks → mark_processed`. */
  def runBatch(
      spark: SparkSession,
      store: MasterStore,
      updates: Dataset[UpdateMessage],
      solrTransport: Sinks.Transport,
      bulkTransport: Sinks.Transport,
      watermarkDir: Option[String] = None,
      force: Boolean = false,
      ignoreChecksums: Boolean = false,
      now: Timestamp = new Timestamp(0),
      metricsStore: Option[MasterStore] = None,
      sinks: Set[String] = Set("solr", "metrics", "links"),
      restrictTo: Option[Dataset[String]] = None,
      sinceOverride: Option[Timestamp] = None,
      updateProcessed: Boolean = true,
      forwardBoostRequests: Boolean = false,
      forwardAugmentRequests: Boolean = false,
      keyLocal: Boolean = false,
      changeLogDir: Option[String] = None,
      workKeys: Option[DataFrame] = None,
      workRows: Option[DataFrame] = None,
      keyedPublish: Boolean = false,
      stageTimer: (String, Double) => Unit = (_, _) => ()): RunReport = {
    import spark.implicits._
    // bench-facing stage attribution (OpsBench's wave decomposition):
    // wall time between this batch's ACTIONS — "merge_read" covers the
    // keyed lookup + upsert compute up to the merged-count
    // materialization, "publish" the gate/transform/stamp compute forced
    // by the layer write plus the CAS + auto-compaction, "report" the
    // cached status aggregations. Zero cost when left defaulted.
    var stageT0 = System.nanoTime()
    def stage(name: String): Unit = {
      stageTimer(name, (System.nanoTime() - stageT0) / 1e9)
      stageT0 = System.nanoTime()
    }

    // keyLocal: the batch's working set is the UPDATES' key set, read via
    // the bucket-pruned keyed lookup — per-batch compute and scan cost
    // ∝ batch, never ∝ table. This is the reference's queue-consumer
    // shape (task_index_records fetches exactly the message's rows,
    // adsmp/tasks.py:300-360); the table-wide gate below is the CRON
    // sweep's shape (run.py reindex), which passes keyLocal=false. The
    // two select identical rows for a queue batch: an untouched record's
    // `updated` did not move, so P1's processed-vs-updated gate excludes
    // it from the table-wide sweep too — the subset drops only rows the
    // gate was about to drop. Publishes stay keyed regardless of `force`:
    // a full-table write from a subset frame would truncate the table.
    require(!keyLocal || restrictTo.isEmpty,
      "keyLocal reads the updates' keys; a restrictTo sweep is table-scoped")
    // workKeys widens a keyLocal batch's working set beyond the updates'
    // own keys — the feed-driven sweep's shape, where the work was
    // DISCOVERED (from the store's change feed) rather than delivered as
    // messages. Meaningless outside keyLocal: the table-wide gate already
    // sees every row
    require(workKeys.isEmpty || keyLocal,
      "workKeys is the key-local working set; a table-wide sweep scans anyway")
    // workRows goes one further than workKeys: the caller already HOLDS the
    // working set's live rows (the change feed's rows for changed keys ARE
    // the live rows — latest-generation-wins on both sides), so the keyed
    // store lookup is skipped entirely. Caller contract: master-schema
    // rows, exactly the live row per working key, covering the updates'
    // keys too (the feed sweep's updates are empty). Same snapshot-then-
    // publish race window as the keyed lookup it replaces — both read
    // before the CAS publish, under the single-cron-writer contract
    require(workRows.isEmpty || keyLocal,
      "workRows is the key-local working set; a table-wide sweep scans anyway")

    // ST1: incremental window from the stored watermark; an explicit
    // --since wins over it (run.py's -s), and a targeted -b/-n run passes
    // neither — named bibcodes bypass the window entirely
    val since = sinceOverride.orElse(
      watermarkDir.flatMap(Watermark.read(spark, _, "last.reindex.normal")))

    // a metadata message with status=deleted deletes the whole record
    // (the reference routes it to task_delete_documents,
    // adsmp/tasks.py:60-77): drop the row after the merge and fan the
    // delete out to the sinks (S11). Slot-level deleted messages are
    // handled inside the upsert (slot clear). Sitemap state is swept by
    // the cleanup pass, which treats vanished records as invalid.
    // coalesce: status is usually null, and `mtype === "metadata" && null`
    // is NULL, which !filter would silently DROP — not keep
    val isFullDelete = col("mtype") === "metadata" &&
      coalesce(col("status") === "deleted", lit(false))
    // the doomed set stays a Dataset end-to-end: anti-join for the row
    // drop, distributed count to fire the sink deletes — a mass-deletion
    // batch must never become a driver list or an isin literal (the same
    // scale bug class the -n/--index_failed paths already fixed)
    val doomed = updates.filter(isFullDelete)
      .select(col("bibcode")).distinct().as[String].cache()
    val anyDoomed = doomed.head(1).nonEmpty

    // M1 merge (over the batch's keyed working set when keyLocal)
    val keySrc = workKeys match {
      case Some(k) => updates.select(col("bibcode"))
        .unionByName(k.select(col(k.columns.head).as("bibcode")))
      case None => updates.select(col("bibcode")).toDF()
    }
    val baseMaster =
      if (keyLocal) workRows.getOrElse(store.lookupFrame(spark, keySrc))
      else store.read(spark)
    val merged = MergeEngine.upsert(baseMaster, updates.filter(!isFullDelete))
    val master0 =
      if (!anyDoomed) merged.master
      else merged.master.join(doomed.toDF("bibcode"), Seq("bibcode"), "left_anti")
    if (anyDoomed)
      Sinks.deleteByBibcodes(doomed, Seq(solrTransport, bulkTransport)).count()
    val master = master0.cache()
    val mergedCount = master.count()
    stage("merge_read")
    doomed.unpersist(blocking = false)

    // the reference queues a boost-pipeline request for every record an
    // ingest message touched (task_update_record/task_augment_record →
    // task_boost_request, adsmp/tasks.py:104-111), except for boost
    // responses themselves — forwarding those would loop the pipeline.
    // Delivery counts surface in the report: a dead bulk endpoint must
    // not silently lose the whole boost leg
    val (boostOk, boostFailed) =
      if (!forwardBoostRequests) (0L, 0L)
      else {
        val touched = updates.filter(!isFullDelete && col("mtype") =!= "boost")
          .select(col("bibcode")).distinct()
        val requests = master.join(touched, Seq("bibcode"), "left_semi")
          .as[MasterRecord]
          .map(r => (r.bibcode, org.json4s.jackson.JsonMethods.compact(
            org.json4s.jackson.JsonMethods.render(IndexJob.boostRequest(r)))))
          .toDF("bibcode", "payload")
        // one distributed agg fires the partition-local batched sends and
        // counts outcomes without collecting per-record statuses
        val r = Sinks.writeBulk(requests, bulkTransport).toDF().agg(
          coalesce(sum(when(col("ok"), 1L).otherwise(0L)), lit(0L)),
          count(lit(1))).head()
        (r.getLong(0), r.getLong(1) - r.getLong(0))
      }

    // a metadata update additionally requests affiliation augmentation
    // (tasks.py:192-196 — the aff pipeline answers with its own augment
    // message later); only records whose bib data carries a non-empty aff
    // list produce a request (app.py:628-653), so the builder's None rows
    // drop out before the send. In the reference this fires UNCONDITIONALLY
    // on metadata updates — only the boost leg is gated (by
    // IGNORED_BOOST_PAYLOAD_TYPES/TESTING_MODE) — so augment has its OWN
    // gate here rather than riding the boost flag
    val (augmentOk, augmentFailed) =
      if (!forwardAugmentRequests) (0L, 0L)
      else {
        val metaTouched = updates.filter(!isFullDelete && col("mtype") === "metadata")
          .select(col("bibcode")).distinct()
        val requests = master.join(metaTouched, Seq("bibcode"), "left_semi")
          .as[MasterRecord]
          .flatMap(r => IndexJob.affAugmentRequest(r).map(j =>
            (r.bibcode, org.json4s.jackson.JsonMethods.compact(
              org.json4s.jackson.JsonMethods.render(j)))))
          .toDF("bibcode", "payload")
        val r = Sinks.writeBulk(requests, bulkTransport).toDF().agg(
          coalesce(sum(when(col("ok"), 1L).otherwise(0L)), lit(0L)),
          count(lit(1))).head()
        (r.getLong(0), r.getLong(1) - r.getLong(0))
      }

    // P1-P3 gate + payload builds + P4 checksum suppression. The payload
    // frames are cached: each is consumed three times (sink write, stamp
    // join, report count) and rebuilding one means a full JSON-parse +
    // transform pass over the selection
    // the reference's `-f` sets force AND ignore_checksums together
    // (run.py:82-86): force widens eligibility, ignoreChecksums re-sends
    // payloads whose checksum still matches the stored one; a -b/-n
    // bibcode list (restrictTo) narrows the sweep to the named records
    val gated = master.as[MasterRecord].filter(IndexJob.eligible(since, force))
    // a -b/-n restriction is a left_semi join against the key frame, never
    // an isin literal: a hand-list stays a broadcast-hash semi (AQE sees a
    // tiny side), while a mass --index_failed re-drive shuffles on bibcode
    // like any other join — no million-literal plan, no driver list
    val selected = restrictTo match {
      case Some(keys) =>
        gated.join(keys.toDF("bibcode"), Seq("bibcode"), "left_semi").as[MasterRecord]
      case None => gated
    }
    val batch0 = IndexJob.run(selected, ignoreChecksums = ignoreChecksums)
    val batch = IndexJob.IndexBatch(
      batch0.solr.cache(), batch0.metrics.cache(), batch0.links.cache())

    // S6/S7/S8 with retry ladders — cached so re-reads normally hit the
    // materialized statuses instead of re-firing transports. NOTE: cache
    // is best-effort; an evicted/lost partition recomputes and re-sends.
    // That is safe here because the sinks are idempotent by design (ST4:
    // upsert semantics + checksum change-suppression make duplicate
    // deliveries no-ops); a strict once-only guarantee would require
    // persisting the status frame to durable storage first.
    // the -r letters (s/m/l, run.py:687-694) choose which sinks this run
    // updates; an unselected sink neither sends nor stamps
    def emptyStatus = spark.emptyDataset[Sinks.SinkStatus]
    val solrStatus = (if (sinks("solr")) Sinks.writeSolr(batch.solr, solrTransport)
      else emptyStatus).cache()
    val metricsStatus = (if (sinks("metrics")) Sinks.writeBulk(batch.metrics, bulkTransport)
      else emptyStatus).cache()
    val linksStatus = (if (sinks("links")) Sinks.writeBulk(batch.links, bulkTransport)
      else emptyStatus).cache()

    // M4/ST6 stamping: successes carry their checksum, failures a status
    def stamp(m: DataFrame, status: Dataset[Sinks.SinkStatus],
        payloads: DataFrame, sinkType: String): DataFrame = {
      val okKeys = status.filter(_.ok).toDF().select(col("bibcode"))
        .join(payloads.select(col("bibcode"), col("checksum")), Seq("bibcode"))
      val failKeys = status.filter(!_.ok).toDF().select(col("bibcode"),
        lit(null).cast("string").as("checksum"))
      val afterOk = MergeEngine.markProcessed(m, okKeys, sinkType, Some("success"), now)
      MergeEngine.markProcessed(afterOk, failKeys, sinkType,
        Some(sinkType match {
          case "solr" => "solr-failed"
          case "metrics" => "metrics-failed"
          case _ => "links-failed"
        }), now)
    }

    // update_processed=False (app.py:381-430, run.py --update-processed):
    // deliveries still happen but NO records-table state is touched —
    // no processed timestamps, checksums, or statuses, success or failure
    val stamped =
      if (!updateProcessed) master
      else stamp(stamp(stamp(master, solrStatus, batch.solr, "solr"),
        metricsStatus, batch.metrics, "metrics"),
        linksStatus, batch.links, "links")

    // S7's store leg: merge the due metrics payloads into the metrics
    // snapshot (whole-row replace per bibcode, MetricsTable semantics).
    // Skipped for idle batches — otherwise every checksum-suppressed
    // micro-batch would rewrite the whole metrics table to a new version.
    metricsStore.foreach { ms =>
      if (sinks("metrics") && batch.metrics.limit(1).count() > 0) {
        // IndexJob emits at most one metrics payload per bibcode, so the
        // in-batch arrival order is vacuous and a constant seq is exact —
        // but only under that invariant. Guard it loudly: if a future
        // multi-source metrics path ever emits duplicates, the upsert
        // would silently become nondeterministic again. One tiny job over
        // the already-cached payload frame.
        val dup = batch.metrics.groupBy(col("bibcode")).count()
          .filter(col("count") > 1).limit(1).count()
        require(dup == 0, "metrics batch carries multiple rows per bibcode; " +
          "derive a real arrival seq before upserting")
        val incoming = batch.metrics.select(col("bibcode"), col("payload"))
          .as[(String, String)]
          .map { case (b, p) => graft.operators.MetricsTable.fromJson(b, p, now) }
          .toDF().withColumn("seq", lit(0L))
        // keyed merge: only the due payloads' rows move, so the store
        // appends a delta layer ∝ batch instead of rewriting the table
        ms.writeMergeKeyed(spark, incoming.select(col("bibcode")), cur =>
          graft.operators.MetricsTable.upsert(cur, incoming))
      }
    }

    // Publish. The batch's net effect on the table is KEY-LOCAL: rows it
    // upserted (the update messages' bibcodes, incl. full-deletes) plus
    // rows it stamped (the sinks' delivery statuses). A keyed CAS merge
    // rebases exactly those rows over the LIVE snapshot, so a CLI sweep
    // that CAS-published mid-batch keeps its changes to every other key —
    // the lost-update window the old blind write left open is closed, and
    // the store appends a delta layer ∝ batch instead of rewriting the
    // table. For the batch's own keys the batch wins (its payloads were
    // delivered from its input snapshot — same per-row last-writer-wins
    // the reference's row-level transactions give). The one remaining
    // blind write is the forced FULL sweep (rebuild-collection's loop),
    // whose key set IS the corpus: a keyed rebase would write the table
    // twice (layer + immediate size-triggered compaction) for the same
    // outcome, so it keeps the primary-writer full-write contract.
    // keyedPublish forces the delta-layer publish even for sweep-shaped
    // batches: whole-table writeMerge/write RESET the store's change-feed
    // horizon (a rewritten base is not separable into per-key layers), so
    // a feed-driven cadence that fell back to a table-wide sweep would
    // otherwise knock out its own feed and fall back forever. The price —
    // a table-sized layer plus the auto-compaction that folds it — is
    // paid once per fallback (bootstrap, or a consumer that outslept the
    // feed retention), and the retained fold history keeps the feed
    // continuous across it.
    val version =
      if (force && restrictTo.isEmpty && !keyLocal && !keyedPublish)
        store.write(stamped)
      else {
        val stampKeys =
          if (!updateProcessed) updates.select(col("bibcode"))
          else updates.select(col("bibcode"))
            .unionByName(solrStatus.toDF().select(col("bibcode")))
            .unionByName(metricsStatus.toDF().select(col("bibcode")))
            .unionByName(linksStatus.toDF().select(col("bibcode")))
        if (keyLocal)
          // queue batch: keys are the batch's — always a delta layer
          store.writeMergeKeyed(spark, stampKeys, _ =>
            stamped.join(stampKeys.distinct(), Seq("bibcode"), "left_semi"))
        else {
          val sk = stampKeys.distinct().cache()
          val nKeys = sk.count()
          try {
            if (!keyedPublish && nKeys > 0 && nKeys * 2 >= mergedCount)
              // sweep-shaped: the touched set IS most of the table, so a
              // delta layer would trip the size-triggered fold and write
              // the table TWICE (layer + compaction). One CAS whole-table
              // merge writes it once and still rebases the batch's rows
              // onto the live snapshot — concurrent key-local writers'
              // other keys survive a lost race (their changes re-apply
              // under writeMerge's re-resolve)
              store.writeMerge(spark, cur =>
                cur.join(sk, Seq("bibcode"), "left_anti")
                  .unionByName(stamped.join(sk, Seq("bibcode"), "left_semi")))
            else
              store.writeMergeKeyed(spark, sk, _ =>
                stamped.join(sk, Seq("bibcode"), "left_semi"))
          } finally sk.unpersist(blocking = false)
        }
      }
    stage("publish")
    // The audit log the reference appends on every mutation in the same
    // transaction (ChangeLog, adsmp/models.py:127-141; written at
    // app.py:175 for upserts and :250 for deletes with the serialized old
    // record). Here the batch is the transaction: written AFTER the CAS
    // publish lands, stamped with the published generation so an auditor
    // can join log rows to snapshots. Pre-images come from the batch's
    // input snapshot (the generation retention window keeps it readable).
    // Append-only parquet, rows ∝ batch; auditors must treat it as
    // AT-LEAST-ONCE keyed by (key, version): redelivery appends the
    // replayed batch's rows again — the same property the reference's
    // per-task-run inserts have, and the `version` stamp makes replays
    // distinguishable instead of silently merged. The append is not
    // atomic with the CAS publish (the reference gets that from its DB
    // transaction); writing the log BEFORE the watermark advance closes
    // the loss window — a crash between publish and append leaves the
    // watermark un-advanced, so the redriven batch re-emits the missing
    // rows (as duplicates of any that did land, per the keying above)
    changeLogDir.foreach { dir =>
      val upsertLog = merged.changeLog
      val deleteLog =
        if (!anyDoomed) None
        else Some(baseMaster
          .join(doomed.toDF("bibcode"), Seq("bibcode"), "left_semi")
          .select(col("bibcode").as("key"), lit("deleted").as("ctype"),
            to_json(struct(baseMaster.columns.map(col).toIndexedSeq: _*))
              .as("oldvalue"),
            lit(false).as("permanent"), lit(now).as("ts")))
      deleteLog.foldLeft(upsertLog)(_ unionByName _)
        .withColumn("version", lit(version))
        .write.mode("append").parquet(dir)
    }
    watermarkDir.foreach(Watermark.advance(spark, _, "last.reindex.normal", now))

    // one aggregation job per status frame, not one per count — the
    // micro-batch wall has a fixed driver-job floor and the report was
    // paying six jobs where three carry the same numbers
    def okFail(status: Dataset[Sinks.SinkStatus]): (Long, Long) = {
      val r = status.toDF().agg(
        coalesce(sum(when(col("ok"), 1L).otherwise(0L)), lit(0L)),
        count(lit(1))).head()
      (r.getLong(0), r.getLong(1) - r.getLong(0))
    }
    val (sOk, sFail) = okFail(solrStatus)
    val report = RunReport(version, mergedCount,
      indexed = batch.solr.count(),
      solrOk = sOk,
      solrFailed = sFail,
      metricsOk = okFail(metricsStatus)._1,
      linksOk = okFail(linksStatus)._1,
      boostOk = boostOk, boostFailed = boostFailed,
      augmentOk = augmentOk, augmentFailed = augmentFailed)

    stage("report")
    // release this batch's caches — in runStream a leak here would grow
    // executor storage by four datasets per micro-batch
    Seq(batch.solr, batch.metrics, batch.links).foreach(_.unpersist())
    Seq(solrStatus, metricsStatus, linksStatus).foreach(_.unpersist())
    master.unpersist()
    report
  }

  /** What a feed-driven sweep did: the underlying run report, the
    * generation cursor the NEXT sweep should pass as `fromGen` (resolved
    * BEFORE this sweep's own publishes, so changes landing mid-sweep are
    * re-seen rather than skipped — at-least-once, deduped by the P1/P4
    * gates), and whether discovery actually used the change feed or fell
    * back to the table-wide watermark scan. */
  case class FeedSweepReport(run: RunReport, nextFromGen: Long, usedFeed: Boolean)

  /** Watermark-store key for the feed sweep's generation cursor. */
  val GenCursorKey = "last.reindex.generation"

  /** IN-regime crossover for the sitemap cadence's keyed state reads —
    * pinned at the hard cap rather than left to lookupFrame's
    * layer-aware auto: a cadence wave is read ONCE against a low-layer
    * store (the cron compacts behind itself), so even the auto rule's
    * worst-case layer discount doesn't apply here, while the pushed IN +
    * key-sorted layout turns the read into row-group-skipped IO ∝ wave
    * instead of the semi-join regime's full column scan of the 28.8M-row
    * state. Waves beyond this degrade to the semi join — correct, just
    * table-priced. */
  val CadenceLookupMaxDriverKeys = 25000

  /** The cron sweep with ∝-delta work discovery: instead of the
    * reference's per-cadence filter over the FULL master snapshot
    * (run.py:147-159 — the P1 watermark scan, which pays the corpus every
    * cycle), discover the cadence's candidate set from the store's change
    * feed (`changesSince(fromGen)` — cost ∝ rows changed since the last
    * sweep, read from the retained delta layers alone) and run the
    * identical gate → index → sink → stamp cycle key-locally over exactly
    * those rows. At 100 TB this is the difference between a 5-minute
    * cadence that reads gigabytes and one that reads the table.
    *
    * Selection parity with the watermark scan (spec-pinned in
    * FeedSweepSpec): a record passes the P1 gate only if its `updated`
    * moved past the time watermark, and every mutation that moves
    * `updated` publishes a generation > the cursor the watermark run
    * recorded — so the feed's key set is a superset of the gate's
    * selection, and the SAME gate then filters both to the same rows.
    * Net-deleted keys are dropped (their sink deletes were fanned out by
    * the batch that deleted them; there is no master row left to index).
    *
    * Fallbacks are loud where they must be and automatic where they may
    * be: a cursor BEHIND the feed horizon (the consumer outslept the
    * retention window) falls back to the table-wide watermark scan —
    * exactly the run the reference always does — and the report says so;
    * a cursor AHEAD of the live generation (a recreated store under a
    * surviving cursor) propagates `changesSince`'s IllegalStateException,
    * because silently full-scanning would hide that the cursor's lineage
    * is gone.
    *
    * `force = true` deliberately bypasses feed discovery: a forced sweep
    * (run.py -f, the post-wipe full rebuild) means "the corpus", and
    * force widens the GATE — discovery must widen with it, or a forced
    * rebuild would silently re-send only the window's delta.
    *
    * `fromGen = None` reads the persisted cursor from `watermarkDir`
    * under [[GenCursorKey]] (advanced here after every sweep) — the
    * turn-key cadence mode: the first sweep ever finds no cursor, runs
    * table-wide once, and every later sweep discovers ∝ delta. */
  def runFeedSweep(
      spark: SparkSession,
      store: MasterStore,
      solrTransport: Sinks.Transport,
      bulkTransport: Sinks.Transport,
      fromGen: Option[Long] = None,
      watermarkDir: Option[String] = None,
      force: Boolean = false,
      ignoreChecksums: Boolean = false,
      now: Timestamp = new Timestamp(0),
      metricsStore: Option[MasterStore] = None,
      sinks: Set[String] = Set("solr", "metrics", "links"),
      updateProcessed: Boolean = true,
      changeLogDir: Option[String] = None): FeedSweepReport = {
    import spark.implicits._
    // feed discovery is state-driven: a delivered row leaves the next
    // window only because its stamp advanced `processed` past `updated`.
    // The no-stamp debugging mode (run.py --update-processed) re-delivers
    // forever under the table-wide scan by design; under feed discovery
    // it would instead silently deliver once and vanish — refuse the
    // combination rather than quietly change its meaning
    require(updateProcessed,
      "runFeedSweep needs processed-stamp tracking; use the table-wide " +
        "runBatch for update_processed=False debugging runs")
    val cursor = store.currentVersion.getOrElse(0L)
    val from: Option[Long] = fromGen.orElse(
      watermarkDir.flatMap(Watermark.readGen(spark, _, GenCursorKey)))
    val feedRows: Option[DataFrame] = from match {
      case None => None // no cursor yet: the bootstrap table-wide sweep
      case Some(f) if f > cursor =>
        // AHEAD failure raised HERE against OUR cursor read, not by
        // re-calling changesSince (whose own snapshot could race a
        // concurrent publish past f — turning the loud failure into a
        // silent table-wide sweep that then REGRESSES the persisted
        // cursor below f)
        throw new MasterStore.CursorAheadException(
          s"feed cursor $f is AHEAD of the live generation $cursor at " +
            s"${store.root} — the store was recreated or the cursor " +
            "belongs to another store. Re-baseline and reset the cursor")
      case Some(_) if force =>
        // a FORCED sweep's intent is the corpus (run.py -f): force widens
        // the GATE, so discovery must widen with it — a feed-windowed
        // force would silently re-send only the delta
        None
      case Some(f) =>
        // the feed's rows ARE the working set's live rows (the newest
        // change ≥ any retained change is the live version, and the
        // horizon contract keeps every change > f readable), so the sweep
        // hands them to runBatch as workRows and the gate runs directly
        // on the feed frame — the keyed store lookup that was the
        // sweep's second-largest stage disappears entirely
        try Some(store.changesSince(spark, f)
          .filter(!col("_deleted")).drop("_deleted", "_gen"))
        // ONLY the typed behind-horizon condition falls back to the
        // table-wide scan; any other IllegalStateException (including a
        // racing AHEAD) propagates loudly
        catch { case _: MasterStore.FeedHorizonException => None }
    }
    val noUpdates = spark.emptyDataset[graft.records.UpdateMessage]
    val report = feedRows match {
      case Some(rows) =>
        runBatch(spark, store, noUpdates, solrTransport, bulkTransport,
          watermarkDir = watermarkDir, force = force,
          ignoreChecksums = ignoreChecksums, now = now,
          metricsStore = metricsStore, sinks = sinks,
          updateProcessed = updateProcessed, keyLocal = true,
          changeLogDir = changeLogDir, workRows = Some(rows))
      case None =>
        // table-wide fallback, but with the keyed publish: a whole-table
        // rewrite here would reset the feed horizon and strand the
        // cadence in fallback mode forever (see runBatch.keyedPublish)
        runBatch(spark, store, noUpdates, solrTransport, bulkTransport,
          watermarkDir = watermarkDir, force = force,
          ignoreChecksums = ignoreChecksums, now = now,
          metricsStore = metricsStore, sinks = sinks,
          updateProcessed = updateProcessed, keyLocal = false,
          changeLogDir = changeLogDir, keyedPublish = true)
    }
    watermarkDir.foreach { dir =>
      Watermark.advanceGen(spark, dir, GenCursorKey, cursor)
      // persistent-cursor mode also registers with the store so feed
      // retention covers this consumer when it runs slow (compact keeps
      // history for the oldest registered cursor up to the hard cap);
      // a one-shot fromGen caller is not a standing consumer and skips it
      store.registerConsumerCursor("reindex", cursor)
    }
    FeedSweepReport(report, nextFromGen = cursor, usedFeed = feedRows.isDefined)
  }

  /** Continuous ingest (ST1 as Structured Streaming): every micro-batch of
    * update messages runs the full merge → index → sink → stamp cycle
    * against the snapshot store. The checkpoint gives at-least-once
    * delivery; checksum suppression (P4) and the upsert merge make
    * replayed batches no-ops (ST4), so end-to-end the pipeline is
    * effectively exactly-once without coordination. */
  def runStream(
      spark: SparkSession,
      store: MasterStore,
      updates: Dataset[UpdateMessage],
      solrTransport: Sinks.Transport,
      bulkTransport: Sinks.Transport,
      checkpointDir: String,
      force: Boolean = false,
      forwardBoostRequests: Boolean = false,
      forwardAugmentRequests: Boolean = false,
      metricsStore: Option[MasterStore] = None,
      sinks: Set[String] = Set("solr", "metrics", "links"),
      vacuumRetain: Int = 2,
      changeLogDir: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[UpdateMessage], batchId: Long) =>
        val report = runBatch(spark, store, batch, solrTransport, bulkTransport,
          watermarkDir = None, force = force,
          now = new Timestamp(System.currentTimeMillis()),
          forwardBoostRequests = forwardBoostRequests,
          forwardAugmentRequests = forwardAugmentRequests,
          metricsStore = metricsStore, sinks = sinks,
          changeLogDir = changeLogDir,
          // queue-consumer shape: the batch touches its own keys only —
          // compute/scan/publish all ∝ batch (the table-wide sweep stays
          // the CLI/cron's job, as in the reference)
          keyLocal = true)
        // retention-driven maintenance on the publish cadence: without it
        // a 5-minute-cadence consumer accumulates one superseded
        // generation per batch without bound (the reference's Postgres
        // overwrites rows in place and never has this class of garbage).
        // retain ≥ 2 keeps a window of superseded snapshots for slow
        // in-flight readers — vacuum is file-granular, so base files
        // carried forward by reference survive and an overlapped reader
        // keeps working (MasterStoreSpec pins this); the rare reader
        // beyond the window retries via the vanished-input class.
        // Driver-side file ops only, zero Spark jobs.
        // alsoOrphans with the cadence grace: crashed/CAS-losing attempt
        // dirs older than an hour are swept too (otherwise they
        // accumulate without bound under a 5-minute cadence); an
        // in-flight writer's dir has fresh mtimes and survives.
        // Maintenance must never fail a LANDED batch (the batch's merge
        // and deliveries are already durable here — same discipline as
        // writeMergeKeyed's post-publish compaction): a vacuum racing a
        // concurrent writer's own cleanup is logged and retried next
        // batch, not propagated into the StreamingQuery
        if (vacuumRetain >= 1) try {
          store.vacuum(alsoOrphans = true, retain = vacuumRetain,
            orphanGraceMs = MasterStore.CadenceOrphanGraceMs)
          metricsStore.foreach(_.vacuum(alsoOrphans = true,
            retain = vacuumRetain,
            orphanGraceMs = MasterStore.CadenceOrphanGraceMs))
        } catch {
          // NonFatal only: an OOM or interrupt mid-maintenance must fail
          // the query, not be logged away
          case scala.util.control.NonFatal(t) => System.err.println(
            s"[pipeline] post-batch vacuum failed (batch $batchId is " +
            s"safe; next batch re-runs maintenance): $t")
        }
        spark.sparkContext.setJobDescription(
          s"graft micro-batch $batchId -> snapshot v${report.version}")
        ()
      }
      .start()

  /** State-driven sitemap regeneration (the reference's
    * task_update_sitemap_files → task_generate_single_sitemap →
    * task_generate_sitemap_index chain, tasks.py:1111-1182,969-1108):
    * render every file with at least one flagged row — all its member
    * rows — into each site's tree, then stamp the generated files
    * (filename_lastmoddate = now, flag cleared) and advance the state
    * store. The per-site index lists ALL files in the state with
    * lastmod = max member bib_data_updated, so untouched files keep
    * their index entry and lastmod. Returns the regenerated file count. */
  def runManagedSitemaps(spark: SparkSession, stateStore: MasterStore,
      outRoot: String, now: Timestamp,
      siteKeys: Seq[String] = Sitemap.Sites.keys.toSeq.sorted): Long =
    runManagedSitemapsWithSummary(spark, stateStore, outRoot, now, siteKeys)._1

  /** [[runManagedSitemaps]] that also returns the [[SitemapCadence]]
    * summary of the post-run state, derived from the SAME per-file
    * aggregation the site indexes already needed — the cadence caller
    * persists it so the next feed-driven cron skips the table-wide state
    * reads entirely ([[runSitemapCadenceKeyed]]). */
  def runManagedSitemapsWithSummary(spark: SparkSession, stateStore: MasterStore,
      outRoot: String, now: Timestamp,
      siteKeys: Seq[String] = Sitemap.Sites.keys.toSeq.sorted,
      maxPerFile: Int = Sitemap.MaxRecordsPerSitemap,
      memberIndex: Option[SitemapMembers] = None): (Long, SitemapCadence.Summary) = {
    val today = new java.text.SimpleDateFormat("yyyy-MM-dd").format(now)
    val state0 = stateStore.read(spark).cache()
    val work = SitemapState.renderable(state0, today).cache()
    val files = work.select(col("sitemap_filename")).distinct()
      .collect().map(_.getString(0)) // bounded: ≤ corpus / maxPerFile names
    for (key <- siteKeys) {
      val site = Sitemap.Sites(key)
      Sitemap.writeFiles(Sitemap.renderFiles(work, site), s"$outRoot/$key")
    }
    // index entries for EVERY file in the table (tasks.py:888-899), not
    // just the regenerated ones; one tiny aggregation — the same pass
    // yields the cadence summary's per-file stats and fill cursor
    val (summary0, _) = SitemapCadence.rebuild(state0, 0L, maxPerFile)
    writeSiteMeta(spark, outRoot, siteKeys, summary0, today)
    import spark.implicits._
    // generated-flag clears are key-local (exactly the rendered files'
    // member rows), and the stamped rows are PRECOMPUTED from the cached
    // state0 — the same rows the render read — so the store's internal
    // keyed reconcile never evaluates (one fewer table scan per
    // regeneration). The closure ignoring `cur` makes this publish
    // SINGLE-WRITER by contract: a row another writer removed or
    // re-flagged between the render and this stamp would be overwritten
    // with the snapshot's version. That contract is enforced by the CLI's
    // shared sitemap cron lease (CronLease — every sitemap-state-writing
    // action takes it), not merely assumed; raw API users running
    // concurrent mutations must keep the `cur =>` rebase form instead
    val touchedRows = Sitemap.filesNeedingUpdate(state0)
    stateStore.writeMergeKeyed(spark, work.select(col("bibcode")),
      _ => SitemapState.markGenerated(touchedRows,
        files.toSeq.toDF("sitemap_filename"), now))
    // the full render already holds the whole table — rebuild the member
    // index in the same pass (the post-merge table IS state0 with the
    // rendered files' rows stamped), so the NEXT keyed cadence starts
    // with a fresh mirror instead of paying its own resync scan
    memberIndex.foreach { mi =>
      mi.store.write(SitemapState.markGenerated(state0,
        files.toSeq.toDF("sitemap_filename"), now))
      mi.commit(stateStore.currentVersion.getOrElse(0L))
    }
    work.unpersist(); state0.unpersist()
    Sitemap.releasePinned()
    (files.length.toLong,
      summary0.copy(generation = stateStore.currentVersion.getOrElse(0L)))
  }

  /** Per-site static sitemap + index + robots, shared by the full and the
    * keyed regeneration paths — the index lists only files physically
    * present in THIS site's tree (tasks.py:930-936): one listStatus per
    * site instead of the reference's per-filename os.path.exists —
    * ≤ corpus/50k names would otherwise mean tens of thousands of
    * sequential driver RPCs per regeneration cycle on HDFS/object
    * stores. */
  private def writeSiteMeta(spark: SparkSession, outRoot: String,
      siteKeys: Seq[String], summary: SitemapCadence.Summary,
      today: String): Unit = {
    val allFiles = summary.files
      .map(f => f.name -> summary.lastmodOf(f, today)).sortBy(_._1)
    for (key <- siteKeys) {
      val site = Sitemap.Sites(key)
      val dir = new org.apache.hadoop.fs.Path(s"$outRoot/$key")
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(dir)
      def put(name: String, content: String): Unit = {
        val out = fs.create(new org.apache.hadoop.fs.Path(dir, name), true)
        try out.write(content.getBytes("UTF-8")) finally out.close()
      }
      put("sitemap_static.xml", Sitemap.renderStaticSitemap(site))
      val onDisk = fs.listStatus(dir).map(_.getPath.getName).toSet
      val present = allFiles.filter { case (name, _) => onDisk(name) }
      put("sitemap_index.xml", Sitemap.renderIndex(site, present,
        staticFirst = Seq("sitemap_static.xml" -> today)))
      put("robots.txt", Sitemap.renderRobots(site))
    }
  }

  /** The feed-driven sitemap cadence with STATE access ∝ delta — the
    * companion of the feed-driven DISCOVERY: where the r14 cadence
    * discovered its due set from the master change feed but still
    * reconciled the full sitemap state every cron (the flag anti-join,
    * the fill aggregation, the render worklist, the index lastmods), this
    * path answers all four key-locally:
    *
    *  - due keys' current flags/existence: one bucket-pruned
    *    [[MasterStore.lookupFrame]] (files of other buckets never open);
    *  - the global fill cursor: carried in the persisted
    *    [[SitemapCadence.Summary]] and advanced arithmetically by the
    *    batch's new-assignment count ([[SitemapState.advanceFill]]);
    *  - the render worklist: affected files = files holding a flagged due
    *    row (from the addKeyed output already in hand) plus any
    *    stale-flagged files the summary rebuild surfaced — their member
    *    rows come from the [[SitemapMembers]] file-ordinal index when one
    *    is wired (IO ∝ touched files: only their buckets' files open,
    *    [[SitemapMembers.membersOf]]), else from a filename-pruned filter
    *    scan of the primary (predicate pushes, but every data file
    *    opens — the pre-r16 shape, kept for index-less callers); either
    *    read is overlaid with this run's merged rows, and the whole
    *    cadence then publishes ONE keyed merge per store (identical
    *    key/row frames to both layouts) at the end;
    *  - the index lastmods: untouched files keep their summary stats
    *    (valid by the generation check), affected files recompute EXACTLY
    *    from the member rows the render already has in hand.
    *
    * Correctness never rests on the summary being fresh: the caller
    * validates its generation against the live store and rebuilds (one
    * scan, surfacing stale flags) on any out-of-band mutation — see
    * [[SitemapCadence]] for the invariant. Returns the regenerated file
    * count and the NEXT summary (stamped with the post-run generation)
    * for the caller to persist. */
  def runSitemapCadenceKeyed(
      spark: SparkSession,
      stateStore: MasterStore,
      outRoot: String,
      now: Timestamp,
      dueMaster: DataFrame,
      summary: SitemapCadence.Summary,
      staleFlaggedFiles: Seq[String] = Nil,
      maxPerFile: Int = Sitemap.MaxRecordsPerSitemap,
      siteKeys: Seq[String] = Sitemap.Sites.keys.toSeq.sorted,
      force: Boolean = false,
      memberIndex: Option[SitemapMembers] = None): (Long, SitemapCadence.Summary) = {
    import spark.implicits._
    // phase tracing for the cadence (GRAFT_CADENCE_TRACE=1): stderr wall
    // per phase — the instrument that found the r16 regressions; cheap
    // enough to keep, silent by default
    val trace = sys.env.get("GRAFT_CADENCE_TRACE").contains("1")
    var phaseT0 = System.nanoTime()
    def phase(name: String): Unit = if (trace) {
      System.err.println(f"[cadence] $name ${(System.nanoTime() - phaseT0) / 1e9}%.2f s")
      phaseT0 = System.nanoTime()
    }
    val today = new java.text.SimpleDateFormat("yyyy-MM-dd").format(now)
    // the member index mirrors the primary ∝ delta below; a stale mirror
    // (out-of-band mutation, crash between the primary publish and the
    // stamp, or a brand-new index) pays ONE resync scan HERE — before any
    // of this run's writes — and is exact from then on
    memberIndex.filterNot(_.isFresh(stateStore.currentVersion.getOrElse(0L)))
      .foreach(_.resync(spark, stateStore))
    phase("resync-check")
    val dueKeys = dueMaster.select(col("bibcode")).distinct()
    // THE one keyed state read of the cadence: the due keys' current rows,
    // all columns, with the crossover raised so a cadence-sized wave stays
    // in the pushed-IN regime — the keys' literals reach the parquet scan
    // and the key-sorted-within-bucket layout skips row groups, where the
    // semi-join regime would column-scan the whole table. Everything else
    // the cadence needs (flag anti-join, new-assignment count, the
    // post-merge rows) derives from this frame and the merge's own output,
    // never from re-reading the store
    val preRows = stateStore.lookupFrame(spark, dueKeys,
      maxDriverKeys = CadenceLookupMaxDriverKeys).cache()
    val due = dueKeys.join(preRows.filter(col("update_flag")).select(col("bibcode")),
      Seq("bibcode"), "left_anti").cache()
    try {
      val newCnt = SitemapState.countNewAssignments(dueMaster, due, preRows)
      phase("lookup+newcnt")
      val fill = summary.fill
      val dueRows = preRows.join(due, Seq("bibcode"), "left_semi")
      // the merged rows are computed ONCE, from the rows already in hand,
      // and handed to the store as-is: the closure ignoring `cur` keeps
      // writeMergeKeyed's internal keyed reconcile unevaluated (lazy), so
      // the publish costs the layer write alone — the same
      // precomputed-rows publish contract runBatch's stamp publish uses,
      // under the same single-cron-writer assumption
      val newRows = SitemapState.addKeyed(dueRows, dueMaster, due, fill,
        maxPerFile, force).cache()
      val nextFill = SitemapState.advanceFill(fill, newCnt, maxPerFile)
      // the merge output IS the post-merge state of the due keys. TWO
      // file sets fall out: the RENDER set (files holding a flagged due
      // row, plus the stale-flagged carryover) and the wider STATS set
      // (every file holding ANY due row) — a non-flagged hit still
      // refreshes the row's bib_data_updated, so its file's index lastmod
      // can move without the file being rendered, and the summary must
      // track that exactly or the keyed index diverges from the full
      // recompute
      val flaggedFiles = newRows.filter(col("update_flag"))
        .select(col("sitemap_filename")).distinct()
        .collect().map(_.getString(0)).toSeq
      val dueFiles = newRows.filter(col("sitemap_filename").isNotNull)
        .select(col("sitemap_filename")).distinct()
        .collect().map(_.getString(0)).toSeq
      phase("file-sets")
      val renderSet = (flaggedFiles ++ staleFlaggedFiles).distinct.sorted
      val statSet = (dueFiles ++ staleFlaggedFiles).distinct.sorted
      if (statSet.isEmpty) {
        // nothing moved: statSet empty means no due key HAS or GAINS a
        // state row, so the publish this run would make is pure
        // never-present-key tombstones — reconciled away on read. Skip
        // it on both stores (less feed noise than r15's empty merge,
        // identical live state); the per-site static/index/robots still
        // refresh, as the full path's would
        newRows.unpersist(blocking = false)
        writeSiteMeta(spark, outRoot, siteKeys, summary, today)
        memberIndex.foreach(_.commit(stateStore.currentVersion.getOrElse(0L)))
        return (0L, summary.copy(
          generation = stateStore.currentVersion.getOrElse(0L),
          fillIndex = nextFill.index, fillCount = nextFill.count))
      }
      // member rows of the touched files (a whole file regenerates when
      // any member changed; output rows bounded by files touched ×
      // maxPerFile). With a member index this opens the touched files'
      // BUCKETS only — IO ∝ touched files, the reference's indexed member
      // fetch (tasks.py:986-990). Without one it is the pre-r16 shape:
      // the IN predicate pushes into the primary's scan but the
      // bibcode-bucketed layout cannot file-prune a filename predicate,
      // so every data file opens — a ∝-corpus pass per cron
      // both reads are PRE-publish (the cadence publishes ONCE, at the
      // end, to each store): overlay this run's newRows for the due keys
      // — both frames are in hand, ∝ delta — so the view equals the
      // post-publish state exactly
      def overlay(base: DataFrame): DataFrame = base
        .join(due, Seq("bibcode"), "left_anti")
        .unionByName(newRows.filter(col("sitemap_filename").isin(statSet: _*)))
        .cache()
      val members = memberIndex match {
        case Some(mi) => overlay(mi.membersOf(spark, statSet))
        case None => overlay(stateStore.read(spark)
          .filter(col("sitemap_filename").isin(statSet: _*)))
      }
      val renderMembers = members
        .filter(col("sitemap_filename").isin(renderSet: _*)).cache()
      if (trace) { members.count(); phase("members-materialize") }
      phase("members-read")
      val work = renderMembers.select(col("record_id").as("id"), col("bibcode"),
        col("sitemap_filename"),
        coalesce(date_format(col("bib_data_updated"), "yyyy-MM-dd"), lit(today))
          .as("lastmod"))
      if (renderSet.nonEmpty)
        for (key <- siteKeys)
          Sitemap.writeFiles(Sitemap.renderFiles(work, Sitemap.Sites(key)),
            s"$outRoot/$key")
      phase("render")
      // exact per-file stats of every touched file from the members
      // already in hand; untouched files keep their summary stats (valid
      // by the generation check — nothing else wrote the state)
      val touchedStats = members.groupBy(col("sitemap_filename"))
        .agg(max(date_format(col("bib_data_updated"), "yyyy-MM-dd")).as("max_nn"),
          max(when(col("bib_data_updated").isNull, 1).otherwise(0)).as("nulls"))
        .collect().map(r => SitemapCadence.FileStat(r.getString(0),
          Option(r.getString(1)), r.getInt(2) > 0)).toSeq
      phase("touched-stats")
      val statNames = statSet.toSet
      // a stale-flagged file emptied out-of-band (all members removed)
      // renders nothing and drops from the stats
      val files2 = (summary.files.filterNot(f => statNames(f.name)) ++ touchedStats)
        .sortBy(_.name)
      val next = SitemapCadence.Summary(0L, nextFill.index, nextFill.count, files2)
      writeSiteMeta(spark, outRoot, siteKeys, next, today)
      phase("site-meta")
      // ONE publish per store for the whole cadence, identical (keys,
      // rows) on both: the due keys' post rows — stamped where their
      // file was rendered, newRows' version elsewhere (every flagged row
      // is in a rendered file by construction, so no flag survives
      // unrendered) — plus the rendered files' stamped members; a due
      // key with no row tombstones on both sides. Rows are precomputed
      // from frames already in hand (the closure ignores `cur`: no
      // second table read), under the single-writer contract the CLI
      // cron lease enforces. Crash windows: before the primary publish —
      // clean redrive (cursor unadvanced, renders idempotent and
      // byte-identical); between primary and index publishes or before
      // the stamp — the mirror stamp goes stale and the next cadence
      // resyncs. The isNull guard keeps a hypothetical null-filename row
      // from being dropped by the NOT-isin (null ⇒ filter false), which
      // would tombstone a live key
      val stampedRows =
        if (renderSet.isEmpty) None
        else Some(SitemapState.markGenerated(renderMembers,
          renderSet.toDF("sitemap_filename"), now))
      val (pubKeys, pubRows) = stampedRows match {
        case Some(st) => (
          due.select(col("bibcode"))
            .unionByName(renderMembers.select(col("bibcode"))),
          st.unionByName(newRows.filter(col("sitemap_filename").isNull ||
            !col("sitemap_filename").isin(renderSet: _*))))
        case None => (due.select(col("bibcode")), newRows)
      }
      stateStore.writeMergeKeyed(spark, pubKeys, _ => pubRows)
      phase("publish-primary")
      memberIndex.foreach { mi =>
        mi.merge(spark, pubKeys, pubRows)
        mi.commit(stateStore.currentVersion.getOrElse(0L))
      }
      phase("publish-index")
      newRows.unpersist(blocking = false)
      renderMembers.unpersist(); members.unpersist()
      Sitemap.releasePinned()
      (renderSet.size.toLong,
        next.copy(generation = stateStore.currentVersion.getOrElse(0L)))
    } finally {
      preRows.unpersist(blocking = false)
      due.unpersist(blocking = false)
    }
  }

  /** Multi-site sitemap generation (the reference renders one output tree
    * per configured site, tasks.py:969-1055): one subdirectory per site
    * key, each with its bib files, static sitemap, index, and robots. */
  def runSitemapsAllSites(spark: SparkSession, store: MasterStore, outRoot: String,
      siteKeys: Seq[String] = Sitemap.Sites.keys.toSeq.sorted): Map[String, Long] =
    siteKeys.map(k => k -> runSitemaps(spark, store, s"$outRoot/$k", k)).toMap

  /** Sitemap generation over the live snapshot (SURVEY.md §3.3):
    * P7 include → W1 bucket → render → write files + index + robots. */
  def runSitemaps(spark: SparkSession, store: MasterStore, outDir: String,
      siteKey: String = "ads", maxPerFile: Int = Sitemap.MaxRecordsPerSitemap): Long = {
    val site = Sitemap.Sites(siteKey)
    val included = store.read(spark)
      .filter(Sitemap.shouldInclude)
      .select(col("id"), col("bibcode"),
        date_format(coalesce(col("bib_data_updated"), col("updated")), "yyyy-MM-dd").as("lastmod"))
    val assigned = Sitemap.assignFilenames(included, maxPerFile)
    val rendered = Sitemap.renderFiles(assigned, site).cache()
    Sitemap.writeFiles(rendered, outDir)
    // (filename, lastmod) pairs for the index: renderFiles carries
    // max(lastmod) per file, the analog of the reference's per-file mtime
    // (tasks.py:932-941) — an untouched file keeps its index lastmod, so
    // crawlers don't refetch files that didn't change
    val files = rendered.select(col("sitemap_filename"), col("file_lastmod")).collect()
      .map(r => r.getString(0) -> r.getString(1)).sortBy(_._1)
    rendered.unpersist()
    // writeFiles + the collect above fully materialized the ordinal frame,
    // so the partition-pinning cache inside withGlobalOrdinal is releasable
    Sitemap.releasePinned()
    val today = java.time.LocalDate.now.toString
    // driver-side writes go through the same Hadoop FileSystem as the
    // distributed bib files — outDir may be HDFS/S3, and an empty corpus
    // (zero partitions, so writeFiles never ran mkdirs) must still get
    // its static/index/robots files (the reference generates empty
    // indexes too)
    val dir = new org.apache.hadoop.fs.Path(outDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    def put(name: String, content: String): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(dir, name), true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
    }
    // static page sitemap precedes the bib files in the index; only the
    // static entry is stamped with the current date (tasks.py:916-928)
    put("sitemap_static.xml", Sitemap.renderStaticSitemap(site))
    put("sitemap_index.xml", Sitemap.renderIndex(site, files.toSeq,
      staticFirst = Seq("sitemap_static.xml" -> today)))
    put("robots.txt", Sitemap.renderRobots(site))
    files.length.toLong
  }
}
