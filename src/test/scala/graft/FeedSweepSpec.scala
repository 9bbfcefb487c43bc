package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.operators.IndexJob
import graft.records.UpdateMessage
import graft.sources.{MasterStore, Sinks}
import graft.streaming.Watermark

/** Feed-driven incremental indexing (Pipeline.runFeedSweep): per-cadence
  * work discovery from the store's change feed instead of the reference's
  * full-snapshot watermark scan (run.py:147-159). The load-bearing claim
  * is SELECTION PARITY — the feed-driven sweep must index exactly the
  * records the table-wide gate would have selected — plus the fallback
  * ladder: behind the feed horizon → automatic table-wide scan; cursor
  * ahead of the live store → loud failure. */
class FeedSweepSpec extends AnyFunSuite with SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def msgs(bib: String, t: String, rev: Int = 0): Seq[UpdateMessage] = Seq(
    UpdateMessage(bib, "metadata",
      s"""{"bibcode": "$bib", "title": ["T $bib rev$rev"], "database": ["astronomy"]}""",
      ts(t)),
    UpdateMessage(bib, "nonbib_data", s"""{"boost": 0.$rev}""", ts(t)),
    UpdateMessage(bib, "orcid_claims", """{"verified": []}""", ts(t)))

  private val okTransport = new Sinks.Transport { def send(p: Seq[String]): Unit = () }

  /** The table-wide watermark scan's selection — exactly what the
    * table-wide runBatch gates on (read + eligible), computed read-only. */
  private def watermarkSelection(store: MasterStore,
      since: Option[Timestamp]): Set[String] =
    store.read(spark).filter(IndexJob.eligible(since, force = false))
      .select("bibcode").collect().map(_.getString(0)).toSet

  /** Merge a batch WITHOUT indexing it (sinks off): leaves the records
    * pending — updated moved, processed stale — the state a cadence
    * sweep exists to discover. */
  private def mergeOnly(store: MasterStore, batch: Seq[UpdateMessage],
      now: Timestamp): Unit = {
    import spark.implicits._
    Pipeline.runBatch(spark, store, batch.toDS(), okTransport, okTransport,
      now = now, sinks = Set.empty, keyLocal = true)
    ()
  }

  test("selection parity: the feed-driven sweep indexes exactly the " +
      "records the table-wide watermark scan would select, and a second " +
      "sweep over its own stamps selects nothing") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fs1").toString
    val store = new MasterStore(root, numBuckets = 2)
    // standing corpus: three records fully indexed
    Pipeline.runBatch(spark, store,
      (msgs("fsA", "2024-01-01 00:00:00") ++ msgs("fsB", "2024-01-01 00:00:00")
        ++ msgs("fsC", "2024-01-01 00:00:00")).toDS(),
      okTransport, okTransport, now = ts("2024-01-02 00:00:00"))
    val cursor = store.currentVersion.get
    // pending wave: two updated records + one new, merged but not indexed
    mergeOnly(store, msgs("fsA", "2024-01-03 00:00:00", rev = 1) ++
      msgs("fsC", "2024-01-03 00:00:00", rev = 1) ++
      msgs("fsD", "2024-01-03 00:00:00"), now = ts("2024-01-03 00:30:00"))

    val expected = watermarkSelection(store, None)
    assert(expected == Set("fsA", "fsC", "fsD"),
      s"fixture sanity: the pending wave is what the gate selects, got $expected")

    val now = ts("2024-01-04 00:00:00")
    val sweep = Pipeline.runFeedSweep(spark, store, okTransport, okTransport,
      fromGen = Some(cursor), now = now)
    assert(sweep.usedFeed, "discovery came from the change feed")
    assert(sweep.run.indexed == 3 && sweep.run.solrOk == 3)
    // the stamped rows ARE the selection — parity at the value level
    val stamped = store.read(spark)
      .filter(col("solr_processed") === lit(now))
      .select("bibcode").collect().map(_.getString(0)).toSet
    assert(stamped == expected,
      s"feed-driven selection must equal the watermark scan's: $stamped")
    // untouched record undisturbed
    assert(store.read(spark).filter(col("bibcode") === "fsB")
      .select("solr_processed").head().getTimestamp(0) != now)

    // next cadence: the feed window now holds only this sweep's own
    // stamps; the gate (processed >= updated) selects none of them
    val sweep2 = Pipeline.runFeedSweep(spark, store, okTransport, okTransport,
      fromGen = Some(sweep.nextFromGen), now = ts("2024-01-05 00:00:00"))
    assert(sweep2.usedFeed && sweep2.run.indexed == 0 && sweep2.run.solrOk == 0,
      "a caught-up cadence discovers nothing to index")
    assert(sweep2.nextFromGen > sweep.nextFromGen,
      "the cursor advances past the first sweep's stamp publishes")
  }

  test("behind the feed horizon the sweep falls back to the table-wide " +
      "scan — same selection, usedFeed=false") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fs2").toString
    // retention OFF so one compaction folds the whole feed history away
    val store = new MasterStore(root, numBuckets = 2, feedRetainFolds = 0)
    Pipeline.runBatch(spark, store,
      (msgs("fbA", "2024-01-01 00:00:00") ++
        msgs("fbB", "2024-01-01 00:00:00")).toDS(),
      okTransport, okTransport, now = ts("2024-01-02 00:00:00"))
    val cursor = store.currentVersion.get
    mergeOnly(store, msgs("fbA", "2024-01-03 00:00:00", rev = 1),
      now = ts("2024-01-03 00:30:00"))
    store.compact(spark) // folds the pending layer: cursor is now behind
    assert(store.stats.get.feedFrom > cursor)

    val expected = watermarkSelection(store, None)
    assert(expected == Set("fbA"))
    val now = ts("2024-01-04 00:00:00")
    val sweep = Pipeline.runFeedSweep(spark, store, okTransport, okTransport,
      fromGen = Some(cursor), now = now)
    assert(!sweep.usedFeed, "horizon miss falls back to the watermark scan")
    assert(sweep.run.indexed == 1 && sweep.run.solrOk == 1)
    assert(store.read(spark).filter(col("solr_processed") === lit(now))
      .select("bibcode").collect().map(_.getString(0)).toSet == expected)
  }

  test("force bypasses feed discovery: a forced rebuild means the CORPUS, " +
      "not the cursor's window — feed-windowing a post-wipe -f would " +
      "silently rebuild only the delta") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fsf").toString
    val store = new MasterStore(root, numBuckets = 2)
    Pipeline.runBatch(spark, store,
      (msgs("fcA", "2024-01-01 00:00:00") ++
        msgs("fcB", "2024-01-01 00:00:00")).toDS(),
      okTransport, okTransport, now = ts("2024-01-02 00:00:00"))
    val cursor = store.currentVersion.get
    mergeOnly(store, msgs("fcC", "2024-01-03 00:00:00"),
      now = ts("2024-01-03 00:30:00"))
    val sweep = Pipeline.runFeedSweep(spark, store, okTransport, okTransport,
      fromGen = Some(cursor), force = true, ignoreChecksums = true,
      now = ts("2024-01-04 00:00:00"))
    assert(!sweep.usedFeed, "forced sweeps are table-wide by definition")
    assert(sweep.run.solrOk == 3,
      s"the forced rebuild re-sends the whole corpus, got ${sweep.run}")
  }

  test("a cursor AHEAD of the live generation fails loudly — no silent " +
      "full sweep over a store the cursor never saw") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fs3").toString
    val store = new MasterStore(root, numBuckets = 2)
    Pipeline.runBatch(spark, store, msgs("fa1", "2024-01-01 00:00:00").toDS(),
      okTransport, okTransport, now = ts("2024-01-02 00:00:00"))
    val e = intercept[IllegalStateException] {
      Pipeline.runFeedSweep(spark, store, okTransport, okTransport,
        fromGen = Some(store.currentVersion.get + 10),
        now = ts("2024-01-03 00:00:00"))
    }
    assert(e.getMessage.contains("AHEAD"))
  }

  test("turn-key cadence mode: the persisted generation cursor bootstraps " +
      "table-wide once, then every sweep discovers from the feed") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fs4").toString
    val wm = java.nio.file.Files.createTempDirectory("graft_fs4wm").toString + "/kv"
    val store = new MasterStore(root, numBuckets = 2)
    mergeOnly(store, msgs("tk1", "2024-01-01 00:00:00"),
      now = ts("2024-01-01 00:30:00"))

    // sweep 1: no cursor stored yet → bootstrap table-wide
    val s1 = Pipeline.runFeedSweep(spark, store, okTransport, okTransport,
      watermarkDir = Some(wm), now = ts("2024-01-02 00:00:00"))
    assert(!s1.usedFeed && s1.run.solrOk == 1)
    assert(Watermark.readGen(spark, wm, Pipeline.GenCursorKey).contains(s1.nextFromGen),
      "the cursor persists alongside the time watermark")

    // sweep 2: cursor present → feed-driven; new pending record found
    mergeOnly(store, msgs("tk2", "2024-01-03 00:00:00"),
      now = ts("2024-01-03 00:30:00"))
    val s2 = Pipeline.runFeedSweep(spark, store, okTransport, okTransport,
      watermarkDir = Some(wm), now = ts("2024-01-04 00:00:00"))
    assert(s2.usedFeed, "second sweep reads the persisted cursor")
    assert(s2.run.solrOk == 1)
    val done = store.read(spark).filter(col("status") === "success").count()
    assert(done == 2, "both records indexed across the two cadences")
  }
}
