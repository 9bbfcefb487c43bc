package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

import graft.records.UpdateMessage
import graft.streaming.{IngestStream, Watermark}

/** Streaming completeness-gate tests (ST1/ST2): a record emits only once
  * bib+nonbib+orcid have all arrived; late slots re-emit the fuller
  * record ("indexed twice — first with only metadata, later incl
  * fulltext", reference adsmp/tasks.py:317-337). */
class IngestStreamSpec extends AnyFunSuite with SparkSpec {

  def ts(s: String): Timestamp = Timestamp.from(java.time.Instant.parse(s))

  test("ST2 completeness gate over a MemoryStream") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext

    val input = MemoryStream[UpdateMessage]
    val gated = IngestStream.completenessGate(input.toDS())
    val query = gated.writeStream
      .format("memory").queryName("gated")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()

    try {
      // batch 1: incomplete (bib only) → nothing emitted
      input.addData(UpdateMessage("s1", "metadata", """{"title": ["t"]}""", ts("2024-01-01T00:00:00Z")))
      query.processAllAvailable()
      assert(session.sql("SELECT * FROM gated").count() == 0)

      // batch 2: the two remaining core slots arrive → one emission
      input.addData(
        UpdateMessage("s1", "nonbib_data", """{"boost": 0.1}""", ts("2024-01-01T00:01:00Z")),
        UpdateMessage("s1", "orcid_claims", """{"verified": []}""", ts("2024-01-01T00:02:00Z")))
      query.processAllAvailable()
      val emitted = session.sql("SELECT * FROM gated").as[graft.records.MasterRecord].collect()
      assert(emitted.length == 1)
      assert(emitted.head.bib_data.contains("""{"title": ["t"]}"""))
      assert(emitted.head.fulltext.isEmpty)

      // batch 3: late fulltext → re-emission with the fuller record
      input.addData(UpdateMessage("s1", "fulltext", """{"body": "b"}""", ts("2024-01-01T00:03:00Z")))
      query.processAllAvailable()
      val all = session.sql("SELECT * FROM gated").as[graft.records.MasterRecord].collect()
      assert(all.length == 2, "late arrival re-indexes")
      assert(all.exists(_.fulltext.contains("""{"body": "b"}""")))

      // batch 4: stale replay (older ts for an existing slot) → no emission
      input.addData(UpdateMessage("s1", "metadata", """{"title": ["old"]}""", ts("2023-12-01T00:00:00Z")))
      query.processAllAvailable()
      assert(session.sql("SELECT * FROM gated").count() == 2, "stale update ignored")

      // an unrelated incomplete bibcode stays gated
      input.addData(UpdateMessage("s2", "metadata", "{}", ts("2024-01-01T00:00:00Z")))
      query.processAllAvailable()
      assert(session.sql("SELECT * FROM gated").count() == 2)
    } finally query.stop()
  }

  test("gate function: force timeout flushes bib-only records (ST3)") {
    // drive the state-function directly (timeout paths are awkward to
    // trigger deterministically through a real stream)
    val st = IngestStream.SlotState(
      Map("bib_data" -> "{}"), Map("bib_data" -> 1000L), everEmitted = false)
    val out = IngestStream.toRecord("f1", st)
    assert(out.bib_data.contains("{}") && out.nonbib_data.isEmpty)
    assert(out.updated.map(_.getTime).contains(1000L))
  }

  test("post-force-flush updates re-emit even while incomplete") {
    import org.apache.spark.sql.streaming.TestGroupState
    // state after a force flush: everEmitted=true, bib only
    val flushed = IngestStream.SlotState(
      Map("bib_data" -> """{"v": 1}"""), Map("bib_data" -> 1000L), everEmitted = true)
    val state = TestGroupState.create[IngestStream.SlotState](
      org.apache.spark.api.java.Optional.of(flushed), org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      1000L, org.apache.spark.api.java.Optional.empty[Long], hasTimedOut = false)
    val out = IngestStream.gate(60000L)("b1",
      Iterator(UpdateMessage("b1", "metadata", """{"v": 2}""", ts("2024-01-01T00:00:02Z"))),
      state).toList
    assert(out.length == 1, "changed + everEmitted must re-emit despite incompleteness")
    assert(out.head.bib_data.contains("""{"v": 2}"""))

    // timeout on a bib-less record: no emission and no re-arm (a dormant
    // record must not hold a perpetual timer; arrival of its next message
    // re-arms via the data path)
    val bibless = IngestStream.SlotState(
      Map("metrics" -> "{}"), Map("metrics" -> 500L), everEmitted = false)
    val tState = TestGroupState.create[IngestStream.SlotState](
      org.apache.spark.api.java.Optional.of(bibless), org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      1000L, org.apache.spark.api.java.Optional.empty[Long], hasTimedOut = true)
    val tOut = IngestStream.gate(60000L)("b2", Iterator.empty, tState).toList
    assert(tOut.isEmpty)
    assert(!tState.getTimeoutTimestampMs.isPresent, "no perpetual timer for dormant records")
  }

  test("a deleted-status slot message CLEARS the slot in the gate — it must " +
    "not count toward completeness as a null payload") {
    import org.apache.spark.sql.streaming.TestGroupState
    // complete record in state; a deleted bib_data arrives
    val full = IngestStream.SlotState(
      Map("bib_data" -> "{}", "nonbib_data" -> "{}", "orcid_claims" -> "{}"),
      Map("bib_data" -> 1000L, "nonbib_data" -> 1000L, "orcid_claims" -> 1000L),
      everEmitted = true)
    val state = TestGroupState.create[IngestStream.SlotState](
      org.apache.spark.api.java.Optional.of(full),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      2000L, org.apache.spark.api.java.Optional.empty[Long], hasTimedOut = false)
    val out = IngestStream.gate(0L)("d1",
      Iterator(UpdateMessage("d1", "metadata", null,
        ts("2024-01-01T00:00:05Z"), status = Some("deleted"))),
      state).toList
    assert(state.get.payloads.get("bib_data").isEmpty,
      "the slot is gone, not present-with-null")
    // the re-emission (everEmitted) carries a record without bib_data —
    // downstream transforms see None, never Some(null)
    assert(out.forall(_.bib_data.isEmpty))

    // a fresh record whose ONLY arrival is a deleted slot never completes
    val empty = TestGroupState.create[IngestStream.SlotState](
      org.apache.spark.api.java.Optional.empty[IngestStream.SlotState],
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      2000L, org.apache.spark.api.java.Optional.empty[Long], hasTimedOut = false)
    val none = IngestStream.gate(0L)("d2",
      Iterator(
        UpdateMessage("d2", "metadata", null, ts("2024-01-01T00:00:01Z"),
          status = Some("deleted")),
        UpdateMessage("d2", "nonbib_data", "{}", ts("2024-01-01T00:00:02Z")),
        UpdateMessage("d2", "orcid_claims", "{}", ts("2024-01-01T00:00:03Z"))),
      empty).toList
    assert(none.isEmpty, "cleared bib_data keeps the record gated")
  }

  test("ST5 retry schedule: 10s x20 + 30s x30 + 60s x50, ~90 min budget") {
    import graft.streaming.RetrySchedule
    assert(RetrySchedule.delay(0) == Some(10))
    assert(RetrySchedule.delay(19) == Some(10))
    assert(RetrySchedule.delay(20) == Some(30))
    assert(RetrySchedule.delay(49) == Some(30))
    assert(RetrySchedule.delay(50) == Some(60))
    assert(RetrySchedule.delay(99) == Some(60))
    assert(RetrySchedule.delay(100) == None)
    assert(RetrySchedule.totalBudgetSeconds() == 10 * 20 + 30 * 30 + 60 * 50) // 4100s ≈ 68m of sleep
    // succeeds on the 3rd poll without real sleeping
    var polls = 0
    val slept = scala.collection.mutable.ArrayBuffer.empty[Int]
    val res = RetrySchedule.retryUntil(
      () => { polls += 1; if (polls == 3) Some("done") else None },
      sleep = slept += _)
    assert(res == Some("done") && polls == 3 && slept.toSeq == Seq(10, 10))
    // exhaustion path
    val none = RetrySchedule.retryUntil(() => None, maxRetries = 3, sleep = _ => ())
    assert(none == None)
  }

  test("M6 truncate with backup keeps the old snapshot aside") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_trunc").toString
    val store = new graft.sources.MasterStore(root, numBuckets = 1)
    val master = graft.operators.MergeEngine.upsert(
      graft.operators.MergeEngine.emptyMaster(spark),
      Seq(graft.records.UpdateMessage("t1", "metadata", "{}",
        ts("2024-01-01T00:00:00Z"))).toDS()).master
    store.write(master)
    assert(store.read(spark).count() == 1)
    val backup = java.nio.file.Files.createTempDirectory("graft_backup").toString
    store.truncate(spark, backup)
    assert(store.read(spark).count() == 0, "live table is empty after truncate")
    assert(new java.io.File(backup).listFiles.exists(_.getName.startsWith("v_")),
      "old snapshot parked in the backup dir")
  }

  test("ST1 watermark store: read missing, advance, re-advance") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wm").toString + "/kv"
    assert(Watermark.read(spark, dir, "last.reindex.normal").isEmpty)
    Watermark.advance(spark, dir, "last.reindex.normal", ts("2024-01-01T00:00:00Z"))
    assert(Watermark.read(spark, dir, "last.reindex.normal")
      .contains(ts("2024-01-01T00:00:00Z")))
    Watermark.advance(spark, dir, "last.reindex.forced", ts("2024-02-01T00:00:00Z"))
    Watermark.advance(spark, dir, "last.reindex.normal", ts("2024-03-01T00:00:00Z"))
    assert(Watermark.read(spark, dir, "last.reindex.normal")
      .contains(ts("2024-03-01T00:00:00Z")))
    assert(Watermark.read(spark, dir, "last.reindex.forced")
      .contains(ts("2024-02-01T00:00:00Z")))
  }

  test("ST1 watermark survives a crash between park and rename-in") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wmc").toString + "/kv"
    Watermark.advance(spark, dir, "last.reindex.normal", ts("2024-01-01T00:00:00Z"))
    // simulate the advance crashing right after parking the live dir
    // aside: the live dir is gone, only the .old backup remains
    val live = java.nio.file.Paths.get(dir)
    val backup = java.nio.file.Paths.get(dir + ".old")
    java.nio.file.Files.move(live, backup)
    assert(Watermark.read(spark, dir, "last.reindex.normal")
      .contains(ts("2024-01-01T00:00:00Z")),
      "read falls back to the parked backup — no full-corpus reprocess")
    // the next advance heals: backup cleared, live dir re-established
    Watermark.advance(spark, dir, "last.reindex.normal", ts("2024-02-01T00:00:00Z"))
    assert(Watermark.read(spark, dir, "last.reindex.normal")
      .contains(ts("2024-02-01T00:00:00Z")))
    assert(!java.nio.file.Files.exists(backup), "backup dropped after a clean swap")
  }
}
