package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.records.UpdateMessage
import graft.sources.{MasterStore, Sinks}

/** ST1/ST4 crash-recovery evidence: `Pipeline.runStream` killed and
  * restarted against the same checkpoint dir neither skips data nor
  * re-delivers to the sinks.
  *
  * Ports the reference's at-least-once tolerance story
  * (adsmp/tasks.py:404-429 — a redelivered queue message re-merges
  * idempotently and the checksum gate keeps SOLR quiet): the "crash" is
  * simulated the standard Structured Streaming way, by deleting the last
  * entry in `checkpoint/commits/` after stopping the query — the batch
  * was fully processed (sinks fired, store advanced) but the engine never
  * learned, which is exactly the window a real crash hits. On restart the
  * batch REPLAYS, and the pipeline's own idempotence (upsert merge +
  * P3 processed-suppression + P4 checksum suppression) must absorb it. */
class StreamRecoverySpec extends AnyFunSuite with SparkSpec {
  import StreamRecoverySpec._

  private def writeSegment(dir: String, name: String, msgs: Seq[UpdateMessage]): Unit = {
    val lines = msgs.map { m =>
      val payload = org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(org.json4s.JString(m.payload)))
      val ts = java.time.Instant.ofEpochMilli(m.ts.getTime).toString
      s"""{"bibcode":"${m.bibcode}","mtype":"${m.mtype}","payload":$payload,"ts":"$ts"}"""
    }
    java.nio.file.Files.write(Paths.get(dir, name),
      lines.mkString("\n").getBytes("UTF-8"))
  }

  // complete record (bib + nonbib + orcid) so the ST2/P2 completeness gate
  // passes without force — the replay suppression under test is the real
  // P3/P4 machinery, not a forced sweep. Timestamps are relative to the
  // wall clock because `processed` is stamped with real now: a slot update
  // must land AFTER the first run's processed stamp to re-select (exactly
  // like live queue traffic)
  private def fullRecord(bib: String, title: String, ts: Timestamp): Seq[UpdateMessage] = {
    Seq(
      UpdateMessage(bib, "metadata", s"""{"bibcode": "$bib", "title": ["$title"]}""", ts),
      UpdateMessage(bib, "nonbib_data", """{"boost": 0.1}""",
        new Timestamp(ts.getTime + 100)),
      UpdateMessage(bib, "orcid_claims", """{"verified": ["0000-0001"]}""",
        new Timestamp(ts.getTime + 200)))
  }

  test("kill + restart on one checkpoint: batch replays, sinks stay quiet") {
    val root = Files.createTempDirectory("graft_recover").toString
    val in = s"$root/in"
    Files.createDirectories(Paths.get(in))
    val ckpt = s"$root/ckpt"
    val store = new MasterStore(s"$root/master")
    val transport = new RecordingTransport
    delivered.clear()

    def startQuery() = {
      val updates = spark.readStream
        .schema(Encoders.product[UpdateMessage].schema)
        .json(in)
        .as[UpdateMessage](Encoders.product[UpdateMessage])
      Pipeline.runStream(spark, store, updates, transport, transport, ckpt)
    }

    // ── segment 1: two complete records stream through ──
    val base = System.currentTimeMillis()
    writeSegment(in, "seg1.json",
      fullRecord("2024Rcv.....1....A", "one", new Timestamp(base - 7200000L)) ++
        fullRecord("2024Rcv.....2....B", "two", new Timestamp(base - 3600000L)))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    assert(store.read(spark).count() == 2)
    val solrDocs0 = delivered.size()
    assert(solrDocs0 == 2, s"both records delivered once: $delivered")
    val checksums0 = store.read(spark).collect()
      .map(r => r.getAs[String]("bibcode") -> r.getAs[String]("solr_checksum")).toMap
    assert(checksums0.values.forall(_ != null), "delivery stamped checksums")
    val v0 = store.currentVersion.get

    // ── crash: the engine forgets the batch committed (processing already
    // happened — the exact at-least-once replay window) ──
    val commits = Paths.get(ckpt, "commits").toFile.listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.nonEmpty)
    assert(commits.last.delete(), "simulated crash before commit")
    // the local FS keeps a checksum shadow next to each commit file; left
    // behind it would block the replayed batch's re-commit rename
    val crc = new java.io.File(commits.last.getParentFile,
      s".${commits.last.getName}.crc")
    if (crc.exists()) assert(crc.delete())

    // ── restart: batch 0 replays; the upsert re-merges the same slots and
    // P3 (all slot timestamps < processed) suppresses re-selection, so no
    // payload is rebuilt and nothing reaches the sinks again (ST4) ──
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      assert(delivered.size() == solrDocs0,
        s"replayed batch re-delivered nothing: $delivered")
      assert(store.read(spark).count() == 2, "no duplicate rows from the re-merge")
      val checksums1 = store.read(spark).collect()
        .map(r => r.getAs[String]("bibcode") -> r.getAs[String]("solr_checksum")).toMap
      assert(checksums1 == checksums0, "replay left the stamped state intact (ST1)")
      assert(store.currentVersion.get > v0,
        "the replayed micro-batch ran (a new snapshot version proves it was " +
          "processed and absorbed, not skipped)")

      // ── segment 2 against the SAME running query: a real update to
      // record 1 plus a touched-but-identical orcid re-send for record 2.
      // The update flows through; the touch re-selects record 2 (its slot
      // is newer than processed) but P4 sees an unchanged checksum ──
      writeSegment(in, "seg2.json", Seq(
        UpdateMessage("2024Rcv.....1....A", "metadata",
          """{"bibcode": "2024Rcv.....1....A", "title": ["one v2"]}""",
          new Timestamp(base + 3600000L)),
        UpdateMessage("2024Rcv.....2....B", "orcid_claims",
          """{"verified": ["0000-0001"]}""",
          new Timestamp(base + 3600000L))))
      q2.processAllAvailable()
    } finally q2.stop()

    assert(delivered.size() == solrDocs0 + 1,
      s"only the genuinely changed doc went out: $delivered")
    val titles = store.read(spark).collect()
      .map(r => r.getAs[String]("bibcode") ->
        get_json_titles(r.getAs[String]("bib_data"))).toMap
    assert(titles("2024Rcv.....1....A") == "one v2", "the post-restart update landed")
    assert(titles("2024Rcv.....2....B") == "two")
  }

  private def get_json_titles(bib: String): String =
    (org.json4s.jackson.JsonMethods.parse(bib) \ "title") match {
      case org.json4s.JArray(org.json4s.JString(t) :: _) => t
      case _                                             => ""
    }
}

object StreamRecoverySpec {
  /** Static so the transport closure serializes without the suite. */
  val delivered = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  class RecordingTransport extends Sinks.Transport with Serializable {
    def send(p: Seq[String]): Unit = p.foreach(delivered.add)
  }
}
