package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingAnomaly
import graft.streaming.StreamingAnomaly.{AnomalyVerdict, RawEvent, WindowCount}

/** Streaming volume-anomaly detection: verdict semantics, state carrying
  * the baseline across micro-batches, z-parity with the batch ev_anomaly
  * row on the same hourly counts, and the event-time upstream itself —
  * the watermarked tumbling aggregation with its late-event finality. */
class StreamingAnomalySpec extends AnyFunSuite with SparkSpec {

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("event-time upstream: out-of-order events inside the watermark " +
    "budget land in their window; an event older than the watermark is " +
    "dropped and never rewrites the emitted window") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext

    val input = MemoryStream[RawEvent]
    val query = StreamingAnomaly.hourlyCounts(input.toDS(), delay = "1 hour")
      .writeStream.format("memory").queryName("hcounts")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    def rows() = session.sql("SELECT * FROM hcounts").as[WindowCount]
      .collect().map(w => w.window_start -> w.n).toSeq

    try {
      // hour-0 events arrive OUT OF ORDER within the batch — event time,
      // not arrival order, decides the window
      input.addData(RawEvent("click", ts(3000)), RawEvent("click", ts(600)),
        RawEvent("click", ts(1800)))
      query.processAllAvailable()
      assert(rows().isEmpty, "no window emits before the watermark passes it")

      // an hour-1 event plus one at 2:40 → watermark = 9600 − 3600 = 6000,
      // which closes ONLY the hour-0 window (end 3600 ≤ 6000 < 7200)
      input.addData(RawEvent("click", ts(4200)), RawEvent("click", ts(9600)))
      query.processAllAvailable()
      assert(rows() == Seq(0L -> 3L),
        s"hour 0 emits once with all three out-of-order events: ${rows()}")

      // a LATE hour-0 event (ts 3540 < watermark 6000) must be dropped —
      // append-mode finality: the emitted row is never rewritten or
      // re-emitted; the in-budget hour-1 event still lands
      input.addData(RawEvent("click", ts(3540)), RawEvent("click", ts(6600)))
      query.processAllAvailable()
      assert(rows() == Seq(0L -> 3L),
        s"late event neither re-emits nor rewrites hour 0: ${rows()}")

      // advance the watermark past hours 1 and 2: both emit, hour 1
      // counts 4200 + 6600 but NOT the dropped 3540
      input.addData(RawEvent("click", ts(14400)))
      query.processAllAvailable()
      assert(rows().sorted == Seq(0L -> 3L, 3600L -> 2L, 7200L -> 1L),
        s"exactly one final row per closed window: ${rows().sorted}")
    } finally query.stop()
  }

  test("the composed event-time pipeline (watermarked tumbling agg → " +
    "anomaly state) z-matches the batch ev_anomaly on the same events") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext

    val counts = Seq(6, 2, 9, 4, 4, 30, 5, 1)
    // batch side: the same events as an events table (nanos like testdata)
    val dir = java.nio.file.Files.createTempDirectory("graft_sanom_et").toString
    def ns(sec: Long) = sec * 1000000000L
    val eventRows = counts.zipWithIndex.flatMap { case (n, h) =>
      (0 until n).map(i =>
        (h * 1000L + i, ns(h * 3600L + i * 60L), 1L, "click", 1.0, "{}"))
    }
    eventRows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = SparkEntry.queries("ev_anomaly")(spark, dir)
      .filter($"event_type" === "click").collect()
      .map(r => r.getLong(0) -> ((if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        r.getBoolean(6)))).toMap

    // stream side, stage 1: raw events through the watermarked upstream —
    // each micro-batch carries two consecutive hours SHUFFLED together
    // (out-of-order inside the 1-hour budget, never beyond it, so nothing
    // is legitimately late); a distinct-type sentinel then advances the
    // watermark past the last hour so every click window closes
    val rnd = new scala.util.Random(7)
    val batches = counts.zipWithIndex.grouped(2).map { hrs =>
      rnd.shuffle(hrs.flatMap { case (n, h) =>
        (0 until n).map(i => RawEvent("click", ts(h * 3600L + i * 60L)))
      }.toVector)
    }.toSeq
    val input1 = MemoryStream[RawEvent]
    val q1 = StreamingAnomaly.hourlyCounts(input1.toDS(), delay = "1 hour")
      .writeStream.format("memory").queryName("hcounts2")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    val emitted = try {
      batches.foreach { g =>
        input1.addData(g: _*); q1.processAllAvailable()
      }
      input1.addData(RawEvent("sentinel", ts(12 * 3600L)))
      q1.processAllAvailable()
      session.sql("SELECT * FROM hcounts2").as[WindowCount].collect()
        .filter(_.event_type == "click").sortBy(_.window_start)
    } finally q1.stop()
    assert(emitted.map(w => w.window_start -> w.n).toSeq ==
      counts.zipWithIndex.map { case (n, h) => (h * 3600L) -> n.toLong },
      "every hourly window emitted exactly once with the full count")

    // stage 2: the emitted summaries feed the anomaly state (in a second
    // query, as deployed: a summary topic sits between them)
    val input2 = MemoryStream[WindowCount]
    val q2 = StreamingAnomaly.anomalyStream(input2.toDS())
      .writeStream.format("memory").queryName("anom_et")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input2.addData(emitted.toIndexedSeq: _*)
      q2.processAllAvailable()
      val stream = session.sql("SELECT * FROM anom_et").as[AnomalyVerdict]
        .collect().map(v => v.window_start -> ((v.z, v.anomalous))).toMap
      assert(stream.keySet == batch.keySet)
      for ((h, (bz, ba)) <- batch) {
        val (sz, sa) = stream(h)
        assert(sa == ba, s"alert flag agrees at $h: stream=$sa batch=$ba")
        (sz, bz) match {
          case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9,
            s"z agrees at $h: $a vs $b")
          case (a, b) => assert(a == b, s"null-z agrees at $h: $a vs $b")
        }
      }
      assert(batch.values.exists(_._2), "the fixture actually alerts somewhere")
    } finally q2.stop()
  }

  test("alerts on the spike with the batch row's z, stays quiet through " +
    "warmup and zero-variance baselines, and the baseline survives " +
    "micro-batch boundaries") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext

    val input = MemoryStream[WindowCount]
    val query = StreamingAnomaly.anomalyStream(input.toDS())
      .writeStream.format("memory").queryName("anom1")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1: clicks 3, 5, 4 and constant views — no alerts possible
      input.addData(
        WindowCount("click", 0L, 3), WindowCount("click", 3600L, 5),
        WindowCount("click", 7200L, 4),
        WindowCount("view", 0L, 2), WindowCount("view", 3600L, 2))
      query.processAllAvailable()
      // batch 2: one more quiet hour, then the spike — baseline must
      // include batch 1's counts via state
      input.addData(
        WindowCount("click", 10800L, 4), WindowCount("click", 14400L, 20),
        WindowCount("view", 7200L, 2))
      query.processAllAvailable()
      val out = session.sql("SELECT * FROM anom1").as[AnomalyVerdict]
        .collect().map(v => (v.event_type, v.window_start) -> v).toMap

      assert(out(("click", 0L)).z.isEmpty, "no baseline yet")
      assert(out(("click", 3600L)).z.isEmpty, "one sample has no stddev")
      assert(out(("click", 7200L)).z.contains(0.0) &&
        !out(("click", 7200L)).anomalous,
        s"in-range hour: n=4 vs baseline mean of (3,5): ${out(("click", 7200L))}")
      // spike baseline (3,5,4,4): mean 4, sample sd √(2/3)
      val expZ = BigDecimal(16.0 / math.sqrt(2.0 / 3.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val spike = out(("click", 14400L))
      assert(spike.z.contains(expZ) && spike.anomalous,
        s"cross-batch baseline feeds the spike's z=$expZ: $spike")
      assert(Seq(0L, 3600L, 7200L).forall(h => !out(("view", h)).anomalous &&
        out(("view", h)).z.isEmpty),
        "zero-variance type never alerts")
    } finally query.stop()
  }

  test("streamed hourly counts reproduce the batch ev_anomaly verdicts " +
    "on a shared fixture") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext

    // batch side: real events, the catalog query derives hourly counts
    val dir = java.nio.file.Files.createTempDirectory("graft_sanom").toString
    def ns(sec: Long) = sec * 1000000000L
    val counts = Seq(6, 2, 9, 4, 4, 30, 5, 1)
    val events = counts.zipWithIndex.flatMap { case (n, h) =>
      (0 until n).map(i =>
        (h * 1000L + i, ns(h * 3600L + i), 1L, "click", 1.0, "{}"))
    }
    events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = SparkEntry.queries("ev_anomaly")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        r.getBoolean(6)))).toMap

    val input = MemoryStream[WindowCount]
    val query = StreamingAnomaly.anomalyStream(input.toDS())
      .writeStream.format("memory").queryName("anom2")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(counts.zipWithIndex.map { case (n, h) =>
        WindowCount("click", h * 3600L, n.toLong) }: _*)
      query.processAllAvailable()
      val stream = session.sql("SELECT * FROM anom2").as[AnomalyVerdict]
        .collect().map(v => v.window_start -> ((v.z, v.anomalous))).toMap
      assert(stream.keySet == batch.keySet)
      for ((h, (bz, ba)) <- batch) {
        val (sz, sa) = stream(h)
        assert(sa == ba, s"alert flag agrees at hour $h: stream=$sa batch=$ba")
        (sz, bz) match {
          case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9,
            s"z agrees at hour $h: $a vs $b")
          case (a, b) => assert(a == b, s"null-z agrees at hour $h: $a vs $b")
        }
      }
      assert(batch.values.exists(_._2), "the fixture actually alerts somewhere")
    } finally query.stop()
  }
}
