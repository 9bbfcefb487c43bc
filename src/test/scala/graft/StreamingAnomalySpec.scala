package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingAnomaly
import graft.streaming.StreamingAnomaly.{AnomalyVerdict, WindowCount}

/** Streaming volume-anomaly detection: verdict semantics, state carrying
  * the baseline across micro-batches, and z-parity with the batch
  * ev_anomaly row on the same hourly counts. */
class StreamingAnomalySpec extends AnyFunSuite with SparkSpec {

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
