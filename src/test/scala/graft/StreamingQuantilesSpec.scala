package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingQuantiles
import graft.streaming.StreamingQuantiles.{Ev, QuantileSnapshot, TsEv, WindowQuantiles}

/** Streaming histogram-quantile sketch: cross-batch accumulation,
  * value parity with the batch `ev_quantile_sketch` interpolation at
  * equal bounds, clamp accounting, and exactly-once counts across a
  * crash/replay on one checkpoint. */
class StreamingQuantilesSpec extends AnyFunSuite with SparkSpec {

  // deterministic fixture: 204 events over two types, values 0..99;
  // both types carry the extrema explicitly so the batch row (which
  // derives per-type min/max) gets the same [0, 99] bounds the stream
  // is constructed with — the parity precondition
  private val fixture: Seq[Ev] =
    (0 until 200).map(i => Ev(if (i % 2 == 0) "click" else "view",
      ((i * 7) % 100).toDouble)) ++
      Seq(Ev("click", 0.0), Ev("click", 99.0), Ev("view", 0.0), Ev("view", 99.0))

  private def lastSnapshots(rows: Seq[QuantileSnapshot]): Map[String, QuantileSnapshot] =
    rows.groupBy(_.event_type).view.mapValues(_.last).toMap

  test("accumulates across batches and matches the batch interpolation " +
    "at equal bounds") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext

    // batch reference: the SAME rows as an events table, quantiles from
    // the catalog row (whose lo/hi are the data min/max — so the stream
    // gets those bounds and the two formulas must agree exactly)
    val dir = java.nio.file.Files.createTempDirectory("graft_sq").toString
    fixture.zipWithIndex.map { case (e, i) =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L),
        i.toLong % 7, e.event_type, e.value, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = SparkEntry.queries("ev_quantile_sketch")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Double]("est_p95"))).toMap

    val input = MemoryStream[Ev]
    val q = StreamingQuantiles.histogramStream(input.toDS(), lo = 0.0, hi = 99.0)
      .writeStream.format("memory").queryName("squant")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(fixture.take(120): _*)
      q.processAllAvailable()
      input.addData(fixture.drop(120): _*)
      q.processAllAvailable()
      val snaps = lastSnapshots(
        session.sql("SELECT * FROM squant").as[QuantileSnapshot].collect().toSeq)
      assert(snaps.keySet == Set("click", "view"))
      for ((k, s) <- snaps) {
        assert(s.n == 102L, s"$k sees all its events across batches: $s")
        assert(s.buckets.sum == 102L)
        assert(s.n_clamped == 0L, "bounds cover the domain, nothing clamps")
        assert(s.n == batch(k)._1)
        assert(math.abs(s.est_p95 - batch(k)._2) < 1e-6,
          s"$k: stream ${s.est_p95} == batch ${batch(k)._2} at equal bounds")
        assert(s.est_p50 > 30.0 && s.est_p50 < 70.0, s"sane median: $s")
      }
    } finally q.stop()
  }

  test("out-of-domain values clamp into edge buckets and are counted") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingQuantiles.histogramStream(input.toDS(), lo = 0.0, hi = 10.0)
      .writeStream.format("memory").queryName("squant_clamp")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(Ev("t", -5.0), Ev("t", 3.0), Ev("t", 99.0), Ev("t", 10.0))
      q.processAllAvailable()
      val s = lastSnapshots(session.sql("SELECT * FROM squant_clamp")
        .as[QuantileSnapshot].collect().toSeq)("t")
      // -5 → bucket 0, 99 and the hi edge → bucket 31
      assert(s.n == 4L && s.n_clamped == 2L, s"clamps visible: $s")
      assert(s.buckets.head == 1L && s.buckets.last == 2L, s"edge buckets: $s")
    } finally q.stop()
  }

  test("non-finite values never skew the histogram: NaN counts as clamped " +
    "and lands in NO bucket; infinities clamp to the edges") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingQuantiles.histogramStream(input.toDS(), lo = 0.0, hi = 10.0)
      .writeStream.format("memory").queryName("squant_nan")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // regression (r10 advice): NaN < lo and NaN > hi are both false and
      // floor(NaN).toInt == 0 — the unguarded form silently put NaN in
      // bucket 0 with n_clamped untouched, skewing p50/p95 invisibly
      input.addData(Ev("t", Double.NaN), Ev("t", 5.0), Ev("t", 5.0),
        Ev("t", Double.PositiveInfinity), Ev("t", Double.NegativeInfinity))
      q.processAllAvailable()
      val s = lastSnapshots(session.sql("SELECT * FROM squant_nan")
        .as[QuantileSnapshot].collect().toSeq)("t")
      assert(s.n == 4L, s"NaN is dropped from the histogram, n excludes it: $s")
      assert(s.n_clamped == 3L, s"NaN and both infinities are visible: $s")
      assert(s.buckets.head == 1L && s.buckets.last == 1L,
        s"infinities pin to the edge buckets; bucket 0 holds ONLY -Inf: $s")
      assert(s.buckets.sum == 4L, s"no phantom bucket-0 entry from NaN: $s")
      assert(!s.est_p50.isNaN && s.est_p50 > 0.0 && s.est_p50 < 10.0,
        s"estimates stay finite and in-domain: $s")
    } finally q.stop()
  }

  test("event-time windows: close exactly once at the watermark, reject " +
    "late events, and agree with the batch formula per window") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext

    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // hour0 and hour1 for two types; "view" hour0 carries the non-finite
    // clamp fixtures so per-window clamp accounting is pinned too
    val hour0Click = (0 until 10).map(i =>
      TsEv("click", t(f"2024-01-01 00:${i * 5}%02d:00"), (i * 11).toDouble))
    val hour1Click = (0 until 15).map(i =>
      TsEv("click", t(f"2024-01-01 01:${(i * 4) % 60}%02d:30"), ((i * 7) % 100).toDouble))
    val hour0View = Seq(
      TsEv("view", t("2024-01-01 00:10:00"), 42.0),
      TsEv("view", t("2024-01-01 00:20:00"), Double.NaN),
      TsEv("view", t("2024-01-01 00:30:00"), Double.PositiveInfinity),
      TsEv("view", t("2024-01-01 00:40:00"), -5.0))
    val advancer = TsEv("click", t("2024-01-01 04:30:00"), 50.0)

    val input = MemoryStream[TsEv]
    val q = StreamingQuantiles.windowedHistogramStream(
        input.toDS(), lo = 0.0, hi = 99.0, delay = "2 hours")
      .writeStream.format("memory").queryName("squant_win")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    def rows(): Seq[WindowQuantiles] =
      session.sql("SELECT * FROM squant_win").as[WindowQuantiles].collect().toSeq
    try {
      input.addData(hour0Click ++ hour1Click ++ hour0View: _*)
      q.processAllAvailable()
      assert(rows().isEmpty,
        "no window emits before the watermark passes its end — append finality")

      // the advancer pushes the watermark to 02:30: hour0 and hour1 close
      input.addData(advancer)
      q.processAllAvailable()
      val closed = rows()
      assert(closed.map(r => (r.event_type, r.window_start)).toSet == Set(
        ("click", t("2024-01-01 00:00:00").getTime / 1000),
        ("click", t("2024-01-01 01:00:00").getTime / 1000),
        ("view", t("2024-01-01 00:00:00").getTime / 1000)),
        s"exactly the watermark-passed windows emit, once each: $closed")

      val view0 = closed.find(_.event_type == "view").get
      assert(view0.n == 3L && view0.n_clamped == 3L,
        s"per-window clamp accounting: NaN dropped, ±Inf/out-of-domain " +
          s"clamped to edges: $view0")
      assert(view0.buckets.head == 1L && view0.buckets.last == 1L, s"$view0")

      // batch parity per window: the same survived rows through the batch
      // histogram formula (same bucketing columns, shared interpolation)
      // must reproduce every emitted row exactly
      val survived = (hour0Click ++ hour1Click ++ hour0View).toDS()
      val vc = col("value")
      val bucketC = when(isnan(vc), lit(null)).otherwise(
        least(lit(31L), greatest(lit(0L),
          floor(((vc - 0.0) / 99.0) * 32))).cast("int"))
      val hists = survived
        .withColumn("ws", unix_timestamp(date_trunc("hour", col("ts"))))
        .withColumn("b", bucketC)
        .groupBy(col("event_type"), col("ws"), col("b")).agg(count(lit(1)).as("c"))
        .collect().groupBy(r => (r.getString(0), r.getLong(1)))
      val expected = hists.map { case ((typ, ws), cells) =>
        val h = Array.fill(32)(0L)
        cells.foreach(r => if (!r.isNullAt(2)) h(r.getInt(2)) = r.getLong(3))
        val n = h.sum
        (typ, ws) -> (n,
          StreamingQuantiles.estimate(h, 0.0, 99.0, (n + 1) / 2),
          StreamingQuantiles.estimate(h, 0.0, 99.0, (19 * n + 19) / 20))
      }
      for (r <- closed) {
        val (n, p50, p95) = expected((r.event_type, r.window_start))
        assert(r.n == n && r.est_p50 == p50 && r.est_p95 == p95,
          s"stream window == batch formula for $r; expected ($n, $p50, $p95)")
      }
      // and the window grouping itself matches what ev_tumbling_window
      // reports in batch: same (window_start, type) keys, n plus the
      // dropped NaN for the view window (the batch row counts every event)
      val dir = java.nio.file.Files.createTempDirectory("graft_sqw").toString
      (hour0Click ++ hour1Click ++ hour0View).zipWithIndex.map { case (e, i) =>
        (i.toLong, e.ts, (i % 5).toLong, e.event_type, e.value, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val tumbling = SparkEntry.queries("ev_tumbling_window")(spark, dir)
        .collect().map(r => (r.getAs[String]("event_type"),
          r.getAs[Long]("window_start")) -> r.getAs[Long]("n")).toMap
      for (r <- closed) {
        val nanHere = if (r.event_type == "view") 1L else 0L
        assert(tumbling((r.event_type, r.window_start)) == r.n + nanHere,
          s"window grouping parity with ev_tumbling_window for $r")
      }

      // late-event rejection: an event below the watermark must not
      // re-open or mutate its already-emitted window
      input.addData(TsEv("click", t("2024-01-01 00:30:00"), 99.0))
      q.processAllAvailable()
      assert(rows().sortBy(r => (r.event_type, r.window_start)) ==
        closed.sortBy(r => (r.event_type, r.window_start)),
        "a late event neither re-emits nor changes a closed window")
    } finally q.stop()
  }

  test("crash + replay on one checkpoint never double-counts the histogram") {
    val session = spark
    import session.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sq_crash").toString
    val in = s"$root/in"; val ckpt = s"$root/ckpt"; val out = s"$root/out"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))

    def writeBatch(name: String, evs: Seq[Ev]): Unit = {
      val tmp = s"$root/tmp_$name"
      evs.toDF("event_type", "value").coalesce(1).write.mode("overwrite").json(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.startsWith("part-")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(in, name),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    def start() = StreamingQuantiles.histogramStream(
        spark.readStream.schema("event_type STRING, value DOUBLE").json(in).as[Ev],
        lo = 0.0, hi = 99.0)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    writeBatch("b1.json", fixture.take(120))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // crash: the engine forgets the last batch committed — on restart it
    // REPLAYS that batch against the checkpointed (pre-batch) state
    val commits = java.nio.file.Paths.get(ckpt, "commits").toFile.listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.nonEmpty)
    assert(commits.last.delete())
    val crc = new java.io.File(commits.last.getParentFile,
      s".${commits.last.getName}.crc")
    if (crc.exists()) assert(crc.delete())

    writeBatch("b2.json", fixture.drop(120))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val snaps = lastSnapshots(spark.read.parquet(out)
      .as[QuantileSnapshot].collect().toSeq
      .sortBy(_.n)) // last per key = largest n (histograms only grow)
    for ((k, s) <- snaps) {
      assert(s.n == 102L,
        s"$k: replayed batch restored pre-batch state, no double count: $s")
      assert(s.buckets.sum == 102L)
    }
  }
}
