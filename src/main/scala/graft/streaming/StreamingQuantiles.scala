package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming quantile telemetry — the streaming form of the batch
  * `ev_quantile_sketch` histogram: per key (event type), a FIXED-SIZE
  * equi-width histogram maintained as keyed state, with the interpolated
  * quantile estimates re-emitted after every micro-batch. Completes the
  * streaming sketch family the way `StreamingTopK` mirrors the batch
  * heavy-hitter row.
  *
  * Spark-first shape: `flatMapGroupsWithState` with an `Array[Long]`
  * histogram per key — 32 longs of state per key FOREVER, however many
  * events flow through: the state bound is structural (unlike the dedup
  * seen-set there is nothing to TTL). Bucket bounds are FIXED at stream
  * construction — the one semantic difference from the batch row, which
  * derives min/max from the corpus: a stream cannot know its extrema up
  * front, so production monitors run with domain bounds and clamp
  * outliers into the edge buckets (recorded in `n_clamped` so a
  * mis-sized domain is visible, not silent). The interpolation formula
  * is the batch row's, token for token, so at equal bounds the two
  * agree exactly — pinned by StreamingQuantilesSpec.
  *
  * Exactly-once per checkpoint: the histogram is additive, so an
  * at-least-once REPLAY of a batch against already-updated state would
  * double-count — but Structured Streaming restores state from the
  * checkpoint version PRECEDING the replayed batch, making the update
  * idempotent per batchId; the crash-recovery spec leg deletes the last
  * commit and replays to prove counts do not inflate.
  */
object StreamingQuantiles {

  case class Ev(event_type: String, value: Double)
  case class QuantileSnapshot(event_type: String, n: Long, n_clamped: Long,
      est_p50: Double, est_p95: Double, buckets: Seq[Long])

  /** An event on the wire with its EVENT time — input to the windowed
    * (event-time) form. */
  case class TsEv(event_type: String, ts: java.sql.Timestamp, value: Double)
  /** One closed (type, hour) window's histogram and quantile reads. */
  case class WindowQuantiles(event_type: String, window_start: Long, n: Long,
      n_clamped: Long, est_p50: Double, est_p95: Double, buckets: Seq[Long])

  /** Per-key histogram state: bucket counts plus the clamp tally. */
  case class Hist(counts: Array[Long], clamped: Long)

  /** The interpolation shared by the processing-time form, the windowed
    * form, and (token for token) the batch `ev_quantile_sketch` /
    * `ev_quantile_prod` rows: find the bucket holding the `need`-th
    * value, interpolate inside it. Caller guarantees 1 ≤ need ≤ Σh. */
  private[graft] def estimate(h: Array[Long], lo: Double, hi: Double,
      need: Long): Double = {
    var b = 0; var cum = 0L
    while (cum + h(b) < need || h(b) == 0) { cum += h(b); b += 1 }
    val w = (hi - lo) / h.length
    lo + w * (b.toDouble + (need - cum).toDouble / h(b).toDouble)
  }

  def histogramStream(stream: Dataset[Ev], lo: Double, hi: Double,
      nBuckets: Int = 32): Dataset[QuantileSnapshot] = {
    val s = stream.sparkSession
    import s.implicits._
    require(hi > lo && nBuckets > 0)
    stream.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Ev], state: GroupState[Hist]) =>
          val st = state.getOption.getOrElse(Hist(Array.fill(nBuckets)(0L), 0L))
          val h = st.counts.clone()
          var clamped = st.clamped
          rows.foreach { e =>
            if (e.value.isNaN) {
              // NaN compares false to everything: without this guard it
              // would skip both clamp tests AND land in bucket 0
              // (floor(NaN).toInt == 0), silently skewing p50/p95. Count
              // it as clamped — visible, never bucketed.
              clamped += 1L
            } else {
              // v == hi lands in the top bucket IN range (the batch row's
              // least(31, ...) semantics); only true out-of-domain clamps
              // (±Inf among them — they tally here and pin to an edge
              // bucket, same as any out-of-domain finite value)
              if (e.value < lo || e.value > hi) clamped += 1L
              val raw = math.floor(((e.value - lo) / (hi - lo)) * nBuckets).toInt
              val b = math.min(nBuckets - 1, math.max(0, raw))
              h(b) += 1L
            }
          }
          state.update(Hist(h, clamped))
          val n = h.sum
          if (n == 0) Iterator(QuantileSnapshot(key, 0L, clamped,
            Double.NaN, Double.NaN, h.toSeq))
          else Iterator(QuantileSnapshot(key, n, clamped,
            estimate(h, lo, hi, (n + 1) / 2),
            estimate(h, lo, hi, (19 * n + 19) / 20), h.toSeq))
      }
  }

  /** Event-time form: per (event type, 1-hour tumbling window) histograms
    * under a watermark, emitted ONCE per window when the watermark passes
    * its end — the telemetry shape that matches what `ev_tumbling_window`
    * reports in batch, where the processing-time form above matches the
    * all-time batch sketch.
    *
    * Spark-first shape: this is a plain watermarked `groupBy(window(...))`
    * aggregation in append mode — no custom state at all. The 32 bucket
    * cells are map-side-combined conditional sums, so the shuffle carries
    * one partial histogram per open (type, window) per mapper, and engine
    * state is bounded by |types| × (delay/1h + 1) open windows however
    * many events flow. Append-mode finality IS the late-event contract:
    * a window's row emits exactly once, in its final form; an event
    * arriving later than the watermark is dropped by the engine rather
    * than mutating a window already emitted downstream (spec-pinned, the
    * `hourlyCounts` discipline — StreamingAnomaly.scala:38-54).
    *
    * Value semantics are the processing-time form's, per window: fixed
    * [lo, hi] domain, NaN counts as clamped and lands in no bucket,
    * ±Inf clamps to the edge buckets, and the quantile interpolation is
    * `estimate` — shared token for token, so a window whose events match
    * a batch fixture agrees with the batch formula exactly. */
  def windowedHistogramStream(events: Dataset[TsEv], lo: Double, hi: Double,
      nBuckets: Int = 32, delay: String = "2 hours"): Dataset[WindowQuantiles] = {
    val s = events.sparkSession
    import s.implicits._
    require(hi > lo && nBuckets > 0)
    val v = col("value")
    // clamp on the LONG floor() result before narrowing: ±Inf floors to
    // Long.Min/MaxValue, which ANSI cast-to-int rejects — the clamp must
    // come first (the processing-time form's min/max-then-use, columnar)
    val inBucket = least(lit((nBuckets - 1).toLong), greatest(lit(0L),
      floor(((v - lo) / (hi - lo)) * nBuckets))).cast("int")
    val cells = (0 until nBuckets).map(i =>
      sum(when(col("b") === i, 1L).otherwise(0L)).as(s"b$i"))
    events
      .withWatermark("ts", delay)
      // NaN: no bucket (null never equals i below); clamp tally covers
      // NaN and out-of-domain alike — the processing-time guard, columnar
      .withColumn("b", when(isnan(v), lit(null)).otherwise(inBucket))
      .withColumn("cl", when(isnan(v) || v < lo || v > hi, 1L).otherwise(0L))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(cells.head, (cells.tail :+ sum(col("cl")).as("n_clamped")): _*)
      .select(col("event_type"),
        unix_timestamp(col("window.start")).as("window_start"),
        array((0 until nBuckets).map(i => col(s"b$i")): _*).as("buckets"),
        col("n_clamped"))
      .as[(String, Long, Seq[Long], Long)]
      .map { case (typ, ws, bs, nClamped) =>
        val h = bs.toArray
        val n = h.sum
        if (n == 0) WindowQuantiles(typ, ws, 0L, nClamped,
          Double.NaN, Double.NaN, bs)
        else WindowQuantiles(typ, ws, n, nClamped,
          estimate(h, lo, hi, (n + 1) / 2),
          estimate(h, lo, hi, (19 * n + 19) / 20), bs)
      }
  }
}
