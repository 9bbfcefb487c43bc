package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Volume-anomaly alerts on a live stream — the streaming form of the
  * batch `ev_anomaly` row: each arriving hourly summary is z-scored
  * against its event type's trailing baseline and the verdict emits
  * immediately, instead of waiting for a batch sweep.
  *
  * Input contract: the HOURLY SUMMARY stream (type, window_start, n) —
  * i.e. the append-mode output of an upstream watermarked tumbling
  * aggregation (each window emits once, in event-time order per type,
  * once the watermark passes it). Keeping the windowing upstream keeps
  * this operator single-stateful: per event type the state is the last
  * `baseline` (window_start, count) pairs — a bounded few hundred bytes
  * per type, however many events flow through the windows.
  *
  * Parity with the batch row is part of the contract (spec-pinned):
  * fewer than 2 trailing windows or zero variance ⇒ null z and no
  * alert; the baseline is positional (the previous `baseline` windows,
  * like the batch ROWS frame), not wall-clock.
  */
object StreamingAnomaly {

  /** A raw event on the wire: event time, not arrival time. */
  case class RawEvent(event_type: String, ts: java.sql.Timestamp)
  case class WindowCount(event_type: String, window_start: Long, n: Long)
  case class AnomalyVerdict(event_type: String, window_start: Long, n: Long,
      z: Option[Double], anomalous: Boolean)
  /** Trailing per-type baseline, ascending by window_start. */
  case class Baseline(rows: List[(Long, Long)])

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The upstream itself — the watermarked tumbling aggregation whose
    * append-mode output IS this operator's input contract: one hourly
    * (type, window_start, n) row per window, emitted exactly once when
    * the watermark passes the window end, in event-time order per type.
    *
    * `delay` is the out-of-orderness budget: an event later than the
    * watermark (max event time seen − delay) is DROPPED by the engine
    * rather than rewriting a window already emitted downstream — the
    * append-mode finality the z-baseline depends on (a mutated window
    * would silently shift every later z). Spec-pinned: out-of-order
    * events inside the budget land in their window; an event older than
    * the watermark does not re-emit or change the window's row.
    *
    * Scale shape: the aggregation state is one partial count per open
    * (type, window) — |types| × (delay/1h + 1) rows however many events
    * flow — and the shuffle carries map-side-combined partials. */
  def hourlyCounts(events: Dataset[RawEvent],
      delay: String = "2 hours"): Dataset[WindowCount] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"),
        unix_timestamp(col("window.start")).as("window_start"), col("n"))
      .as[WindowCount]
  }

  def anomalyStream(stream: Dataset[WindowCount], baseline: Int = 24,
      threshold: Double = 2.0): Dataset[AnomalyVerdict] = {
    val s = stream.sparkSession
    import s.implicits._
    stream.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (typ: String, rows: Iterator[WindowCount], state: GroupState[Baseline]) =>
          var buf = state.getOption.map(_.rows).getOrElse(Nil)
          val out = rows.toSeq.sortBy(_.window_start).map { wc =>
            val base = buf.filter(_._1 < wc.window_start)
              .takeRight(baseline).map(_._2.toDouble)
            val z =
              if (base.size < 2) None
              else {
                val mean = base.sum / base.size
                val sd = math.sqrt(
                  base.map(x => (x - mean) * (x - mean)).sum / (base.size - 1))
                if (sd > 0) Some(round6((wc.n - mean) / sd)) else None
              }
            buf = (buf :+ (wc.window_start, wc.n))
              .sortBy(_._1).takeRight(baseline)
            AnomalyVerdict(typ, wc.window_start, wc.n, z,
              z.exists(v => math.abs(v) > threshold))
          }
          state.update(Baseline(buf))
          out.iterator
      }
  }
}
