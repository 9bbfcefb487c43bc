package graft.streaming

import org.apache.spark.sql.Dataset
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

  /** Per-key histogram state: bucket counts plus the clamp tally. */
  case class Hist(counts: Array[Long], clamped: Long)

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
          // the batch row's interpolation, token for token: find the
          // bucket holding the ⌈q·n⌉-th value, then interpolate inside it
          def est(need: Long): Double = {
            var b = 0; var cum = 0L
            while (cum + h(b) < need || h(b) == 0) { cum += h(b); b += 1 }
            val w = (hi - lo) / nBuckets
            lo + w * (b.toDouble + (need - cum).toDouble / h(b).toDouble)
          }
          if (n == 0) Iterator(QuantileSnapshot(key, 0L, clamped,
            Double.NaN, Double.NaN, h.toSeq))
          else Iterator(QuantileSnapshot(key, n, clamped,
            est((n + 1) / 2), est((19 * n + 19) / 20), h.toSeq))
      }
  }
}
