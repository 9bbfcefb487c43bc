package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters: maintain the top-K most frequent grams per
  * language over an unbounded token stream in BOUNDED state — the
  * streaming complement of the batch `tx_ngram_topk` (there the corpus is
  * finite and a groupBy counts exactly; on a stream an exact per-gram
  * count table grows with the vocabulary forever).
  *
  * Algorithm: space-saving (Metwally et al. 2005) — `capacity` counters
  * per state group; a known gram increments, a novel gram with spare
  * room starts at its batch count, and a novel gram against a full table
  * evicts the minimum counter, inheriting its count as the documented
  * overestimate bound (`err`). Invariants: any gram whose true frequency
  * exceeds streamLen/capacity is present, and true_cnt ∈ [cnt − err, cnt].
  *
  * Scale shape: the state key is (lang, shard-of-gram), NOT lang — a
  * handful of language keys would funnel each language's whole token
  * stream through one task (the same hot-key trap the batch op dodges via
  * the map-side WindowGroupLimit). Sharding by a hash of the gram keeps
  * parallelism at |langs|×numShards while staying EXACT for the final
  * merge: a gram routes to one shard always, so shards partition the gram
  * space, and a lang-global top-K member ranks within the top-K of its
  * own shard — [[mergeTopK]] over the per-shard emissions loses nothing.
  * State is ≤ capacity counters per group, linear in langs×shards, never
  * in the vocabulary.
  *
  * Within a batch, each group folds its arrivals pre-counted and in
  * (batch-count desc, gram) order, so the result is deterministic under
  * shuffle/iterator reordering and task retries.
  */
object StreamingTopK {

  case class Token(lang: String, gram: String)
  case class Counter(gram: String, cnt: Long, err: Long)
  case class TopKState(seq: Long, items: Seq[Counter])
  /** One emitted counter row; `batch_seq` is the per-group invocation
    * number so a consumer can select each shard's latest snapshot. */
  case class ShardCounter(lang: String, shard: Int, batch_seq: Long,
      gram: String, cnt: Long, err: Long)

  def topKStream(toks: Dataset[Token], numShards: Int = 8,
      capacity: Int = 64, k: Int = 10): Dataset[ShardCounter] = {
    val s = toks.sparkSession
    import s.implicits._
    toks
      .groupByKey(t => (t.lang, math.floorMod(t.gram.hashCode, numShards)))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (String, Int), rows: Iterator[Token], state: GroupState[TopKState]) =>
          val prev = state.getOption.getOrElse(TopKState(0L, Nil))
          val m = scala.collection.mutable.Map.empty[String, (Long, Long)]
          prev.items.foreach(c => m(c.gram) = (c.cnt, c.err))
          val batch = rows.foldLeft(Map.empty[String, Long]) { (acc, t) =>
            acc.updated(t.gram, acc.getOrElse(t.gram, 0L) + 1L)
          }
          batch.toSeq.sortBy { case (g, c) => (-c, g) }.foreach { case (g, c) =>
            m.get(g) match {
              case Some((cnt, err)) => m(g) = (cnt + c, err)
              case None if m.size < capacity => m(g) = (c, 0L)
              case None =>
                // evict the deterministic minimum (count, gram); the new
                // gram inherits its count as the overestimate bound
                val (vg, (vc, _)) = m.minBy { case (g2, (c2, _)) => (c2, g2) }
                m.remove(vg)
                m(g) = (vc + c, vc)
            }
          }
          val items = m.toSeq.map { case (g, (c, e)) => Counter(g, c, e) }
            .sortBy(c => (-c.cnt, c.gram))
          val seq = prev.seq + 1
          state.update(TopKState(seq, items))
          items.take(k).zipWithIndex.map { case (c, i) =>
            ShardCounter(key._1, key._2, seq, c.gram, c.cnt, c.err)
          }.iterator
      }
  }

  /** Lang-global top-K over the per-shard emissions: per (lang, shard)
    * take its LATEST snapshot (max batch_seq — shards advance
    * independently when a batch carries no data for one), then rank the
    * ≤ |shards|×K survivors per language. Input is the accumulated
    * append-sink table of [[topKStream]]. */
  def mergeTopK(emitted: DataFrame, k: Int = 10): DataFrame = {
    val latest = Window.partitionBy(col("lang"), col("shard"))
    val ranked = Window.partitionBy(col("lang"))
      .orderBy(col("cnt").desc, col("gram"))
    emitted
      .withColumn("max_seq", max(col("batch_seq")).over(latest))
      .filter(col("batch_seq") === col("max_seq"))
      .withColumn("rank", row_number().over(ranked).cast("long"))
      .filter(col("rank") <= k)
      .select(col("lang"), col("rank"), col("gram"), col("cnt"), col("err"))
  }
}
