package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingTopK
import graft.streaming.StreamingTopK.Token

/** Streaming heavy hitters: exact counts while under capacity, bounded
  * state with documented overestimates past it, shard-merge correctness,
  * and accumulation across micro-batches. */
class StreamingTopKSpec extends AnyFunSuite with SparkSpec {

  private def tokens(pairs: (String, Int)*): Seq[Token] =
    pairs.flatMap { case (g, n) => Seq.fill(n)(Token("en", g)) }

  test("under capacity the sketch is an exact counter and the merged " +
    "top-k ranks by (cnt desc, gram) across shards and batches") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext

    val input = MemoryStream[Token]
    val query = StreamingTopK.topKStream(input.toDS(), numShards = 4,
        capacity = 64, k = 10)
      .writeStream.format("memory").queryName("topk1")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(tokens("the" -> 5, "of" -> 3, "cat" -> 1, "dog" -> 1): _*)
      query.processAllAvailable()
      input.addData(tokens("the" -> 2, "dog" -> 4, "fish" -> 2): _*)
      query.processAllAvailable()
      val merged = StreamingTopK.mergeTopK(session.table("topk1"))
        .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
        .sortBy(_._1)
      assert(merged.toSeq == Seq(
        (1L, "the", 7L, 0L), (2L, "dog", 5L, 0L), (3L, "of", 3L, 0L),
        (4L, "fish", 2L, 0L), (5L, "cat", 1L, 0L)),
        s"counts accumulate across batches, exact under capacity: ${merged.toSeq}")
    } finally query.stop()
  }

  test("over capacity: state stays bounded, the heavy hitter survives " +
    "eviction pressure, and err bounds the overestimate") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext

    // one shard so all grams contend for the same 3 counters
    val input = MemoryStream[Token]
    val query = StreamingTopK.topKStream(input.toDS(), numShards = 1,
        capacity = 3, k = 3)
      .writeStream.format("memory").queryName("topk2")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // heavy gram + a parade of one-off novel grams forcing evictions
      input.addData(tokens("heavy" -> 20, "n1" -> 1, "n2" -> 1, "n3" -> 1,
        "n4" -> 1, "n5" -> 1): _*)
      query.processAllAvailable()
      input.addData(tokens("heavy" -> 20, "n6" -> 1, "n7" -> 1): _*)
      query.processAllAvailable()
      val rows = StreamingTopK.mergeTopK(session.table("topk2"), k = 3)
        .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
      assert(rows.length == 3, s"state (and emission) capped at capacity: ${rows.toSeq}")
      val heavy = rows.find(_._2 == "heavy").get
      assert(heavy._1 == 1L, s"the true heavy hitter is never evicted: ${rows.toSeq}")
      assert(heavy._3 == 40L && heavy._4 == 0L,
        s"a counter that never evicts stays exact: $heavy")
      // every counter satisfies the space-saving bound: true ≤ cnt, err < cnt
      assert(rows.forall(r => r._4 < r._3),
        s"err strictly below the estimate: ${rows.toSeq}")
    } finally query.stop()
  }

  test("streaming↔batch equivalence: shard-merged emissions equal the " +
    "batch tx_ngram_topk top-10 per language when capacity covers the " +
    "shard vocabulary (space-saving is exact under capacity)") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    import org.apache.spark.sql.functions.{col, explode}

    val d = "/root/testdata/sf0.001"
    val batchTop = SparkEntry.queries("tx_ngram_topk")(session, d)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // the same corpus as a token stream: every bigram occurrence one Token
    val toks = Tables.documents(session, d)
      .select(col("lang"),
        explode(graft.functions.TextHashes.bigramsUdf(col("text"))).as("gram"))
      .as[(String, String)].collect()
      .map { case (l, g) => Token(l, g) }
    // size the sketch so no state group ever evicts: capacity ≥ the
    // largest (lang, shard) vocabulary → the sketch is an exact counter
    // and the merge must reproduce the batch ranking verbatim
    val numShards = 4
    val cap = toks.groupBy(t => (t.lang, math.floorMod(t.gram.hashCode, numShards)))
      .valuesIterator.map(_.map(_.gram).distinct.size).max + 1

    val input = MemoryStream[Token]
    val query = StreamingTopK.topKStream(input.toDS(), numShards = numShards,
        capacity = cap, k = 10)
      .writeStream.format("memory").queryName("topk_equiv")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // three micro-batches: accumulation across batches must not matter
      toks.grouped((toks.length + 2) / 3).foreach { b =>
        input.addData(b.toSeq: _*)
        query.processAllAvailable()
      }
      val merged = StreamingTopK.mergeTopK(session.table("topk_equiv"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getLong(4)))
      assert(merged.forall(_._5 == 0L),
        s"no eviction happened, every count is exact: ${merged.take(5).toSeq}")
      assert(merged.map(t => (t._1, t._2, t._3, t._4)).sorted.toSeq ==
        batchTop.sorted.toSeq,
        "the streaming path and the batch path agree gram-for-gram")
    } finally query.stop()
  }

  test("a gram always routes to the same shard, so per-shard counts " +
    "never split") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext

    val input = MemoryStream[Token]
    val query = StreamingTopK.topKStream(input.toDS(), numShards = 8,
        capacity = 16, k = 16)
      .writeStream.format("memory").queryName("topk3")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(tokens("alpha" -> 3): _*)
      query.processAllAvailable()
      input.addData(tokens("alpha" -> 4): _*)
      query.processAllAvailable()
      val alpha = session.table("topk3").collect()
        .filter(_.getAs[String]("gram") == "alpha")
        .map(r => (r.getAs[Int]("shard"), r.getAs[Long]("batch_seq"), r.getAs[Long]("cnt")))
      assert(alpha.map(_._1).toSet.size == 1, s"one shard owns the gram: ${alpha.toSeq}")
      assert(alpha.map(_._3).toSet == Set(3L, 7L),
        s"the owning shard accumulates the full count: ${alpha.toSeq}")
    } finally query.stop()
  }
}
