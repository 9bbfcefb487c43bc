package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingNearDup
import graft.streaming.StreamingNearDup.{Doc, NearDupVerdict}

/** Streaming near-dup against a static corpus fingerprint index: verdict
  * semantics per micro-batch, the batch/stream agreement with
  * dd_incremental's contract, and the no-candidate path. */
class StreamingNearDupSpec extends AnyFunSuite with SparkSpec {

  private def corpus(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("flags a near-copy with the lowest qualifying corpus id, passes " +
    "novel content through with a null dup_of, and verdicts re-emit " +
    "per batch without state growth") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext

    // corpus: two near-identical docs (1, 2) + one unrelated (3)
    val idx = StreamingNearDup.fingerprintIndex(corpus(Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "entirely different content about spark physical plans"))))
      .cache()

    val input = MemoryStream[Doc]
    val query = StreamingNearDup.nearDupStream(input.toDS(), idx)
      .writeStream.format("memory").queryName("neardup1")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1: a near-copy of docs 1/2 and a novel doc
      input.addData(
        Doc(100L, "the quick brown fox jumps over the lazy dog yesterday"),
        Doc(101L, "totally novel text that matches no corpus fingerprint"))
      query.processAllAvailable()
      val b1 = session.sql("SELECT * FROM neardup1").as[NearDupVerdict]
        .collect().map(v => v.doc_id -> v).toMap
      assert(b1(100L).dup_of.contains(1L),
        s"near-copy matches BOTH corpus docs; dup_of is the LOWEST id: ${b1(100L)}")
      assert(b1(100L).jaccard > 0.5)
      assert(b1(101L).dup_of.isEmpty && b1(101L).jaccard == 0.0,
        s"novel doc emits a verdict with null dup_of: ${b1(101L)}")

      // batch 2: an exact copy of corpus doc 3 → jaccard 1.0
      input.addData(Doc(102L, "entirely different content about spark physical plans"))
      query.processAllAvailable()
      val b2 = session.sql("SELECT * FROM neardup1").as[NearDupVerdict]
        .collect().map(v => v.doc_id -> v).toMap
      assert(b2(102L).dup_of.contains(3L) && b2(102L).jaccard == 1.0)
      assert(b2.size == 3, "one verdict per arriving doc, none re-emitted")
    } finally query.stop()
  }

  test("nearDupBatch (the re-resolving foreachBatch form) emits verdicts " +
    "identical to the stream form for the same (probe, index) inputs") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    val idx = StreamingNearDup.fingerprintIndex(corpus(Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "entirely different content about spark physical plans"))))
      .cache()
    val probes = Seq(
      Doc(100L, "the quick brown fox jumps over the lazy dog yesterday"),
      Doc(101L, "totally novel text that matches no corpus fingerprint"),
      Doc(102L, "entirely different content about spark physical plans"))

    val batchV = StreamingNearDup.nearDupBatch(probes.toDS(), idx)
      .collect().map(v => v.doc_id -> v).toMap

    val input = MemoryStream[Doc]
    val query = StreamingNearDup.nearDupStream(input.toDS(), idx)
      .writeStream.format("memory").queryName("neardup_b")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(probes: _*)
      query.processAllAvailable()
      val streamV = session.sql("SELECT * FROM neardup_b").as[NearDupVerdict]
        .collect().map(v => v.doc_id -> v).toMap
      assert(batchV == streamV,
        s"batch and stream forms share the reduction: $batchV vs $streamV")
      assert(batchV(100L).dup_of.contains(1L) &&
        batchV(101L).dup_of.isEmpty && batchV(102L).jaccard == 1.0,
        "fixture exercises hit, miss, and exact-copy paths")
    } finally query.stop()
  }

  test("stream verdicts agree with the batch dd_incremental contract on " +
    "the sf0.001 corpus: same dup_of for every batch-slice doc") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext

    val docs = Tables.documents(session, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    // dd_incremental's split: doc_id % 10 == 7 is "today's crawl"
    val corpusIdx = StreamingNearDup.fingerprintIndex(
      docs.filter(col("doc_id") % 10 =!= 7)).cache()
    val newDocs = docs.filter(col("doc_id") % 10 === 7)
      .as[(Long, String)].collect().map { case (i, t) => Doc(i, t) }

    val batch = SparkEntry.queries("dd_incremental")(session, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    val input = MemoryStream[Doc]
    val query = StreamingNearDup.nearDupStream(input.toDS(), corpusIdx)
      .writeStream.format("memory").queryName("neardup2")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // feed the crawl in three micro-batches
      newDocs.grouped(math.max(newDocs.length / 3, 1)).foreach { g =>
        input.addData(g.toIndexedSeq: _*)
        query.processAllAvailable()
      }
      val streamed = session.sql("SELECT * FROM neardup2").as[NearDupVerdict]
        .collect().map(v => v.doc_id -> v.dup_of).toMap
      assert(streamed.keySet == batch.keySet,
        "every crawl doc got exactly one streaming verdict")
      val disagree = streamed.keySet.filter(k => streamed(k) != batch(k))
      assert(disagree.isEmpty,
        s"stream and batch disagree on: ${disagree.take(5).map(k =>
          (k, streamed(k), batch(k)))}")
    } finally query.stop()
  }
}
