package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.{Admitted, Doc}

/** Dedup-on-ingest: exactly-once admission per distinct content across
  * micro-batches, within-batch keep-lowest, and state survival across a
  * query restart on the same checkpoint. */
class StreamingDedupSpec extends AnyFunSuite with SparkSpec {

  test("admits each content once across batches; within-batch copies " +
    "collapse to the lowest doc_id") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext

    val input = MemoryStream[Doc]
    val query = StreamingDedup.dedupStream(input.toDS())
      .writeStream.format("memory").queryName("dedup1")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1: A twice (ids 5, 3) + B once → A admitted as id 3, B as 9
      input.addData(Doc(5, "alpha beta"), Doc(3, "alpha beta"), Doc(9, "gamma"))
      query.processAllAvailable()
      val b1 = session.sql("SELECT * FROM dedup1").as[Admitted].collect()
      assert(b1.map(_.doc_id).toSet == Set(3L, 9L),
        s"within-batch dup keeps the lowest id: ${b1.toSeq}")

      // batch 2: A again (new id) + novel C → only C passes
      input.addData(Doc(11, "alpha beta"), Doc(12, "delta"))
      query.processAllAvailable()
      val b2 = session.sql("SELECT * FROM dedup1").as[Admitted].collect()
      assert(b2.map(_.doc_id).toSet == Set(3L, 9L, 12L),
        "a copy arriving in a later batch is dropped by stream state")
    } finally query.stop()
  }

  test("retention TTL: copies inside the window stay duplicates, an idle " +
    "hash is evicted (state rows drop) and later re-admits") {
    val session = spark
    import session.implicits._
    import scala.concurrent.duration._
    implicit val sqlCtx = session.sqlContext

    // timeouts + Trigger.ProcessingTime(0) + no-data microbatches would
    // run the engine in a continuous empty-batch loop (and livelock
    // processAllAvailable); with no-data batches off, expired timers are
    // swept by the NEXT data batch — which is what this test drives
    session.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val input = MemoryStream[Doc]
    val query = StreamingDedup.dedupStream(input.toDS(),
        retention = Some(2.seconds))
      .writeStream.format("memory").queryName("dedup_ttl")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(Doc(1, "ttl content"), Doc(2, "other"))
      query.processAllAvailable()
      // inside the retention window the dedup contract is unchanged —
      // this is the batch-agreement guarantee the TTL must not break
      input.addData(Doc(3, "ttl content"))
      query.processAllAvailable()
      val inWindow = session.sql("SELECT doc_id FROM dedup_ttl")
        .as[Long].collect().toSet
      assert(inWindow == Set(1L, 2L), s"copy within retention drops: $inWindow")

      // let every key sit idle past the retention, then run a batch with
      // unrelated data — timed-out keys are evicted in that batch
      Thread.sleep(5000)
      input.addData(Doc(4, "unrelated"))
      query.processAllAvailable()
      // a copy of the evicted content now RE-ADMITS — the documented
      // rolling-window semantic (bounded state, not a forever seen-set)
      input.addData(Doc(5, "ttl content"))
      query.processAllAvailable()
      val after = session.sql("SELECT doc_id FROM dedup_ttl")
        .as[Long].collect().toSet
      assert(after == Set(1L, 2L, 4L, 5L),
        s"evicted hash re-admits after expiry: $after")
      // state-store bound: only the two keys sighted since the eviction
      // batch remain ("ttl content" re-registered + "unrelated")
      val stateRows = query.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsTotal)).lastOption
      assert(stateRows.contains(2L),
        s"expired keys left the state store: $stateRows")
    } finally {
      query.stop()
      session.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
    }
  }

  test("seen-state survives a stop/restart on the same checkpoint dir") {
    val session = spark
    import session.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_dedup_ckpt").toString
    val in = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val admitted = new java.util.concurrent.ConcurrentLinkedQueue[Long]()

    def writeSeg(name: String, docs: Seq[Doc]): Unit = {
      val tmp = java.nio.file.Paths.get(root, name)
      java.nio.file.Files.write(tmp, docs.map(d =>
        s"""{"doc_id": ${d.doc_id}, "text": "${d.text}"}""").mkString("\n")
        .getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(in, name))
    }
    def start() = {
      val docs = session.readStream
        .schema(org.apache.spark.sql.Encoders.product[Doc].schema)
        .json(in).as[Doc]
      StreamingDedup.dedupStream(docs)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Admitted], _: Long) =>
          batch.collect().foreach(a => admitted.add(a.doc_id)); ()
        }
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    }

    writeSeg("seg1.json", Seq(Doc(1, "persisted content"), Doc(2, "other")))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    import scala.jdk.CollectionConverters._
    assert(admitted.asScala.toSet == Set(1L, 2L))

    // restart against the same checkpoint: the content-hash state reloads,
    // so a replayed copy arriving after the restart is still a duplicate
    writeSeg("seg2.json", Seq(Doc(7, "persisted content"), Doc(8, "fresh")))
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(admitted.asScala.toSet == Set(1L, 2L, 8L),
        s"state store remembered pre-restart content: ${admitted.asScala.toSeq}")
    } finally q2.stop()
  }
}
