package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingPrep
import graft.streaming.StreamingPrep.{PrepDoc, PrepVerdict}

/** Streaming corpus-prep admission: per-stage verdict semantics with
  * cross-batch dedup state, and full funnel agreement with the batch
  * pl_corpus_prep on a shared fixture. */
class StreamingPrepSpec extends AnyFunSuite with SparkSpec {

  /** The benchmark gram index in collected form (what pl_corpus_prep
    * broadcasts): distinct 3-gram hashes of the held-out docs. */
  private def evalGramsOf(texts: Seq[String]): Array[Long] = {
    import spark.implicits._
    texts.toDF("t")
      .select(explode(graft.catalog.PrepPipelineCatalog.gramHashes(col("t"))))
      .distinct().collect().map(_.getLong(0))
  }

  /** Independent reimplementation of the classifier keep decision (the
    * oracle's md5 formula), to derive expected verdicts. */
  private def h64(s: String): Long = java.lang.Long.parseLong(
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15), 16)
  private def clfKeeps(text: String): Boolean = {
    val ws = text.split(" ").filter(_.nonEmpty)
    val raw = ws.map(w =>
      (h64("qw" + (h64(w) % 64)) % 2001 - 1000).toDouble / 1000.0).sum / ws.length
    -0.1 + 4.0 * raw >= 0
  }

  private val T = ((1 to 22).map(i => f"word$i%02d") ++ Seq("the", "a")).mkString(" ")
  private val C = (Seq("e1", "e2", "e3", "e4") ++
    (1 to 18).map(i => f"pad$i%02d") ++ Seq("the", "a")).mkString(" ")

  test("verdicts walk the funnel in order — filtered, duplicate (within " +
    "batch AND via state across batches), contaminated, classifier — and " +
    "replays of identical content stay duplicates") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    val evalGrams = evalGramsOf(Seq("e1 e2 e3 e4 e5"))

    val input = MemoryStream[PrepDoc]
    val query = StreamingPrep.prepStream(input.toDS(), evalGrams)
      .writeStream.format("memory").queryName("prep1")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(
        PrepDoc(1L, "tiny doc", "en", "srcA"),
        PrepDoc(2L, T, "en", "srcA"),
        PrepDoc(7L, T, "en", "srcB"),
        PrepDoc(4L, C, "en", "srcB"))
      query.processAllAvailable()
      val b1 = session.sql("SELECT * FROM prep1").as[PrepVerdict]
        .collect().map(v => v.doc_id -> v.stage).toMap
      assert(b1(1L) == "filtered", s"short doc fails the word-count rule: $b1")
      val expected2 = if (clfKeeps(T)) "admitted" else "rejected_clf"
      assert(b1(2L) == expected2,
        s"lowest-id holder of T is canonical and reaches the classifier: $b1")
      assert(b1(7L) == "duplicate", s"batch-mate with identical content drops: $b1")
      assert(b1(4L) == "contaminated",
        s"two shared 3-grams with the benchmark trip the floor: $b1")

      // batch 2: same content arrives later → duplicate via STATE, even
      // though nothing in this batch shares its hash
      input.addData(PrepDoc(9L, T, "en", "srcA"))
      query.processAllAvailable()
      val b2 = session.sql("SELECT * FROM prep1").as[PrepVerdict]
        .collect().map(v => v.doc_id -> v.stage).toMap
      assert(b2(9L) == "duplicate", s"cross-batch dedup state holds: $b2")
      assert(b2.size == 5, "exactly one verdict per arriving doc")
    } finally query.stop()
  }

  test("retention TTL: duplicate verdicts hold inside the window; an idle " +
    "content hash ages out and a fresh copy re-enters as canonical") {
    val session = spark
    import session.implicits._
    import scala.concurrent.duration._
    implicit val sqlCtx = session.sqlContext
    val evalGrams = evalGramsOf(Seq("e1 e2 e3 e4 e5"))

    // see StreamingDedupSpec: no-data microbatches off so expired timers
    // are swept by the next data batch instead of an empty-batch loop
    session.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val input = MemoryStream[PrepDoc]
    val query = StreamingPrep.prepStream(input.toDS(), evalGrams,
        retention = Some(2.seconds))
      .writeStream.format("memory").queryName("prep_ttl")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(PrepDoc(1L, T, "en", "srcA"))
      query.processAllAvailable()
      // a copy inside the retention window is a duplicate — the funnel
      // agreement with batch pl_corpus_prep holds within the window
      input.addData(PrepDoc(2L, T, "en", "srcB"))
      query.processAllAvailable()
      val within = session.sql("SELECT * FROM prep_ttl").as[PrepVerdict]
        .collect().map(v => v.doc_id -> v.stage).toMap
      assert(within(2L) == "duplicate", s"within-window copy drops: $within")

      // idle past retention; an unrelated batch sweeps the expired key
      Thread.sleep(5000)
      input.addData(PrepDoc(3L, C, "en", "srcA"))
      query.processAllAvailable()
      // the same content now re-enters the funnel as canonical and walks
      // the downstream gates again (classifier verdict, not "duplicate")
      input.addData(PrepDoc(4L, T, "en", "srcA"))
      query.processAllAvailable()
      val after = session.sql("SELECT * FROM prep_ttl").as[PrepVerdict]
        .collect().map(v => v.doc_id -> v.stage).toMap
      val expected = if (clfKeeps(T)) "admitted" else "rejected_clf"
      assert(after(4L) == expected,
        s"re-admission after expiry reaches the classifier: $after")
    } finally {
      query.stop()
      session.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
    }
  }

  test("a streamed corpus yields the same per-source funnel as the batch " +
    "pl_corpus_prep run over the same fixture") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext

    // mixed 40-doc corpus: short docs, an exact-dup family, benchmark-
    // contaminated docs, and unique normal docs, across two sources
    val D = ((1 to 22).map(i => f"dupw$i%02d") ++ Seq("the", "a")).mkString(" ")
    def textOf(i: Long): String =
      if (i % 7 == 0) "tiny doc only"
      else if (i % 10 == 3) D
      else if (i % 9 == 0) (Seq("e1", "e2", "e3", "e4") ++
        (1 to 18).map(k => f"c${i}w$k%02d") ++ Seq("the", "a")).mkString(" ")
      else ((1 to 22).map(k => f"d${i}w$k%02d") ++ Seq("the", "a")).mkString(" ")
    def sourceOf(i: Long) = if (i % 3 == 0) "srcA" else "srcB"
    val rows = (0L to 40L).map(i =>
      (i, if (i == 0) "e1 e2 e3 e4 e5" else textOf(i), "en", sourceOf(i)))

    val dir = java.nio.file.Files.createTempDirectory("graft_sprep").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val batch = SparkEntry.queries("pl_corpus_prep")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap

    // stream side receives what the batch plants: the same PII suffixes
    def planted(i: Long, text: String): String = text + ((i % 5) match {
      case 0 => s" contact user$i@mail.example.com now"
      case 1 => " call +1555" + "%04d".format(i % 10000) + " today"
      case 2 => s" host 10.${i % 256}.${(i * 7) % 256}.9 logged"
      case 3 => s" mail a.b$i@x.org and ip 192.168.1.${i % 200} end"
      case _ => ""
    })
    val evalGrams = evalGramsOf(Seq("e1 e2 e3 e4 e5"))
    val input = MemoryStream[PrepDoc]
    val query = StreamingPrep.prepStream(input.toDS(), evalGrams)
      .writeStream.format("memory").queryName("prep2")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData((1L to 40L).map(i =>
        PrepDoc(i, planted(i, textOf(i)), "en", sourceOf(i))): _*)
      query.processAllAvailable()
      val verdicts = session.sql("SELECT * FROM prep2").as[PrepVerdict].collect()
      val stream = verdicts.groupBy(_.source).view.mapValues { vs =>
        (vs.length.toLong,
          vs.map(_.pii_total).sum,
          vs.count(_.stage != "filtered").toLong,
          vs.count(v => v.stage != "filtered" && v.stage != "duplicate").toLong,
          vs.count(v => v.stage == "rejected_clf" || v.stage == "admitted").toLong,
          vs.count(_.stage == "admitted").toLong,
          vs.filter(_.stage == "admitted").map(_.n_words).sum)
      }.toMap
      assert(stream == batch,
        s"stream funnel == batch funnel per source:\nstream=$stream\nbatch=$batch")
      // the fixture trips every stage somewhere, so agreement is not vacuous
      val stages = verdicts.map(_.stage).toSet
      assert(Set("filtered", "duplicate", "contaminated", "admitted")
        .subsetOf(stages), s"stages exercised: $stages")
    } finally query.stop()
  }
}
