package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every catalog query must run — not crash — on a ZERO-ROW corpus and
  * return a zero-row (or otherwise degenerate-but-well-formed) result.
  *
  * This is a production property, not a curiosity: an incremental
  * pipeline's first run, a freshly-truncated master store, and a filter
  * chain that eliminates everything all present empty inputs to every
  * downstream operator. A `.head` on an empty frame, a null unboxed into
  * a primitive, or a driver-side fill probe that assumes one row would
  * each surface here first. Empty-input behavior is also where
  * divide-by-zero and log-of-zero guards live or die.
  */
class EmptyInputSpec extends AnyFunSuite with SparkSpec {

  /** All 10 tables with their real schemas and zero rows, written once.
    * Read through graft.Tables so the events NANOS conversion applies. */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_empty").toString
    val src = "/root/testdata/sf0.001"
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      Tables.load(spark, src, t).limit(0)
        .write.mode("overwrite").parquet(s"$d/$t.parquet")
    }
    d
  }

  /** Queries whose row count does not come from the corpus at all — they
    * synthesize their own fixture inputs (reference-golden batches, queue
    * envelopes, projection-mode matrices) or are global aggregates that
    * correctly emit one all-zero row over empty input. Their cardinality
    * is identical at every SF in CORRECTNESS_r08; on the empty corpus the
    * same fixture-determined count is the right answer. */
  private val fixtureDriven: Map[String, Long] = Map(
    "a2_pending_counts" -> 1L,      // one global summary row (of zeros)
    "idx_index_job" -> 48L,         // reference-golden record batch
    "m1_record_upsert" -> 32L,      // fixed UpdateMessage batch
    "p9_mode_projection" -> 9L,     // mode × projection matrix
    "s1_queue_decode" -> 72L,       // fixed queue-envelope fixture
    "sim_kmeans_train" -> 3L,       // one row per training round
    "st2_completeness_gate" -> 15L, // fixed ingest-state fixture
    "t1_solr_transform" -> 64L,     // reference-golden transform batch
    "t1_solr_columnar" -> 64L)      // same fixture through the columnar twin

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$name handles an empty corpus") {
      val df = SparkEntry.queries(name)(spark, dir)
      assert(df.count() == fixtureDriven.getOrElse(name, 0L),
        s"$name: empty corpus in, so only fixture-determined rows out")
      assert(df.columns.nonEmpty, s"$name still reports a schema")
    }
  }
}
