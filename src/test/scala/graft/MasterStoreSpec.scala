package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.records.UpdateMessage
import graft.operators.MergeEngine
import graft.sources.MasterStore

/** Snapshot-store durability semantics (SURVEY.md §7.4 risk 2; the
  * engine-side replacement for the reference's transactional Postgres
  * rollback story: test_bulk_insert_and_update_operations,
  * test_bulk_update_sitemap_records, test_bulk_insert_sitemap_records,
  * test_bulk_operations_error_handling, test_get_records_bulk_performance,
  * test_get_sitemap_info_bulk_performance — the bulk getters/setters those
  * tests time collapse here into snapshot reads/writes): every mutation
  * batch is a new immutable snapshot behind a generation-numbered CAS
  * publish, so a crashed writer can never tear the table, a failed batch
  * never advances the pointer, and two concurrent merge writers both land
  * (the reference serializes concurrent `update_storage` workers in
  * Postgres, adsmp/app.py:120-195 — the CAS-retry loop is the immutable-
  * storage equivalent). */
class MasterStoreSpec extends AnyFunSuite with SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def upsert(base: org.apache.spark.sql.DataFrame,
      msgs: Seq[UpdateMessage]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    MergeEngine.upsert(base, msgs.toDS()).master
  }

  private def msg(bib: String): UpdateMessage =
    UpdateMessage(bib, "metadata", s"""{"title": ["$bib"]}""",
      ts("2024-01-01 00:00:00"))

  private def seeded(root: String): MasterStore = {
    val store = new MasterStore(root, numBuckets = 2)
    store.write(upsert(MergeEngine.emptyMaster(spark), Seq(msg("ms1"), msg("ms2"))))
    store
  }

  private def dataDirs(root: String): Seq[String] = {
    val listing = java.nio.file.Files.list(java.nio.file.Paths.get(root))
    try {
      import scala.jdk.CollectionConverters._
      listing.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("v_")).toSeq
    } finally listing.close()
  }

  test("writes advance the generation; readers always see a consistent snapshot") {
    val root = java.nio.file.Files.createTempDirectory("graft_ms1").toString
    val store = seeded(root)
    assert(store.currentVersion.contains(1L))
    val v1 = store.read(spark).count()
    store.write(store.read(spark).withColumn("status", lit("success")))
    assert(store.currentVersion.contains(2L))
    assert(store.read(spark).count() == v1)
    assert(store.versions == Seq(1L, 2L), "old snapshots retained until vacuum")
  }

  test("a crashed writer's orphan directory is invisible; the replay " +
    "publishes a fresh generation and vacuum clears the orphan " +
    "(test_bulk_operations_error_handling analog)") {
    val root = java.nio.file.Files.createTempDirectory("graft_ms2").toString
    val store = seeded(root)
    // simulate a writer that died after materializing its data dir but
    // before the CAS publish: the directory exists, no generation
    // references it
    val orphan = java.nio.file.Paths.get(root, "v_deadbeefdeadbeef")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.write(orphan.resolve("garbage"), "junk".getBytes)
    assert(store.currentVersion.contains(1L))
    assert(store.read(spark).count() == 2, "readers never see the orphan")
    // the replayed batch writes its own fresh dir and publishes normally
    val v = store.write(store.read(spark))
    assert(v == 2L && store.currentVersion.contains(2L))
    assert(store.read(spark).count() == 2)
    // default vacuum only drops dirs SUPERSEDED generations reference —
    // an unreferenced dir might be a concurrent writer mid-write, so the
    // orphan sweep is opt-in (quiesced maintenance windows)
    store.vacuum()
    assert(java.nio.file.Files.exists(orphan),
      "default vacuum never touches unreferenced dirs")
    store.vacuum(alsoOrphans = true)
    assert(!java.nio.file.Files.exists(orphan),
      "the opt-in sweep removed the unreferenced torn attempt")
    assert(dataDirs(root).size == 1, "only the live snapshot's dir remains")
  }

  test("a failed mutation never advances the pointer (no partial batch)") {
    val root = java.nio.file.Files.createTempDirectory("graft_ms3").toString
    val store = seeded(root)
    // a batch whose evaluation throws mid-write: a UDF poison pill
    val poison = udf((s: String) => {
      if (s == "ms2") throw new RuntimeException("batch failure")
      s
    })
    val bad = store.read(spark).withColumn("bibcode", poison(col("bibcode")))
    intercept[org.apache.spark.SparkException] { store.write(bad) }
    assert(store.currentVersion.contains(1L), "still at generation 1")
    assert(store.read(spark).count() == 2, "the table is exactly the pre-batch state")
  }

  test("vacuum keeps only the live snapshot") {
    val root = java.nio.file.Files.createTempDirectory("graft_ms4").toString
    val store = seeded(root)
    store.write(store.read(spark))
    store.write(store.read(spark))
    assert(store.versions == Seq(1L, 2L, 3L))
    store.vacuum()
    assert(store.versions == Seq(3L))
    assert(store.read(spark).count() == 2, "live snapshot intact")
    assert(dataDirs(root).size == 1, "superseded and orphan dirs dropped")
  }

  test("two interleaved merge writers both land — the lost-update race is " +
    "closed (Postgres-serialized update_storage analog, adsmp/app.py:120-195)") {
    val root = java.nio.file.Files.createTempDirectory("graft_ms5").toString
    val store = seeded(root)
    // writer A reads generation 1 and starts merging; writer B's whole
    // read-merge-publish lands in the middle (the classic interleaving a
    // single atomic-move CURRENT swap silently loses)
    var interleaved = false
    val vA = store.writeMerge(spark, cur => {
      if (!interleaved) {
        interleaved = true
        val vB = store.writeMerge(spark, c => upsert(c, Seq(msg("msB"))))
        assert(vB == 2L, "writer B published generation 2 mid-merge")
      }
      upsert(cur, Seq(msg("msA")))
    })
    // A lost the CAS for generation 2, re-read B's snapshot, re-applied
    // its delta on top, and won generation 3: BOTH deltas survive
    assert(vA == 3L, "writer A re-merged on top of the winner")
    val bibs = store.read(spark).select("bibcode")
      .collect().map(_.getString(0)).toSet
    assert(bibs == Set("ms1", "ms2", "msA", "msB"),
      s"both merge deltas survive the race; got $bibs")
    // torn-directory guard: every generation references its own data dir —
    // no two writers ever shared one
    val refs = store.versions.map { g =>
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(root, f"gen_$g%012d")), "UTF-8").trim
    }
    assert(refs.distinct.size == refs.size,
      s"each generation has a distinct data dir; got $refs")
    // A's stale first attempt was dropped on CAS loss: no orphan remains
    assert(dataDirs(root).toSet == refs.toSet,
      "no orphan data dir left behind by the losing attempt")
    store.vacuum()
    assert(store.versions == Seq(3L) && dataDirs(root).size == 1)
    assert(store.read(spark).count() == 4)
  }

  test("eight THREADED merge writers racing on one store: every delta " +
    "lands exactly once (the IndexMaintenanceSpec race shape, on the " +
    "master table)") {
    val root = java.nio.file.Files.createTempDirectory("graft_ms7").toString
    val store = seeded(root)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (1 to 8).map { i =>
        pool.submit(new Runnable {
          def run(): Unit =
            new MasterStore(root, numBuckets = 2)
              .writeMerge(spark, cur => upsert(cur, Seq(msg(s"race$i"))))
        })
      }
      futures.foreach(_.get(180, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    val bibs = store.read(spark).select("bibcode")
      .collect().map(_.getString(0)).toSet
    assert(bibs == Set("ms1", "ms2") ++ (1 to 8).map(i => s"race$i"),
      s"all 8 racing merges survive whatever the interleaving: $bibs")
    assert(store.read(spark).count() == 10L, "each delta landed exactly once")
    assert(store.currentVersion.contains(9L),
      "8 merges serialized into generations 2..9")
    store.vacuum()
    assert(dataDirs(root).size == 1 && store.read(spark).count() == 10L)
  }

  test("blind write vs merge writer racing: the merge is never lost, the " +
    "blind write serializes to its own generation") {
    val root = java.nio.file.Files.createTempDirectory("graft_ms6").toString
    val store = seeded(root)
    var fired = false
    val replacement = upsert(MergeEngine.emptyMaster(spark), Seq(msg("only")))
    val vM = store.writeMerge(spark, cur => {
      if (!fired) { fired = true; store.write(replacement) }
      upsert(cur, Seq(msg("msC")))
    })
    // the blind write took generation 2; the merge re-ran on top of it
    assert(vM == 3L)
    val bibs = store.read(spark).select("bibcode")
      .collect().map(_.getString(0)).toSet
    assert(bibs == Set("only", "msC"),
      s"merge applied on top of the blind replacement; got $bibs")
  }
}
