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
  * batch is a new immutable snapshot
  * behind an atomic CURRENT swap, so a crashed writer can never tear the
  * table and a failed batch simply never advances the pointer. */
class MasterStoreSpec extends AnyFunSuite with SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def seeded(root: String): MasterStore = {
    import spark.implicits._
    val store = new MasterStore(root, numBuckets = 2)
    val r = MergeEngine.upsert(MergeEngine.emptyMaster(spark), Seq(
      UpdateMessage("ms1", "metadata", """{"title": ["one"]}""", ts("2024-01-01 00:00:00")),
      UpdateMessage("ms2", "metadata", """{"title": ["two"]}""", ts("2024-01-01 00:00:00"))).toDS())
    store.write(r.master)
    store
  }

  test("writes advance CURRENT; readers always see a consistent snapshot") {
    val root = java.nio.file.Files.createTempDirectory("graft_ms1").toString
    val store = seeded(root)
    assert(store.currentVersion.contains(1L))
    val v1 = store.read(spark).count()
    store.write(store.read(spark).withColumn("status", lit("success")))
    assert(store.currentVersion.contains(2L))
    assert(store.read(spark).count() == v1)
    assert(store.versions == Seq(1L, 2L), "old snapshots retained until vacuum")
  }

  test("a crashed writer's orphan directory is invisible and gets " +
    "overwritten by the replay (test_bulk_operations_error_handling analog)") {
    val root = java.nio.file.Files.createTempDirectory("graft_ms2").toString
    val store = seeded(root)
    // simulate a writer that died after materializing v_2 but before the
    // CURRENT swap: the directory exists, the pointer still says v_1
    val orphan = java.nio.file.Paths.get(root, "v_00000002")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.write(orphan.resolve("garbage"), "junk".getBytes)
    assert(store.currentVersion.contains(1L))
    assert(store.read(spark).count() == 2, "readers never see the orphan")
    // the replayed batch rewrites v_2 in place and only then swaps
    val v = store.write(store.read(spark))
    assert(v == 2L && store.currentVersion.contains(2L))
    assert(store.read(spark).count() == 2)
    assert(!java.nio.file.Files.exists(orphan.resolve("garbage")),
      "overwrite mode replaced the torn attempt")
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
    assert(store.currentVersion.contains(1L), "CURRENT still points at v_1")
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
  }
}
