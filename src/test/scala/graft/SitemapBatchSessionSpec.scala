package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.operators.{Sitemap, SitemapState}

/** Step-for-step mirror of the reference's `_process_sitemap_batch`
  * session-persistence and SOLR-filtering suites
  * (adsmp/tests/test_app.py:1261-1424 and :1425-1543) — the last two
  * blocks of the :606-1650 range not yet asserted at the reference's own
  * depth. The session-scope mechanics translate: "visible in the same
  * session before commit" = the chained DataFrame state, "persisted
  * after commit" = the state surviving a parquet round-trip; batch_stats
  * {successful, failed, sitemap_records} = rows landed / batch members
  * filtered out / rows flagged. */
class SitemapBatchSessionSpec extends AnyFunSuite with SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def masterOf(rows: Seq[(Long, String, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, bib, bd, bdu, st) =>
      (id, bib, Option(bd), Option(bdu).map(ts), Option(st))
    }.toDF("id", "bibcode", "bib_data", "bib_data_updated", "status")
  }

  private def bibs(bs: Seq[String]): DataFrame = {
    import spark.implicits._
    bs.toDF("bibcode")
  }

  test("batch session persistence: two cumulative batches, one commit, " +
    "empty-batch no-op (test_app.py:1261-1424 " +
    "test_process_sitemap_batch_session_persistence)") {
    val all = (0 until 100).map(i => f"2023Batch..$i%04d..${i}%04dA")
    val master = masterOf(all.zipWithIndex.map { case (b, i) =>
      (i + 1L, b, s"""{"title": "Test Batch Paper $i", "year": 2023}""",
        "2024-01-01 00:00:00", null)
    })
    val state0 = SitemapState.empty(spark)
    val fill0 = SitemapState.currentFill(state0)
    assert(fill0.index == 1 && fill0.count == 0, "initial sitemap state is empty")

    // Test 1: first batch of 50 under 'add'
    val batch1 = all.take(50)
    val state1 = SitemapState.add(state0, master, bibs(batch1))
    val in1 = state1.filter(col("bibcode").isin(batch1: _*))
    assert(in1.count() == 50, "successful: all 50 bibcodes processed")
    assert(in1.filter(col("sitemap_filename").isNull).count() == 0,
      "failed: none — every batch member got a file slot")
    assert(in1.filter(col("update_flag")).count() == 50,
      "sitemap_records: 50 rows returned for generation")

    // Test 2: session persistence — the same state sees all 50
    assert(state1.join(bibs(batch1), Seq("bibcode"), "left_semi").count() == 50,
      "all 50 sitemap records visible in the same session")

    // Test 3: second batch (30 more) under 'force-update', chained on the
    // updated state from the first batch
    val batch2 = all.slice(50, 80)
    val state2 = SitemapState.add(state1, master, bibs(batch2), force = true)
    val in2 = state2.filter(col("bibcode").isin(batch2: _*))
    assert(in2.count() == 30, "successful: all 30 bibcodes processed")
    assert(in2.filter(col("sitemap_filename").isNull).count() == 0,
      "failed: none")
    assert(in2.filter(col("update_flag")).count() == 30,
      "sitemap_records: 30 rows returned")

    // Test 4: state is cumulative across batches — same file while under
    // the per-file limit, count = initial + 80
    val fill2 = SitemapState.currentFill(state2)
    assert(fill2.index == fill0.index,
      "same filename while under the per-file limit")
    assert(fill2.count == fill0.count + 80,
      "count cumulative across batches")

    // Test 5: all 80 records visible in the same session (no commit yet)
    assert(state2.join(bibs(all.take(80)), Seq("bibcode"), "left_semi").count() == 80,
      "all 80 records visible before commit")

    // Test 6: state consistency within the session — recomputing the
    // current state from the table matches the chained value
    assert(SitemapState.currentFill(state2).count == fill2.count,
      "current state matches updated state within the session")

    // Test 7: commit = parquet round-trip; a new session sees all 80
    val dir = java.nio.file.Files.createTempDirectory("graft_smx_sess").toString
    state2.write.mode("overwrite").parquet(dir)
    val reread = spark.read.parquet(dir)
    assert(reread.count() == 80, "new session sees all committed records")
    assert(reread.select("bibcode").collect().map(_.getString(0)).toSet ==
      all.take(80).toSet, "committed rows are exactly the processed ones")

    // Test 8: empty batch is a complete no-op — same stats, same state
    val state3 = SitemapState.add(state2, master, bibs(Nil))
    assert(state3.count() == 80, "empty batch: 0 successful, 0 failed")
    assert(state3.filter(col("update_flag")).count() ==
      state2.filter(col("update_flag")).count(),
      "empty batch returns no new sitemap records")
    assert(SitemapState.currentFill(state3) == fill2,
      "empty batch leaves the state unchanged")
  }

  test("batch SOLR filtering: add and force-update include/exclude the " +
    "same statuses (test_app.py:1425-1543 " +
    "test_process_sitemap_batch_solr_filtering)") {
    val included = Seq("2023Success..1..1A", "2023MetricsFailed..1..1A",
      "2023LinksFailed..1..1A")
    val excluded = Seq("2023SolrFailed..1..1A", "2023Retrying..1..1A",
      "2023NoBibData..1..1A")
    val allBibs = Seq("2023Success..1..1A", "2023SolrFailed..1..1A",
      "2023Retrying..1..1A", "2023MetricsFailed..1..1A",
      "2023LinksFailed..1..1A", "2023NoBibData..1..1A")
    val master = masterOf(Seq(
      (1L, "2023Success..1..1A", "{}", "2024-01-01 00:00:00", "success"),
      (2L, "2023SolrFailed..1..1A", "{}", "2024-01-01 00:00:00", "solr-failed"),
      (3L, "2023Retrying..1..1A", "{}", "2024-01-01 00:00:00", "retrying"),
      (4L, "2023MetricsFailed..1..1A", "{}", "2024-01-01 00:00:00", "metrics-failed"),
      (5L, "2023LinksFailed..1..1A", "{}", "2024-01-01 00:00:00", "links-failed"),
      (6L, "2023NoBibData..1..1A", null, null, null)))

    // 'add' into an empty table
    val stAdd = SitemapState.add(SitemapState.empty(spark), master, bibs(allBibs))
    val landed = stAdd.select("bibcode").collect().map(_.getString(0)).toSet
    assert(landed == included.toSet,
      "add includes success, metrics-failed, links-failed (3 successful)")
    assert(excluded.forall(b => !landed.contains(b)),
      "add excludes solr-failed, retrying, and no-bib-data (3 failed)")
    assert(stAdd.filter(col("update_flag")).count() == 3,
      "add returns 3 sitemap records")
    assert(SitemapState.currentFill(stAdd).count == 3,
      "state reflects only successful records")

    // 'force-update' over the already-admitted table: same filtering,
    // updates in place — no new rows
    val stForce = SitemapState.add(stAdd, master, bibs(allBibs), force = true)
    val forced = stForce.select("bibcode").collect().map(_.getString(0)).toSet
    assert(forced == included.toSet,
      "force-update includes the same 3 statuses")
    assert(excluded.forall(b => !forced.contains(b)),
      "force-update excludes the same 3")
    assert(stForce.filter(col("update_flag")).count() == 3,
      "force-update returns 3 updated sitemap records")
    assert(SitemapState.currentFill(stForce).count == 3,
      "force-update updates existing rows, adds none")
    // both actions agree on the include/exclude partition
    assert(landed == forced, "add and force-update filter identically")
  }
}
