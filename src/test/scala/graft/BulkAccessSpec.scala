package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import java.nio.file.Files

import graft.records.UpdateMessage
import graft.operators.{MergeEngine, SitemapState}
import graft.sources.MasterStore

/** Bulk keyed access, mirrored per-step from the reference's three
  * bulk-getter suites (adsmp/tests/test_app.py:818-1260):
  * `test_get_records_bulk_performance` (4 sub-tests),
  * `test_get_sitemap_info_bulk_performance` (3 sub-tests), and
  * `test_get_current_sitemap_state_performance` (5 scenarios).
  *
  * The reference's getters chunk `IN (...)` against Postgres and build
  * driver dicts; the engine analog is `MasterStore.lookup` — an IN-list
  * predicate pushed into the parquet scan plus column pruning that reaches
  * the scan's ReadSchema. Where the reference asserts wall-clock budgets
  * (a 1000-key probe must not scan the world), we assert the PLAN: the
  * key predicate appears in PushedFilters and `loadOnly` shrinks
  * ReadSchema to the requested columns — those properties, not a timer,
  * are what keep the probe cheap at any corpus size. */
class BulkAccessSpec extends AnyFunSuite with SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def tempDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** 1000-record master written through the real mutation path
    * (update_storage analog), then snapshotted so lookups hit parquet. */
  private def seededStore(n: Int): (MasterStore, Seq[String]) = {
    import spark.implicits._
    val keys = (0 until n).map(i => f"2023Bulk..$i%04d..$i%04dA")
    val msgs = keys.zipWithIndex.map { case (b, i) =>
      UpdateMessage(b, "metadata",
        s"""{"title": ["Test Paper $i"], "year": 2023}""",
        ts("2024-01-01 00:00:00"))
    }
    val store = new MasterStore(tempDir("bulk-access"), numBuckets = 4)
    store.write(MergeEngine.upsert(MergeEngine.emptyMaster(spark), msgs.toDS()).master)
    (store, keys)
  }

  private def planOf(df: DataFrame): String = {
    df.count() // finalize AQE so the executed plan shows real scan nodes
    df.queryExecution.executedPlan.toString
  }

  test("bulk record lookup: 1000 keys in one pushed-down probe, load_only " +
    "prunes the scan, empty and unknown key lists return nothing " +
    "(test_get_records_bulk_performance, test_app.py:818-905)") {
    val (store, keys) = seededStore(1000)

    // Test 1 — all 1000 records come back with the core fields populated;
    // spot-check the first five like the reference does
    val all = store.lookup(spark, keys)
    assert(all.count() == 1000, "should return all 1000 records")
    val first5 = all.filter(col("bibcode").isin(keys.take(5): _*))
      .select(col("id"), col("bibcode"), col("bib_data")).collect()
    assert(first5.length == 5)
    first5.foreach { r =>
      assert(!r.isNullAt(0), "id field present")
      assert(keys.take(5).contains(r.getString(1)), "bibcode matches a probe key")
      assert(r.getString(2).contains("Test Paper"), "bib_data field present")
    }
    // the 1000-key IN-list must reach the parquet scan as a pushed filter —
    // that (not a stopwatch) is what bounds the probe at any corpus size
    val pAll = planOf(store.lookup(spark, keys))
    assert(pAll.contains("PushedFilters: [In(bibcode"),
      s"key IN-list pushed to the scan:\n${pAll.take(1500)}")

    // Test 2 — load_only: requested columns only, and the pruning reaches
    // the scan (the engine's version of "bib_data is None when not asked")
    val limited = store.lookup(spark, keys.take(10),
      loadOnly = Seq("bibcode", "bib_data_updated"))
    assert(limited.columns.toSeq == Seq("bibcode", "bib_data_updated"),
      "only the requested fields are in the result")
    assert(limited.count() == 10)
    assert(limited.filter(col("bib_data_updated").isNull).count() == 0,
      "requested timestamp populated")
    val pLim = planOf(store.lookup(spark, keys.take(10),
      loadOnly = Seq("bibcode", "bib_data_updated")))
    val readSchema = pLim.linesIterator
      .find(_.contains("ReadSchema:")).getOrElse("")
    assert(readSchema.contains("bibcode") && readSchema.contains("bib_data_updated"),
      s"scan reads the requested columns: $readSchema")
    assert(!readSchema.contains("bib_data:") && !readSchema.contains("fulltext"),
      s"scan does NOT read unrequested payload columns: $readSchema")

    // Test 3 — empty key list short-circuits to an empty frame
    assert(store.lookup(spark, Nil).count() == 0,
      "empty key list returns an empty result")

    // Test 4 — unknown keys match nothing
    assert(store.lookup(spark,
      Seq("2023Fake..1..1A", "2023Fake..1..2B")).count() == 0,
      "non-existent keys return an empty result")
  }

  test("bulk sitemap-info lookup: 1000 assignments at 50/file round-trip " +
    "with their filenames, empty and unknown key lists return nothing " +
    "(test_get_sitemap_info_bulk_performance, test_app.py:906-1008)") {
    import spark.implicits._
    val keys = (0 until 1000).map(i => f"2023Sitemap..$i%04d..$i%04dA")
    val entries = keys.zipWithIndex.map { case (b, i) =>
      (i.toLong + 1, b, f"sitemap_bib_${i / 50 + 1}%d.xml",
        ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"), false)
    }.toDF("record_id", "bibcode", "sitemap_filename",
      "bib_data_updated", "filename_lastmoddate", "update_flag")
    val store = new MasterStore(tempDir("bulk-sitemap"), numBuckets = 4,
      empty = s => entries.limit(0))
    store.write(entries)

    // Test 1 — all 1000 sitemap rows, toJSON()-shape fields, filename format
    val all = store.lookup(spark, keys)
    assert(all.count() == 1000, "should return all 1000 sitemap infos")
    val first5 = all.filter(col("bibcode").isin(keys.take(5): _*))
      .select(col("bibcode"), col("sitemap_filename"), col("update_flag"))
      .collect()
    assert(first5.length == 5)
    first5.foreach { r =>
      assert(keys.take(5).contains(r.getString(0)), "bibcode matches")
      assert(r.getString(1).startsWith("sitemap_bib_"),
        "filename has the reference format")
      assert(!r.isNullAt(2), "update_flag present")
    }
    assert(all.filter(col("sitemap_filename") === "sitemap_bib_1.xml").count() == 50,
      "50 records per file as planted")

    // Test 2 — empty key list
    assert(store.lookup(spark, Nil).count() == 0)

    // Test 3 — unknown keys
    assert(store.lookup(spark,
      Seq("2023FakeSitemap..1..1A", "2023FakeSitemap..1..2B")).count() == 0)
  }

  test("current fill state: equal and short last files, db agreement, null " +
    "filenames ignored, empty-table default " +
    "(test_get_current_sitemap_state_performance, test_app.py:1009-1260)") {
    import spark.implicits._
    def stateOf(dist: Seq[(String, Int)], withNulls: Boolean = false): DataFrame = {
      var id = 0L
      val rows = dist.flatMap { case (f, n) =>
        (0 until n).map { _ =>
          id += 1
          (id, f"2023State..$id%04d..$id%04dA", Option(f),
            Option(ts("2024-01-01 00:00:00")), Option(ts("2024-01-02 00:00:00")), false)
        }
      } ++ (if (withNulls)
        Seq((9001L, "2023None..1..1A", None: Option[String],
            Option(ts("2024-01-01 00:00:00")), Option(ts("2024-01-02 00:00:00")), false),
          (9002L, "2023None..2..2A", None: Option[String],
            Option(ts("2024-01-01 00:00:00")), Option(ts("2024-01-02 00:00:00")), false))
      else Nil)
      rows.toDF("record_id", "bibcode", "sitemap_filename",
        "bib_data_updated", "filename_lastmoddate", "update_flag")
    }
    val five = (1 to 5).map(i => s"sitemap_bib_$i.xml")

    // Scenario 1 — all files equal (100 each): the highest-numbered file
    // is the fill target with its 100 rows (per-file cap is 50k, so 100
    // rows leave it open, exactly the reference's numbers)
    val equal = SitemapState.currentFill(stateOf(five.map(_ -> 100)))
    assert(equal.index == 5, "highest numbered file wins the tie")
    assert(equal.count == 100, "100 records counted in the latest file")

    // Scenario 2 — last file shorter (100,100,100,100,80): still the
    // highest index, with its own smaller count
    val fewerState = stateOf(five.init.map(_ -> 100) :+ (five.last -> 80))
    val fewer = SitemapState.currentFill(fewerState)
    assert(fewer.index == 5, "highest file wins even when it holds fewer rows")
    assert(fewer.count == 80, "80 records counted in the latest file")

    // Scenario 3 — the state's count agrees with a direct count of the
    // backing table (the reference's db-agreement check)
    val actual = fewerState
      .filter(col("sitemap_filename") === "sitemap_bib_5.xml").count()
    assert(fewer.count == actual, "fill count matches the table's own count")
    assert(actual == 80L)

    // Scenario 4 — null filenames (assigned-but-never-filed rows) are
    // ignored, not counted and never the winner
    val withNulls = SitemapState.currentFill(
      stateOf(five.init.map(_ -> 100) :+ (five.last -> 80), withNulls = true))
    assert(withNulls.index == 5 && withNulls.count == 80,
      "null filenames filtered out of the fill computation")

    // Scenario 5 — empty table: default to file 1, count 0
    val empty = SitemapState.currentFill(SitemapState.empty(spark))
    assert(empty.index == 1, "default index 1 on an empty table")
    assert(empty.count == 0, "zero count on an empty table")
  }
}
