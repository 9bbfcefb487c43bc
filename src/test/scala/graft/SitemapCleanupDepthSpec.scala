package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.operators.{Sitemap, SitemapState}

/** Depth ports of the reference's heaviest sitemap-state scenarios: the
  * cleanup-invalid matrices (adsmp/tests/test_tasks.py:856-1501), the
  * file-rollover and add/force timestamp sequences
  * (adsmp/tests/test_app.py:1652-2302, test_tasks.py:3626-3769), and the
  * delete-then-regenerate workflows (test_tasks.py:1501-1797, 2394-2518).
  * Unlike the summary ports, each test walks the same multi-step sequence
  * the reference drives and asserts the INTERMEDIATE table state after
  * every step, not just the final shape. Each test names its reference
  * test. */
class SitemapCleanupDepthSpec extends AnyFunSuite with SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def masterOf(rows: Seq[(Long, String, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, bib, bd, bdu, st) =>
      (id, bib, Option(bd), Option(bdu).map(ts), Option(st))
    }.toDF("id", "bibcode", "bib_data", "bib_data_updated", "status")
  }

  private def stateOf(rows: Seq[(Long, String, String, Boolean)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, bib, f, flag) =>
      records.SitemapEntry(id, bib, f, Some(ts("2024-01-01 00:00:00")),
        Some(ts("2024-02-01 00:00:00")), flag)
    }.toDS().toDF()
  }

  private def bibs(bs: String*): DataFrame = {
    import spark.implicits._
    bs.toDF("bibcode")
  }

  /** bibcode -> (filename, flag, filename_lastmoddate). */
  private def fullMap(state: DataFrame): Map[String, (String, Boolean, Option[Timestamp])] =
    state.collect().map(r => r.getAs[String]("bibcode") ->
      ((r.getAs[String]("sitemap_filename"), r.getAs[Boolean]("update_flag"),
        Option(r.getAs[Timestamp]("filename_lastmoddate"))))).toMap

  test("cleanup-invalid end to end: 2 valid + 3 invalid in separate files — " +
    "counts, emptied-file delete list, linkage survival, and a second pass " +
    "that is a no-op (test_task_cleanup_invalid_sitemaps)") {
    val state = stateOf(Seq(
      (1L, "2023CleanValid1A", "sitemap_bib_valid.xml", false),
      (2L, "2023CleanValid2B", "sitemap_bib_valid.xml", false),
      (3L, "2023CleanInvalid1C", "sitemap_bib_invalid.xml", false),
      (4L, "2023CleanInvalid2D", "sitemap_bib_invalid.xml", false),
      (5L, "2023CleanInvalid3E", "sitemap_bib_invalid.xml", false)))
    assert(state.count() == 5, "exactly 5 sitemap records after setup")
    val master = masterOf(Seq(
      (1L, "2023CleanValid1A", """{"title": "Valid Test Record"}""",
        "2024-01-01 00:00:00", "success"),
      (2L, "2023CleanValid2B", """{"title": "Valid Test Record"}""",
        "2024-01-01 00:00:00", "success"),
      (3L, "2023CleanInvalid1C", """{"title": "Invalid Test Record"}""",
        "2024-01-01 00:00:00", "solr-failed"),
      (4L, "2023CleanInvalid2D", """{"title": "Invalid Test Record"}""",
        "2024-01-01 00:00:00", "retrying"),
      (5L, "2023CleanInvalid3E", """{"title": "Invalid Test Record"}""",
        "2024-01-01 00:00:00", "solr-failed")))

    val res = SitemapState.cleanupInvalid(state, master)
    // the reference's result dict: invalid_removed=3, one file to delete
    // (the all-invalid file went empty)
    assert(res.filesToDelete == Seq("sitemap_bib_invalid.xml"),
      "the file every invalid member lived in is reported for deletion")
    assert(res.filesToUpdate.isEmpty,
      "the valid file lost nobody, so nothing regenerates")
    val m = fullMap(res.state)
    assert(m.keySet == Set("2023CleanValid1A", "2023CleanValid2B"),
      "exactly 2 records remain; all 3 invalid removed")
    assert(m.values.forall(_._1 == "sitemap_bib_valid.xml"),
      "valid records keep their file linkage")

    // second pass over the cleaned state: removes nothing, deletes nothing
    val res2 = SitemapState.cleanupInvalid(res.state, master)
    assert(res2.state.count() == 2 && res2.filesToDelete.isEmpty &&
      res2.filesToUpdate.isEmpty, "cleanup is idempotent on a clean table")
  }

  test("cleanup-invalid with file flagging: invalid members mixed into " +
    "surviving files flag exactly the min-record_id survivor per file " +
    "(test_task_cleanup_invalid_sitemaps_with_file_flagging)") {
    val state = stateOf(Seq(
      (1L, "Fv1", "sitemap_bib_1.xml", false),
      (2L, "Fv2", "sitemap_bib_1.xml", false),
      (3L, "Fi1", "sitemap_bib_1.xml", false),
      (4L, "Fv3", "sitemap_bib_2.xml", false),
      (5L, "Fi2", "sitemap_bib_2.xml", false),
      (6L, "Fv4", "sitemap_bib_3.xml", false)))
    val master = masterOf(Seq(
      (1L, "Fv1", "{}", "2024-01-01 00:00:00", "success"),
      (2L, "Fv2", "{}", "2024-01-01 00:00:00", "success"),
      (3L, "Fi1", "{}", "2024-01-01 00:00:00", "solr-failed"),
      (4L, "Fv3", "{}", "2024-01-01 00:00:00", "success"),
      (5L, "Fi2", "{}", "2024-01-01 00:00:00", "retrying"),
      (6L, "Fv4", "{}", "2024-01-01 00:00:00", "success")))
    val res = SitemapState.cleanupInvalid(state, master)
    assert(res.filesToUpdate == Seq("sitemap_bib_1.xml", "sitemap_bib_2.xml"),
      "both files that lost a member but kept one regenerate")
    assert(res.filesToDelete.isEmpty)
    val m = fullMap(res.state)
    assert(m.keySet == Set("Fv1", "Fv2", "Fv3", "Fv4"))
    assert(m("Fv1")._2 && !m("Fv2")._2,
      "file 1 flags its min-record_id survivor only")
    assert(m("Fv3")._2, "file 2's lone survivor is flagged")
    assert(!m("Fv4")._2, "an untouched file's members stay unflagged")
  }

  test("cleanup-invalid comprehensive matrix: orphan, null bib_data, " +
    "solr-failed, retrying are removed; null status, success, " +
    "metrics-failed, links-failed stay " +
    "(test_task_cleanup_invalid_sitemaps_comprehensive_invalid_cases, " +
    "test_should_include_in_sitemap_comprehensive)") {
    val state = stateOf((1L to 8L).map(i => (i, s"C$i", "sitemap_bib_1.xml", false)))
    // C1 missing from master entirely (orphan); C2 has null bib_data
    val master = masterOf(Seq(
      (2L, "C2", null, "2024-01-01 00:00:00", "success"),
      (3L, "C3", "{}", "2024-01-01 00:00:00", "solr-failed"),
      (4L, "C4", "{}", "2024-01-01 00:00:00", "retrying"),
      (5L, "C5", "{}", "2024-01-01 00:00:00", null),
      (6L, "C6", "{}", "2024-01-01 00:00:00", "success"),
      (7L, "C7", "{}", "2024-01-01 00:00:00", "metrics-failed"),
      (8L, "C8", "{}", "2024-01-01 00:00:00", "links-failed")))
    val res = SitemapState.cleanupInvalid(state, master)
    val m = fullMap(res.state)
    assert(m.keySet == Set("C5", "C6", "C7", "C8"),
      "only SOLR-related failures, missing bib_data, and orphans are invalid")
    assert(res.filesToUpdate == Seq("sitemap_bib_1.xml"))
    assert(m("C5")._2 && !m("C6")._2 && !m("C7")._2 && !m("C8")._2,
      "one survivor flag for the regeneration, on the min record_id")
  }

  test("file rollover at the boundary: a full file at max=1 rolls each new " +
    "record into its own next file, flagged and never-generated " +
    "(test_process_sitemap_batch_file_rollover)") {
    // pre-state: file 3 holds one record and MAX_RECORDS_PER_SITEMAP=1
    val state = stateOf(Seq((1L, "R0", "sitemap_bib_3.xml", false)))
    val fill0 = SitemapState.currentFill(state, maxPerFile = 1)
    assert(fill0.index == 4 && fill0.count == 0,
      "a full last file advances the fill to the next empty index")
    val master = masterOf(Seq(
      (1L, "R0", "{}", "2024-01-01 00:00:00", "success"),
      (2L, "2023Rollover..1..1A", "{}", "2024-01-02 00:00:00", "success"),
      (3L, "2023Rollover..2..2A", "{}", "2024-01-02 00:00:00", "success")))
    val added = SitemapState.add(state, master,
      bibs("2023Rollover..1..1A", "2023Rollover..2..2A"), maxPerFile = 1)
    val m = fullMap(added)
    assert(m("2023Rollover..1..1A")._1 == "sitemap_bib_4.xml",
      "first record fills the next file")
    assert(m("2023Rollover..2..2A")._1 == "sitemap_bib_5.xml",
      "second record rolls over again at max=1")
    assert(m("2023Rollover..1..1A")._2 && m("2023Rollover..2..2A")._2,
      "both new records carry update_flag=true")
    assert(m("2023Rollover..1..1A")._3.isEmpty && m("2023Rollover..2..2A")._3.isEmpty,
      "filename_lastmoddate stays null until generation")
    assert(m("R0")._1 == "sitemap_bib_3.xml" && !m("R0")._2,
      "the pre-existing row is untouched")
    val fill1 = SitemapState.currentFill(added, maxPerFile = 1)
    assert(fill1.index == 6 && fill1.count == 0,
      "the continuation state after the batch points past file 5")
  }

  test("add-action timestamp sequence: never-generated flags, generation " +
    "clears, a repeat add with unchanged data stays clear, newer data " +
    "re-flags and advances the dedup marker " +
    "(test_process_sitemap_batch_add_action_with_never_generated_file, " +
    "_with_recent_file, _with_stale_file, test_add_action_timestamp_logic)") {
    val master1 = masterOf(Seq((1L, "T1", "{}", "2024-01-10 00:00:00", "success")))
    // step 1: brand-new record → assigned, flagged, lastmoddate null
    val s1 = SitemapState.add(SitemapState.empty(spark), master1, bibs("T1"))
    val m1 = fullMap(s1)
    assert(m1("T1") == (("sitemap_bib_1.xml", true, None)))
    // step 2: generate → flag cleared, lastmoddate stamped
    val now = ts("2024-01-15 00:00:00")
    val s2 = SitemapState.markGenerated(s1,
      s1.select(col("sitemap_filename")), now)
    val m2 = fullMap(s2)
    assert(m2("T1") == (("sitemap_bib_1.xml", false, Some(now))))
    // step 3: repeat add with the SAME bib_data_updated (older than the
    // generation stamp) → recent file, flag stays clear, marker untouched
    val s3 = SitemapState.add(s2, master1, bibs("T1"))
    val m3 = fullMap(s3)
    assert(m3("T1") == (("sitemap_bib_1.xml", false, Some(now))),
      "re-adding unchanged data to a recently generated file is a no-op")
    // step 4: the record's data moves PAST the generation stamp → stale
    // file, flag set, and the dedup marker advances to the new bdu so a
    // fifth identical add would be a no-op again
    val newer = "2024-02-01 00:00:00"
    val master2 = masterOf(Seq((1L, "T1", "{}", newer, "success")))
    val s4 = SitemapState.add(s3, master2, bibs("T1"))
    val m4 = fullMap(s4)
    assert(m4("T1") == (("sitemap_bib_1.xml", true, Some(ts(newer)))),
      "newer data re-flags and advances filename_lastmoddate to bdu")
    // step 5: the repeat of the SAME newer add is deduplicated
    val s5 = SitemapState.add(s4, master2, bibs("T1"))
    assert(fullMap(s5)("T1") == (("sitemap_bib_1.xml", false, Some(ts(newer)))),
      "repeat-add dedup: same bdu no longer counts as newer")
  }

  test("force-update ignores the recency dedup: an old-data force flags, " +
    "and a following plain add clears the pending flag again " +
    "(test_process_sitemap_batch_force_update_with_recent_file, " +
    "_with_stale_file, test_force_update_workflow)") {
    val master = masterOf(Seq((1L, "F1", "{}", "2024-01-01 00:00:00", "success")))
    val s1 = SitemapState.add(SitemapState.empty(spark), master, bibs("F1"))
    val s2 = SitemapState.markGenerated(s1, s1.select(col("sitemap_filename")),
      ts("2024-01-15 00:00:00"))
    assert(!fullMap(s2)("F1")._2, "generated and clear")
    // force: data older than the generation stamp still flags
    val s3 = SitemapState.add(s2, master, bibs("F1"), force = true)
    assert(fullMap(s3)("F1")._2, "force flags regardless of recency")
    // a later PLAIN add with the same old data overwrites the flag back to
    // false — the reference overwrites update_flag for matched rows
    val s4 = SitemapState.add(s3, master, bibs("F1"))
    assert(!fullMap(s4)("F1")._2,
      "plain add recomputes (and here clears) the pending force flag")
  }

  test("delete-then-regenerate workflow: render all, generate, remove one " +
    "member, re-render only the affected file without the doomed URL, " +
    "then empty the file and collect it for deletion " +
    "(test_sitemap_file_regeneration_after_deletion_and_cleanup, " +
    "test_task_update_sitemap_files_after_record_deletion)") {
    val master = masterOf((1L to 6L).map(i =>
      (i, f"D$i", "{}", "2024-01-05 00:00:00", "success")))
    val s1 = SitemapState.bootstrap(SitemapState.empty(spark), master, maxPerFile = 3)
    val m1 = fullMap(s1)
    assert((1 to 3).forall(i => m1(s"D$i")._1 == "sitemap_bib_1.xml") &&
      (4 to 6).forall(i => m1(s"D$i")._1 == "sitemap_bib_2.xml"))
    // full render worklist: both files, all six members
    val r1 = SitemapState.renderable(s1, today = "2024-01-10")
    assert(r1.count() == 6, "bootstrap flags everything for generation")
    val s2 = SitemapState.markGenerated(s1, s1.select(col("sitemap_filename")),
      ts("2024-01-10 00:00:00"))
    assert(SitemapState.renderable(s2, "2024-01-10").count() == 0,
      "after generation the worklist is empty")
    // remove one member of file 1
    val rem = SitemapState.remove(s2, bibs("D2"))
    assert(rem.filesToDelete.isEmpty &&
      rem.filesToUpdate == Seq("sitemap_bib_1.xml"),
      "file 1 lost a member but survives; file 2 untouched")
    val m2 = fullMap(rem.state)
    assert(!m2.contains("D2") && m2("D1")._2,
      "doomed row gone; min-record_id survivor flagged")
    // the re-render worklist is file 1 ONLY: its two survivors
    val r2 = SitemapState.renderable(rem.state, "2024-01-20")
    val worklist = r2.collect().map(_.getAs[String]("bibcode")).toSet
    assert(worklist == Set("D1", "D3"),
      "regeneration covers exactly the affected file's survivors")
    // rendered XML loses the doomed URL, keeps the survivors'
    val rendered = Sitemap.renderFiles(r2, Sitemap.Sites("ads"))
      .collect().map(r => r.getAs[String]("sitemap_filename") ->
        r.getAs[String]("content")).toMap
    assert(rendered.keySet == Set("sitemap_bib_1.xml"))
    assert(!rendered("sitemap_bib_1.xml").contains("D2") &&
      rendered("sitemap_bib_1.xml").contains("D1") &&
      rendered("sitemap_bib_1.xml").contains("D3"))
    // empty file 1 entirely → it moves to the delete list, file 2 still has
    // all its members and stays silent
    val rem2 = SitemapState.remove(rem.state, bibs("D1", "D3"))
    assert(rem2.filesToDelete == Seq("sitemap_bib_1.xml") &&
      rem2.filesToUpdate.isEmpty)
    assert(fullMap(rem2.state).keySet == Set("D4", "D5", "D6"))
  }

  test("remove spanning files: emptying one file while holing another " +
    "yields disjoint delete/update lists, and later adds continue past " +
    "the ghost index (test_task_manage_sitemap_remove_action_batch_processing, " +
    "test_execute_remove_action_empty_files_detection)") {
    val master = masterOf((1L to 25L).map(i =>
      (i, f"B$i%03d", "{}", "2024-01-01 00:00:00", "success")))
    val boot = SitemapState.bootstrap(SitemapState.empty(spark), master, maxPerFile = 10)
    // remove ALL of file 2 (B011-B020) and three members of file 1
    val rem = SitemapState.remove(boot,
      bibs((11 to 20).map(i => f"B$i%03d") ++ Seq("B001", "B002", "B003"): _*))
    assert(rem.filesToDelete == Seq("sitemap_bib_2.xml"),
      "fully-emptied file is deleted")
    assert(rem.filesToUpdate == Seq("sitemap_bib_1.xml"),
      "holed-but-alive file regenerates")
    val m = fullMap(rem.state)
    assert(m.size == 12 && m("B004")._2,
      "survivor flag sits on file 1's new min record_id")
    assert(!m.contains("B011") && m("B021")._1 == "sitemap_bib_3.xml")
    // adds continue at the highest-numbered file — never into the ghost
    // index 2 and never into file 1's holes
    val master2 = masterOf((1L to 33L).map(i =>
      (i, f"B$i%03d", "{}", "2024-01-01 00:00:00", "success")))
    val added = SitemapState.add(rem.state, master2,
      bibs((26 to 33).map(i => f"B$i%03d"): _*), maxPerFile = 10)
    val m2 = fullMap(added)
    assert((26 to 30).forall(i => m2(f"B$i%03d")._1 == "sitemap_bib_3.xml"),
      "file 3 fills 5 → 10")
    assert((31 to 33).forall(i => m2(f"B$i%03d")._1 == "sitemap_bib_4.xml"),
      "then rolls to file 4 — file 2 stays a permanent hole")
  }

  test("two cleanups with a status flip in between: the first pass removes " +
    "nothing, the flip invalidates exactly one record, the second pass " +
    "removes it and flags its file " +
    "(test_task_cleanup_invalid_sitemaps + the reference's " +
    "recently-processed validity rule)") {
    val state = stateOf(Seq(
      (1L, "S1", "sitemap_bib_1.xml", false),
      (2L, "S2", "sitemap_bib_1.xml", false)))
    val healthy = masterOf(Seq(
      (1L, "S1", "{}", "2024-01-01 00:00:00", "success"),
      (2L, "S2", "{}", "2024-01-01 00:00:00", "success")))
    val pass1 = SitemapState.cleanupInvalid(state, healthy)
    assert(pass1.state.count() == 2 && pass1.filesToUpdate.isEmpty &&
      pass1.filesToDelete.isEmpty, "healthy table: cleanup is a no-op")
    // S2's indexing starts failing
    val flipped = masterOf(Seq(
      (1L, "S1", "{}", "2024-01-01 00:00:00", "success"),
      (2L, "S2", "{}", "2024-01-01 00:00:00", "solr-failed")))
    val pass2 = SitemapState.cleanupInvalid(pass1.state, flipped)
    val m = fullMap(pass2.state)
    assert(m.keySet == Set("S1") && m("S1")._2,
      "the flipped record is swept and the survivor regenerates the file")
    assert(pass2.filesToUpdate == Seq("sitemap_bib_1.xml"))
  }

  test("interleaved generation: generating one of two flagged files clears " +
    "only it; the other file's flag and worklist entry survive until its " +
    "own generation (test_task_update_sitemap_files_multiple_files depth)") {
    val state = stateOf(Seq(
      (1L, "G1", "sitemap_bib_1.xml", true),
      (2L, "G2", "sitemap_bib_2.xml", true)))
    import spark.implicits._
    val gen1 = SitemapState.markGenerated(state,
      Seq("sitemap_bib_1.xml").toDF("sitemap_filename"), ts("2024-03-01 00:00:00"))
    val m1 = fullMap(gen1)
    assert(!m1("G1")._2 && m1("G1")._3 == Some(ts("2024-03-01 00:00:00")),
      "generated file: flag cleared, stamp set")
    assert(m1("G2")._2 && m1("G2")._3 == Some(ts("2024-02-01 00:00:00")),
      "pending file: flag and old stamp untouched")
    assert(SitemapState.renderable(gen1, "2024-03-02").collect()
      .map(_.getAs[String]("bibcode")).toSet == Set("G2"),
      "worklist shrinks to the still-pending file")
    val gen2 = SitemapState.markGenerated(gen1,
      Seq("sitemap_bib_2.xml").toDF("sitemap_filename"), ts("2024-03-02 00:00:00"))
    assert(SitemapState.renderable(gen2, "2024-03-03").count() == 0 &&
      !fullMap(gen2)("G2")._2, "second generation drains the worklist")
  }

  test("inclusion filtering applies at bootstrap AND at add: excluded " +
    "statuses never enter the table from either path " +
    "(test_task_manage_sitemap_bootstrap_with_solr_filtering, " +
    "test_task_manage_sitemap_add_action_with_solr_filtering)") {
    val master = masterOf(Seq(
      (1L, "V1", "{}", "2024-01-01 00:00:00", "success"),
      (2L, "X1", "{}", "2024-01-01 00:00:00", "solr-failed"),
      (3L, "X2", null, "2024-01-01 00:00:00", "success"),
      (4L, "V2", "{}", "2024-01-01 00:00:00", null)))
    val boot = SitemapState.bootstrap(SitemapState.empty(spark), master, maxPerFile = 10)
    assert(fullMap(boot).keySet == Set("V1", "V2"),
      "bootstrap filters failed-status and missing-bib_data records")
    // the excluded records are requested explicitly via add — still refused
    val added = SitemapState.add(boot, master, bibs("X1", "X2"), maxPerFile = 10)
    assert(fullMap(added).keySet == Set("V1", "V2"),
      "add applies the same inclusion rule to named bibcodes")
    // and a bootstrap over a NON-empty table refuses wholesale
    val reboot = SitemapState.bootstrap(added, master, maxPerFile = 10)
    assert(fullMap(reboot).keySet == Set("V1", "V2"),
      "bootstrap on a populated table is refused, state unchanged")
  }
}
