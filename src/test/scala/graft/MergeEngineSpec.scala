package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.records._
import graft.operators.MergeEngine

/** Merge-engine semantics tests: upsert newest-wins, scix assignment,
  * changelog pre-images, cascading delete, alias fixpoint, duplicate
  * merge, mark-processed (reference: adsmp/app.py:120-300,432-468;
  * scripts/fix_db_duplicates.py). */
class MergeEngineSpec extends AnyFunSuite with SparkSpec {

  def ts(s: String): Timestamp = Timestamp.from(java.time.Instant.parse(s))

  test("M1 upsert: insert, slot replace, newest-wins within batch, scix assignment") {
    import spark.implicits._
    val master = MergeEngine.emptyMaster(spark)
    val batch = Seq(
      UpdateMessage("b1", "metadata", """{"title": ["first"]}""", ts("2024-01-01T00:00:00Z")),
      UpdateMessage("b1", "metadata", """{"title": ["second"]}""", ts("2024-01-02T00:00:00Z")),
      UpdateMessage("b1", "orcid_claims", """{"verified": ["x"]}""", ts("2024-01-01T12:00:00Z")),
      UpdateMessage("b2", "fulltext", """{"body": "b"}""", ts("2024-01-03T00:00:00Z"))
    ).toDS()

    val r1 = MergeEngine.upsert(master, batch)
    val rows = r1.master.collect().map(r => r.getAs[String]("bibcode") -> r).toMap
    assert(rows.size == 2)
    assert(rows("b1").getAs[String]("bib_data") == """{"title": ["second"]}""",
      "newest message wins the slot")
    assert(rows("b1").getAs[String]("orcid_claims") == """{"verified": ["x"]}""")
    assert(rows("b1").getAs[String]("scix_id") != null, "scix assigned with bib_data")
    assert(rows("b2").getAs[String]("scix_id") == null, "no scix without bib_data")
    assert(rows("b1").getAs[Timestamp]("updated") == ts("2024-01-02T00:00:00Z"))

    // changelog: one row per message; second metadata's pre-image = first's payload
    val log = r1.changeLog.orderBy("ts").collect()
    assert(log.length == 4)
    val metaRows = log.filter(_.getAs[String]("ctype") == "metadata")
    assert(metaRows.head.getAs[String]("oldvalue") == null, "fresh record has no pre-image")
    assert(metaRows(1).getAs[String]("oldvalue") == """{"title": ["first"]}""")
    assert(log.filter(_.getAs[String]("ctype") == "fulltext")
      .head.getAs[String]("oldvalue") == "not-stored")

    // second batch: update replaces slot, scix and other slots survive
    val scix1 = rows("b1").getAs[String]("scix_id")
    val batch2 = Seq(UpdateMessage("b1", "metadata", """{"title": ["third"]}""",
      ts("2024-02-01T00:00:00Z"))).toDS()
    val r2 = MergeEngine.upsert(r1.master, batch2)
    val b1 = r2.master.filter(col("bibcode") === "b1").collect().head
    assert(b1.getAs[String]("bib_data") == """{"title": ["third"]}""")
    assert(b1.getAs[String]("orcid_claims") == """{"verified": ["x"]}""", "other slots survive")
    assert(b1.getAs[String]("scix_id") == scix1, "scix is sticky once assigned")
    val log2 = r2.changeLog.collect()
    assert(log2.length == 1 &&
      log2.head.getAs[String]("oldvalue") == """{"title": ["second"]}""",
      "pre-image comes from the pre-batch master")
  }

  test("M2 cascading delete flags one survivor per affected file") {
    import spark.implicits._
    val master = MergeEngine.upsert(MergeEngine.emptyMaster(spark), Seq(
      UpdateMessage("b1", "metadata", "{}", ts("2024-01-01T00:00:00Z")),
      UpdateMessage("b2", "metadata", "{}", ts("2024-01-01T00:00:00Z")),
      UpdateMessage("b3", "metadata", "{}", ts("2024-01-01T00:00:00Z"))).toDS()).master
    val sitemap = Seq(
      SitemapEntry(1, "b1", "sitemap_bib_1.xml", None, None, update_flag = false),
      SitemapEntry(2, "b2", "sitemap_bib_1.xml", None, None, update_flag = false),
      SitemapEntry(3, "b3", "sitemap_bib_2.xml", None, None, update_flag = false)).toDF()

    val res = MergeEngine.deleteByBibcodes(master, sitemap, Seq("b1").toDF("bibcode"))
    assert(res.master.collect().map(_.getAs[String]("bibcode")).toSet == Set("b2", "b3"))
    val sm = res.sitemap.collect().map(r =>
      r.getAs[String]("bibcode") -> r.getAs[Boolean]("update_flag")).toMap
    assert(sm == Map("b2" -> true, "b3" -> false),
      "survivor of the affected file is flagged; untouched file is not")
    val log = res.changeLog.collect()
    assert(log.length == 1 && log.head.getAs[Boolean]("permanent"))
  }

  test("J7 alias chains resolve to terminal targets, cycles terminate") {
    import spark.implicits._
    val aliases = Seq(
      IdentifierAlias("a", "b"), IdentifierAlias("b", "c"), IdentifierAlias("c", "d"),
      IdentifierAlias("x", "y"),
      IdentifierAlias("p", "q"), IdentifierAlias("q", "p") // cycle
    ).toDS()
    val resolved = MergeEngine.resolveAliases(aliases)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(resolved("a") == "d" && resolved("b") == "d" && resolved("c") == "d")
    assert(resolved("x") == "y")
    assert(Set("p", "q").contains(resolved("p")), "cycle resolves without hanging")
  }

  test("M3 rename repoints chain and masters") {
    import spark.implicits._
    val master = MergeEngine.upsert(MergeEngine.emptyMaster(spark), Seq(
      UpdateMessage("old", "metadata", "{}", ts("2024-01-01T00:00:00Z"))).toDS()).master
    val aliases = Seq(IdentifierAlias("ancient", "old")).toDS()
    val res = MergeEngine.renameBibcode(master, aliases, "old", "new")
    assert(res.master.collect().head.getAs[String]("bibcode") == "new")
    val edges = res.aliases.collect().map(r => r.getString(0) -> r.getString(1)).toSet
    assert(edges == Set("ancient" -> "new", "old" -> "new"))
  }

  test("A3 duplicate merge keeps newest slot values per bibcode") {
    val m1 = MasterRecord.empty("dup", id = 1).copy(
      bib_data = Some("""{"v": 1}"""), bib_data_updated = Some(ts("2024-01-01T00:00:00Z")),
      fulltext = Some("old body"), fulltext_updated = Some(ts("2024-01-05T00:00:00Z")),
      updated = Some(ts("2024-01-05T00:00:00Z")))
    val m2 = MasterRecord.empty("dup", id = 2).copy(
      bib_data = Some("""{"v": 2}"""), bib_data_updated = Some(ts("2024-02-01T00:00:00Z")),
      updated = Some(ts("2024-02-01T00:00:00Z")))
    import spark.implicits._
    val merged = MergeEngine.mergeDuplicates(
      spark.createDataset(Seq(m1, m2)).toDF).collect()
    assert(merged.length == 1)
    val r = merged.head
    assert(r.getAs[Long]("id") == 1L, "min id survives")
    assert(r.getAs[String]("bib_data") == """{"v": 2}""", "newer bib wins")
    assert(r.getAs[String]("fulltext") == "old body", "slot with only one value survives")
  }

  test("M4 mark-processed stamps only the hit rows") {
    import spark.implicits._
    val master = MergeEngine.upsert(MergeEngine.emptyMaster(spark), Seq(
      UpdateMessage("b1", "metadata", "{}", ts("2024-01-01T00:00:00Z")),
      UpdateMessage("b2", "metadata", "{}", ts("2024-01-01T00:00:00Z"))).toDS()).master
    val now = ts("2024-03-01T00:00:00Z")
    val done = Seq(("b1", "0xabc")).toDF("bibcode", "checksum")
    val out = MergeEngine.markProcessed(master, done, "solr", Some("success"), now)
      .collect().map(r => r.getAs[String]("bibcode") -> r).toMap
    assert(out("b1").getAs[Timestamp]("solr_processed") == now)
    assert(out("b1").getAs[String]("solr_checksum") == "0xabc")
    assert(out("b1").getAs[String]("status") == "success")
    assert(out("b2").getAs[Timestamp]("solr_processed") == null)
    assert(out("b2").getAs[String]("status") == null)
    intercept[IllegalArgumentException] {
      MergeEngine.markProcessed(master, done, "bogus", None, now)
    }
  }
}
