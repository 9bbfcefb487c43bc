package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.operators.{SitemapMembers, SitemapState}
import graft.sources.MasterStore

/** The file-ordinal member index as a layout MasterStore: reads open only
  * the touched files' buckets (the files-opened proof), tombstones land
  * in bucket 0 and stay visible to every pruned read, a removed+re-added
  * key whose row MOVES buckets reconciles correctly from either side,
  * and a stale mirror (out-of-band primary mutation) heals by resync. */
class SitemapMembersSpec extends AnyFunSuite with SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** State rows id/bib/file: file = sitemap_bib_<n>.xml. */
  private def stateFrame(rows: Seq[(Long, String, Int)]) = {
    import spark.implicits._
    rows.toDF("record_id", "bibcode", "fidx")
      .withColumn("sitemap_filename",
        concat(lit("sitemap_bib_"), col("fidx").cast("string"), lit(".xml")))
      .drop("fidx")
      .withColumn("bib_data_updated", lit(ts("2024-01-01 00:00:00")))
      .withColumn("filename_lastmoddate", lit(null).cast("timestamp"))
      .withColumn("update_flag", lit(false))
      .select(SitemapState.columns.map(col): _*)
  }

  test("membersOf opens only the touched files' buckets (plus the " +
    "tombstone bucket) and returns exactly their member rows") {
    val root = java.nio.file.Files.createTempDirectory("graft_smm").toString
    val mi = new SitemapMembers(s"$root/members", numBuckets = 8)
    // 16 files × 4 members, ordinals 1..16 spread across the 8 buckets
    val rows = for (f <- 1 to 16; m <- 0 until 4)
      yield ((f * 100 + m).toLong, f"B${f * 100 + m}%015d", f)
    mi.store.write(stateFrame(rows))

    val got = mi.membersOf(spark, Seq("sitemap_bib_3.xml"))
      .select("bibcode").collect().map(_.getString(0)).toSet
    assert(got == (0 until 4).map(m => f"B${300 + m}%015d").toSet)
    assert(mi.lastFilesOpened > 0 && mi.lastFilesTotal > 0)
    // bucket prune: file 3 lives in bucket 3, plus tombstone bucket 0 —
    // 2 of 8 buckets of base files open
    assert(mi.lastFilesOpened < mi.lastFilesTotal,
      s"opened ${mi.lastFilesOpened} of ${mi.lastFilesTotal} — no prune")
    assert(mi.lastFilesOpened <= mi.lastFilesTotal / 2,
      s"opened ${mi.lastFilesOpened} of ${mi.lastFilesTotal}")
  }

  test("tombstones (null filename → bucket 0) subtract from every pruned " +
    "read; a re-added key that moves buckets reconciles from either side") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_smm2").toString
    val mi = new SitemapMembers(s"$root/members", numBuckets = 8)
    val rows = for (f <- 1 to 8; m <- 0 until 3)
      yield ((f * 100 + m).toLong, f"B${f * 100 + m}%015d", f)
    mi.store.write(stateFrame(rows))

    // remove one member of file 2 (keys = the key, merged rows = empty →
    // tombstone, which carries a NULL filename → bucket 0)
    val doomed = f"B${200}%015d"
    mi.store.writeMergeKeyed(spark, Seq(doomed).toDF("bibcode"),
      _ => stateFrame(Nil))
    val after = mi.membersOf(spark, Seq("sitemap_bib_2.xml"))
      .select("bibcode").collect().map(_.getString(0)).toSet
    assert(!after.contains(doomed), "tombstoned member must not resurrect")
    assert(after == Set(f"B${201}%015d", f"B${202}%015d"))

    // re-add the same key into a DIFFERENT file (5): reading file 5's
    // buckets sees the new row; reading file 2's buckets sees only the
    // tombstone and keeps the key out
    mi.store.writeMergeKeyed(spark, Seq(doomed).toDF("bibcode"),
      _ => stateFrame(Seq((200L, doomed, 5))))
    val f5 = mi.membersOf(spark, Seq("sitemap_bib_5.xml"))
      .select("bibcode").collect().map(_.getString(0)).toSet
    assert(f5.contains(doomed), "re-added member must appear in its new file")
    val f2 = mi.membersOf(spark, Seq("sitemap_bib_2.xml"))
      .select("bibcode").collect().map(_.getString(0)).toSet
    assert(!f2.contains(doomed), "old file's pruned read must not see it")
    // full reconcile agrees
    assert(mi.store.read(spark).filter(col("bibcode") === doomed)
      .select("sitemap_filename").head().getString(0) == "sitemap_bib_5.xml")
  }

  test("a stale mirror stamp (out-of-band primary mutation, or a crash " +
    "between publish and stamp) heals by one resync") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_smm3").toString
    val primary = new MasterStore(s"$root/state", empty = SitemapState.empty)
    val mi = new SitemapMembers(s"$root/members", numBuckets = 4)
    primary.write(stateFrame(Seq((1L, "B1", 1), (2L, "B2", 1), (3L, "B3", 2))))

    // never stamped → stale → resync mirrors the primary
    assert(!mi.isFresh(primary.currentVersion.getOrElse(0L)))
    mi.resync(spark, primary)
    assert(mi.isFresh(primary.currentVersion.getOrElse(0L)))
    assert(mi.store.read(spark).count() == 3)

    // out-of-band primary write → stamp stale again
    primary.writeMergeKeyed(spark, Seq("B4").toDF("bibcode"),
      _ => stateFrame(Seq((4L, "B4", 2))))
    assert(!mi.isFresh(primary.currentVersion.getOrElse(0L)))
    mi.resync(spark, primary)
    assert(mi.isFresh(primary.currentVersion.getOrElse(0L)))
    assert(mi.membersOf(spark, Seq("sitemap_bib_2.xml")).count() == 2)

    // an out-of-band write to the INDEX side also invalidates (selfGen
    // moved past the stamp)
    mi.store.writeMergeKeyed(spark, Seq("B9").toDF("bibcode"),
      _ => stateFrame(Seq((9L, "B9", 3))))
    assert(!mi.isFresh(primary.currentVersion.getOrElse(0L)))
  }
}
