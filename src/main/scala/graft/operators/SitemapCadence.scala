package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted cross-cadence summary of the sitemap state table — the piece
  * that makes the feed-driven sitemap cron's STATE access ∝ delta.
  *
  * The cron needs three table-wide answers every cycle: the global fill
  * cursor (which file new records continue filling,
  * [[SitemapState.currentFill]]), the per-file lastmod list the site
  * indexes render (reference tasks.py:888-899), and "are there stale
  * flagged files a crashed run left behind". Recomputing them is one full
  * reconcile of the state table per cron — the reference pays the same
  * query against Postgres (app.py:1018-1071), and at the 28.8M-row corpus
  * it was this engine's feed cadence's dominant fixed cost. This summary
  * caches all three, stamped with the state store's GENERATION:
  *
  *  - valid (stamped generation == the store's live generation): nothing
  *    mutated the state since the summary was persisted — the cadence that
  *    wrote it was the last writer and left the table flag-clean, so the
  *    cron runs entirely key-local (fill advances arithmetically by the
  *    new-assignment count; affected files' stats recompute exactly from
  *    the members it renders anyway; untouched files' stats cannot have
  *    changed);
  *  - invalid (any other writer published — a manage-sitemap action, a
  *    cleanup, a compaction by another process — or no summary yet): one
  *    [[rebuild]] scan recomputes it, also surfacing any stale flagged
  *    files so the next render covers what a crashed run left. Always
  *    correct, the full-scan cost paid once per out-of-band mutation
  *    instead of once per cron.
  *
  * Single-writer contract (same as the reference's sitemap cron): the
  * generation check makes a concurrent writer's mutation force a rebuild,
  * never a wrong answer, but two cadences racing each other would race the
  * fill cursor exactly as two concurrent reference crons would race
  * Postgres' fill query.
  *
  * The summary lives OUTSIDE the watermark dir (a sibling file): the
  * watermark's crash-safe advance is a whole-directory swap that would
  * silently drop any foreign file stored inside it.
  */
object SitemapCadence {

  /** Per-file stats the site index needs: max non-null member lastmod
    * (yyyy-MM-dd) and whether any member lacks a bib_data_updated (such a
    * member renders as "today", so the file's index lastmod floats to the
    * render date — reproduced exactly, not approximated). */
  case class FileStat(name: String, maxLastmod: Option[String], hasNullBdu: Boolean)

  case class Summary(generation: Long, fillIndex: Int, fillCount: Long,
      files: Seq[FileStat]) {
    def fill: SitemapState.Fill = SitemapState.Fill(fillIndex, fillCount)
    /** Index lastmod for one file, matching the full path's
      * `max(coalesce(date_format(bib_data_updated), today))`. */
    def lastmodOf(f: FileStat, today: String): String =
      if (f.hasNullBdu) (f.maxLastmod.toSeq :+ today).max
      else f.maxLastmod.getOrElse(today)
  }

  /** The summary is a sibling of the watermark dir, never inside it (see
    * class doc). */
  def pathFor(watermarkDir: String): String = s"$watermarkDir.cadence.json"

  private val FileIdx = "sitemap_bib_(\\d+)\\.xml".r

  /** One-scan recompute from the live state: per-file stats + the fill
    * cursor + any files holding a stale update flag (a crashed run's
    * unrendered work — the caller must include them in its next render,
    * which restores the flag-clean invariant the generation check then
    * carries forward). */
  def rebuild(state: DataFrame, generation: Long,
      maxPerFile: Int = Sitemap.MaxRecordsPerSitemap): (Summary, Seq[String]) = {
    val rows = state.filter(col("sitemap_filename").isNotNull)
      .groupBy(col("sitemap_filename"))
      .agg(count(lit(1)).as("cnt"),
        max(date_format(col("bib_data_updated"), "yyyy-MM-dd")).as("max_nn"),
        max(when(col("bib_data_updated").isNull, 1).otherwise(0)).as("nulls"),
        max(when(col("update_flag"), 1).otherwise(0)).as("flagged"))
      .collect() // bounded: ≤ corpus / maxPerFile file names
    val stats = rows.map(r => FileStat(r.getString(0),
      Option(r.getString(2)), r.getInt(3) > 0)).toSeq.sortBy(_.name)
    val stale = rows.filter(_.getInt(4) > 0).map(_.getString(0)).toSeq.sorted
    val fill = rows
      .flatMap(r => FileIdx.findFirstMatchIn(r.getString(0))
        .map(m => m.group(1).toInt -> r.getLong(1)))
      .sortBy(-_._1).headOption match {
      case None => SitemapState.Fill(1, 0)
      case Some((i, c)) =>
        if (c >= maxPerFile) SitemapState.Fill(i + 1, 0) else SitemapState.Fill(i, c)
    }
    (Summary(generation, fill.index, fill.count, stats), stale)
  }

  // ------------------------------------------------------------ persistence

  /** Load the persisted summary; None when absent OR unparsable (the
    * summary is a cache — a corrupt file heals by rebuild, it must never
    * wedge the cron). The caller validates `generation` itself. */
  def load(spark: SparkSession, watermarkDir: String): Option[Summary] = {
    val p = new org.apache.hadoop.fs.Path(pathFor(watermarkDir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    try {
      val in = fs.open(p)
      val content = try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        new String(bytes.toByteArray, "UTF-8")
      } finally in.close()
      implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
      val j = org.json4s.jackson.JsonMethods.parse(content)
      Some(Summary(
        (j \ "generation").extract[Long],
        (j \ "fillIndex").extract[Int],
        (j \ "fillCount").extract[Long],
        (j \ "files").extract[List[org.json4s.JValue]].map { f =>
          FileStat((f \ "name").extract[String],
            (f \ "maxLastmod").extractOpt[String],
            (f \ "hasNullBdu").extract[Boolean])
        }))
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Persist via temp + atomic rename-overwrite through the Hadoop FS
    * (the dir may be HDFS/S3 beside the snapshots — java.io would
    * silently write local). FileContext's Rename.OVERWRITE replaces the
    * target in ONE namespace operation where the FS supports it — the
    * exists→delete→rename sequence would leave NO summary at all if the
    * process died between the delete and the rename (self-healing via a
    * full rebuild scan, but a crash window that doesn't need to exist).
    * Filesystems without a FileContext binding (e.g. bare LocalFS test
    * schemes) fall back to the old two-step, accepting that window. */
  def save(spark: SparkSession, watermarkDir: String, s: Summary): Unit = {
    import org.json4s.JsonDSL._
    val body = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        ("generation" -> s.generation) ~
          ("fillIndex" -> s.fillIndex) ~ ("fillCount" -> s.fillCount) ~
          ("files" -> s.files.toList.map(f =>
            ("name" -> f.name) ~ ("maxLastmod" -> f.maxLastmod) ~
              ("hasNullBdu" -> f.hasNullBdu)))))
    val target = new org.apache.hadoop.fs.Path(pathFor(watermarkDir))
    val tmp = new org.apache.hadoop.fs.Path(pathFor(watermarkDir) + ".tmp")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = target.getFileSystem(conf)
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(target.toUri, conf)
      fc.rename(tmp, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        if (fs.exists(target) && !fs.delete(target, false))
          throw new java.io.IOException(s"cadence summary: cannot replace $target")
        if (!fs.rename(tmp, target))
          throw new java.io.IOException(
            s"cadence summary: rename $tmp -> $target refused")
    }
  }
}
