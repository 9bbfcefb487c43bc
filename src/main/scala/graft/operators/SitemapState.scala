package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import java.sql.Timestamp

import graft.records.SitemapEntry

/** Stateful sitemap assignment table (reference adsmp/models.py:154-191
  * `SitemapInfo`; actions adsmp/tasks.py:586-836, adsmp/app.py:1005-1315).
  *
  * The reference keeps file membership STICKY: a record is assigned to
  * `sitemap_bib_<k>.xml` once and keeps that slot across runs; new records
  * continue filling the numerically-last file; removes leave holes that are
  * never re-packed. That stability is the point — a record's sitemap URL
  * set never churns, so crawlers only refetch files whose members changed.
  *
  * Spark shape: the state is one DataFrame with [[SitemapEntry]] schema.
  * Every action is a declarative plan over it — joins against the (small)
  * action key set, one W2 window for per-file flags, and the distributed
  * global ordinal (no single-partition window) for continued fills. The
  * only driver-side values are the current fill level (one tiny
  * aggregation) and the affected-file lists of a remove (bounded by
  * corpus/50k, i.e. ~576 names at 28.8M records).
  */
object SitemapState {

  val columns: Seq[String] = Seq("record_id", "bibcode", "sitemap_filename",
    "bib_data_updated", "filename_lastmoddate", "update_flag")

  def empty(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[SitemapEntry].toDF.select(columns.map(col): _*)
  }

  /** The last file being filled (app.py:1018-1071): highest numeric index;
    * if that file is already full the next index starts empty. Holes left
    * in EARLIER files by removes are deliberately not refilled. */
  case class Fill(index: Int, count: Long)

  def currentFill(state: DataFrame, maxPerFile: Int = Sitemap.MaxRecordsPerSitemap): Fill = {
    val idx = regexp_extract(col("sitemap_filename"), "sitemap_bib_(\\d+)\\.xml", 1)
      .cast("int")
    val last = state.filter(col("sitemap_filename").isNotNull)
      .groupBy(idx.as("__idx")).count()
      .orderBy(col("__idx").desc).limit(1).collect()
    if (last.isEmpty) Fill(1, 0)
    else {
      val (i, c) = (last.head.getInt(0), last.head.getLong(1))
      if (c >= maxPerFile) Fill(i + 1, 0) else Fill(i, c)
    }
  }

  private def fileName(idx: Column): Column =
    concat(lit("sitemap_bib_"), idx.cast("string"), lit(".xml"))

  /** Arithmetic fill advance after an [[addKeyed]] of `added` NEW
    * assignments: [[assignNew]] fills the current file to the boundary
    * then rolls over, so the post-add [[currentFill]] is pure integer
    * arithmetic on the pre-add fill — what lets the feed cadence carry
    * the fill cursor across crons without re-aggregating the table
    * (spec-pinned against currentFill across boundary cases). */
  def advanceFill(fill: Fill, added: Long, maxPerFile: Int): Fill = {
    require(added >= 0 && fill.count < maxPerFile, s"unnormalized fill $fill")
    val total = fill.count + added
    Fill(fill.index + (total / maxPerFile).toInt, total % maxPerFile)
  }

  /** How many of an add batch's keys will get FRESH file assignments
    * (present+included in master, absent from the state rows passed as
    * `existingKeys`) — the `added` input to [[advanceFill]], computed
    * ∝ batch before the merge runs. */
  def countNewAssignments(master: DataFrame, bibcodes: DataFrame,
      existingKeys: DataFrame): Long =
    candidates(master, bibcodes)
      .join(existingKeys.select(col("bibcode")), Seq("bibcode"), "left_anti")
      .count()

  /** Assign brand-new rows continuing from `fill`: global ordinal in
    * record_id order, then index = fill.index + (fill.count + ord) /
    * maxPerFile — fills the current file exactly to the boundary before
    * rolling over (app.py:1128-1136). */
  private def assignNew(newRecs: DataFrame, fill: Fill, maxPerFile: Int): DataFrame =
    Sitemap.withGlobalOrdinal(newRecs, "record_id", "__ord")
      .withColumn("sitemap_filename",
        fileName(lit(fill.index) +
          floor((col("__ord") + fill.count) / maxPerFile).cast("int")))
      .drop("__ord")
      .withColumn("filename_lastmoddate", lit(null).cast("timestamp"))
      .withColumn("update_flag", lit(true))
      .select(columns.map(col): _*)

  private def candidates(master: DataFrame, bibcodes: DataFrame): DataFrame =
    master.join(bibcodes.select(col("bibcode")).distinct(), Seq("bibcode"), "left_semi")
      .filter(Sitemap.shouldInclude)
      .select(col("id").as("record_id"), col("bibcode"), col("bib_data_updated"))

  /** `bootstrap` (tasks.py:663-770): assign every included master record in
    * id order from an empty table; everything flagged for generation.
    * Refuses (returns the existing state unchanged) when the table already
    * has rows, as the reference does. */
  def bootstrap(state: DataFrame, master: DataFrame,
      maxPerFile: Int = Sitemap.MaxRecordsPerSitemap): DataFrame =
    if (state.limit(1).count() > 0) state
    else assignNew(
      master.filter(Sitemap.shouldInclude)
        .select(col("id").as("record_id"), col("bibcode"), col("bib_data_updated")),
      Fill(1, 0), maxPerFile)

  /** `add` / `force-update` (app.py:1073-1184). For each requested bibcode
    * that exists in master and passes inclusion:
    *  - not yet in the table → assigned continuing the current fill,
    *    flagged, filename_lastmoddate null (never generated);
    *  - already present → bib_data_updated refreshed; under `add` the flag
    *    is set iff the file was never generated or the data is newer than
    *    filename_lastmoddate (which is then advanced to bib_data_updated,
    *    the reference's repeat-add dedup marker, app.py:1152-1160); under
    *    `force-update` always flagged. Matching the reference, the flag is
    *    OVERWRITTEN for matched rows — a pending flag on a row whose data
    *    is not newer is cleared by a plain add.
    * Rows not named in the batch pass through untouched. */
  def add(state: DataFrame, master: DataFrame, bibcodes: DataFrame,
      maxPerFile: Int = Sitemap.MaxRecordsPerSitemap,
      force: Boolean = false): DataFrame =
    // the whole-table action IS the key-local plan applied to the full
    // state (rows outside the due set pass through the left_outer
    // untouched) — one implementation, so the flag-ordering subtlety
    // documented in addKeyed cannot drift between the two forms
    addKeyed(state, master, bibcodes, currentFill(state, maxPerFile),
      maxPerFile, force)

  /** Key-local form of [[add]] for `writeMergeKeyed`: receives ONLY the
    * due keys' current state rows and returns their NEW rows (fresh
    * assignments included), so the state store appends a delta layer
    * ∝ due keys instead of rewriting the whole table each cron — the
    * write-side half of the feed-driven sitemap cadence (the read-side
    * half is discovering `bibcodes` from the master store's change feed).
    *
    * Per-key semantics are IDENTICAL to [[add]] (parity spec-pinned):
    * the logic is the same hit/flag/assign plan, only scoped to the due
    * rows instead of passing the whole state through. Two contract
    * notes: `fill` must be computed from the full state (one tiny
    * aggregation, [[currentFill]]) just before the merge — the fill
    * cursor is global, which makes this form single-writer like the
    * reference's sitemap cron (concurrent ADDS would race the fill;
    * concurrent flag-clears/removes are fine, the CAS rebase keeps
    * them); and a due key present nowhere (not in state, excluded from
    * master) yields a tombstone for a key that never existed — reconciled
    * away, a few bytes of layer, never a wrong row. */
  def addKeyed(curRows: DataFrame, master: DataFrame, bibcodes: DataFrame,
      fill: Fill, maxPerFile: Int = Sitemap.MaxRecordsPerSitemap,
      force: Boolean = false): DataFrame = {
    val cand = candidates(master, bibcodes)
    val newRecs = cand.join(curRows.select(col("bibcode")), Seq("bibcode"), "left_anti")
    val added = assignNew(newRecs, fill, maxPerFile)
    val hits = cand.select(col("bibcode"), col("bib_data_updated").as("__new_bdu"),
      lit(true).as("__hit"))
    val flagCond =
      if (force) col("__hit")
      else col("__hit") && (col("filename_lastmoddate").isNull ||
        (col("__new_bdu").isNotNull && col("__new_bdu") > col("filename_lastmoddate")))
    // evaluate the flag BEFORE mutating filename_lastmoddate — later
    // withColumns would otherwise resolve flagCond against the already-
    // advanced lastmoddate and never see the row as newer
    val updated = curRows.join(hits, Seq("bibcode"), "left_outer")
      .withColumn("__flag", coalesce(flagCond, lit(false)))
      .withColumn("bib_data_updated",
        when(col("__hit"), col("__new_bdu")).otherwise(col("bib_data_updated")))
      .withColumn("filename_lastmoddate",
        when(col("__flag"), col("__new_bdu")).otherwise(col("filename_lastmoddate")))
      .withColumn("update_flag",
        when(col("__hit"), col("__flag")).otherwise(col("update_flag")))
      .select(columns.map(col): _*)
    updated.unionByName(added)
  }

  /** W2 — flag the min-record_id surviving member of every affected file
    * so the whole file regenerates without its removed members
    * (app.py:84-118). ONE implementation shared by the remove action and
    * the cascading delete ([[MergeEngine.deleteByBibcodes]]) — the two
    * paths must flag the same survivor row for the same file. Rows whose
    * filename is null or not affected pass through untouched. */
  def flagSurvivors(survivors: DataFrame, affectedFiles: DataFrame): DataFrame = {
    val affected = affectedFiles.select(col("sitemap_filename")).distinct()
    val w = Window.partitionBy(col("sitemap_filename")).orderBy(col("record_id"))
    survivors.join(affected, Seq("sitemap_filename"), "left_semi")
      .withColumn("__rn", row_number().over(w))
      .withColumn("update_flag", col("update_flag") || (col("__rn") === 1))
      .drop("__rn")
      .unionByName(survivors.join(affected, Seq("sitemap_filename"), "left_anti"))
  }

  /** `remove` (app.py:1263-1315): drop the named rows; files left empty are
    * reported for deletion, files that still have members get exactly one
    * surviving row flagged (the min-record_id row, app.py:84-118) so the
    * whole file regenerates without its removed members. */
  case class RemoveResult(state: DataFrame, filesToDelete: Seq[String],
      filesToUpdate: Seq[String])

  def remove(state: DataFrame, bibcodes: DataFrame): RemoveResult = {
    val doomed = bibcodes.select(col("bibcode")).distinct()
      .withColumn("__doomed", lit(true))
    val marked = state.join(doomed, Seq("bibcode"), "left_outer")
    // one aggregation yields both lists: files losing members, split by
    // whether anyone survives in them. Driver-side names are tiny
    // (≤ corpus / maxPerFile, ~576 at 28.8M records)
    val stats = marked.filter(col("sitemap_filename").isNotNull)
      .groupBy(col("sitemap_filename"))
      .agg(count(when(col("__doomed"), 1)).as("__gone"),
        count(when(col("__doomed").isNull, 1)).as("__alive"))
      .filter(col("__gone") > 0)
      .collect()
      .map(r => r.getAs[String]("sitemap_filename") -> (r.getAs[Long]("__alive") > 0L))
    val filesToDelete = stats.collect { case (f, false) => f }.sorted.toSeq
    val filesToUpdate = stats.collect { case (f, true) => f }.sorted.toSeq
    val survivors = marked.filter(col("__doomed").isNull).drop("__doomed")
    // files that lost members (emptied ones have no survivor to flag, so
    // including them is vacuous); flagging itself is the shared W2 helper
    val affected = marked.filter(col("__doomed"))
      .select(col("sitemap_filename"))
    val flagged = flagSurvivors(survivors, affected)
    RemoveResult(flagged.select(columns.map(col): _*), filesToDelete, filesToUpdate)
  }

  /** Cleanup of entries that stopped meeting the inclusion criteria
    * (tasks.py:482-585): join the state against the master table and run
    * the standard remove reconciliation over every entry whose record
    * went solr-failed/retrying, lost its bib_data, or disappeared from
    * the master entirely (orphans join to nothing → null bib_data →
    * excluded). One outer join + the remove machinery — the reference's
    * keyset-paginated batch loop collapses into a single distributed
    * pass. */
  def cleanupInvalid(state: DataFrame, master: DataFrame): RemoveResult = {
    val joined = state.select(col("bibcode")).distinct()
      .join(master.select(col("bibcode"), col("bib_data"), col("status")),
        Seq("bibcode"), "left_outer")
    val invalid = joined.filter(!coalesce(Sitemap.shouldInclude, lit(false)))
      .select(col("bibcode"))
    remove(state, invalid)
  }

  /** The render worklist (tasks.py:1132-1142): every member row of every
    * file with at least one flagged row, shaped for [[Sitemap.renderFiles]]
    * with lastmod = date(bib_data_updated) or `today` when the record never
    * carried one (tasks.py:1015-1019). */
  def renderable(state: DataFrame, today: String): DataFrame =
    Sitemap.filesNeedingUpdate(state)
      .select(col("record_id").as("id"), col("bibcode"), col("sitemap_filename"),
        coalesce(date_format(col("bib_data_updated"), "yyyy-MM-dd"), lit(today))
          .as("lastmod"))

  /** Post-generation stamp (tasks.py:1040-1046): the rendered files' rows
    * get filename_lastmoddate = now and the flag cleared. */
  def markGenerated(state: DataFrame, files: DataFrame, now: Timestamp): DataFrame =
    state.join(
      files.select(col("sitemap_filename")).distinct().withColumn("__gen", lit(true)),
      Seq("sitemap_filename"), "left_outer")
      .withColumn("filename_lastmoddate",
        when(col("__gen"), lit(now)).otherwise(col("filename_lastmoddate")))
      .withColumn("update_flag",
        when(col("__gen"), lit(false)).otherwise(col("update_flag")))
      .select(columns.map(col): _*)
}
