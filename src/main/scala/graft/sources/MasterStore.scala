package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import graft.operators.MergeEngine

/** Filesystem helpers shared by the stores in this package. */
private[sources] object FsUtil {
  /** Recursive delete, children first; absent path is a no-op. */
  def deleteTree(p: Path): Unit = if (Files.exists(p)) {
    val walk = Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => Files.delete(f))
    finally walk.close()
  }
}

/** Snapshot store for the mutable master table on immutable columnar
  * storage (SURVEY.md §7.4 risk 2).
  *
  * The reference mutates Postgres rows in place and relies on the database
  * to serialize concurrent ingest workers (`update_storage` runs inside a
  * session transaction, adsmp/app.py:120-195); here every mutation batch
  * produces the next immutable snapshot and a compare-and-swap pointer
  * publish:
  *
  *   root/
  *     v_<nonce>/            (parquet, hash-distributed by keyCol; one
  *                            UNIQUE dir per write attempt — writers never
  *                            share a data directory, so a lost race can
  *                            tear nothing)
  *     gen_<generation>      (one line: the data dir that generation reads)
  *
  * The live snapshot is the HIGHEST generation file; generation g+1 is
  * published by hard-linking a prepared temp file into place
  * (`Files.createLink` — link(2) fails with EEXIST if the name is taken,
  * the one true compare-and-swap a shared filesystem offers; an
  * atomic-move "swap" of a single CURRENT file is last-writer-wins, which
  * is exactly the lost-update race this layout closes: two writers that
  * both read v and both swapped CURRENT→v+1 would silently drop one
  * merge). A writer that loses the CAS observes the winner's generation
  * and either re-publishes (blind `write`) or re-merges on top of the
  * winner's snapshot (`writeMerge`) — both deltas always survive.
  *
  * Readers resolve the max generation once and read a consistent
  * snapshot; a crashed writer leaves at most an orphan data directory no
  * generation references, never a torn table. Old generations remain for
  * time travel until `vacuum`.
  *
  * Scale: snapshots are written `repartition(n, keyCol)` so every
  * merge-on-write join against a delta keyed by keyCol co-partitions with
  * AQE, and keyCol point-lookups prune to one partition's files. At
  * cluster scale `n` tracks corpus size (the 28.8M-row reference corpus at
  * ~2 KB/row → ~60 GB → a few hundred buckets).
  */
class MasterStore(val root: String, numBuckets: Int = 8,
    empty: SparkSession => DataFrame = MergeEngine.emptyMaster,
    keyCol: String = "bibcode") {

  private val GenName = raw"gen_(\d{12})".r

  /** (generation, pointer file) pairs of all published generations. */
  private def generations(): Seq[(Long, Path)] = {
    val dir = Paths.get(root)
    if (!Files.isDirectory(dir)) return Nil
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.flatMap { p =>
        p.getFileName.toString match {
          case GenName(g) => Some(g.toLong -> p)
          case _          => None
        }
      }.toSeq
    } finally s.close()
  }

  /** Read the highest generation consistently: list, read the max; if a
    * concurrent vacuum removed that pointer between the two steps,
    * re-list (the replacement generation is strictly higher, so the loop
    * terminates in one hop per lost race). Returns (0, None) for a new
    * store. */
  private def snapshot(): (Long, Option[String]) = {
    while (true) {
      generations() match {
        case Nil => return (0L, None)
        case gs =>
          val (g, p) = gs.maxBy(_._1)
          try {
            val dir = new String(Files.readAllBytes(p), "UTF-8").trim
            return (g, Some(dir))
          } catch { case _: java.nio.file.NoSuchFileException => () }
      }
    }
    sys.error("unreachable")
  }

  def currentVersion: Option[Long] = snapshot() match {
    case (0L, None) => None
    case (g, _)     => Some(g)
  }

  /** One unique data directory per write attempt. The nonce keeps two
    * racing writers (or a writer and its own crashed prior attempt) out
    * of each other's files — the "torn v_N directory" failure mode of a
    * shared version-numbered path cannot occur. */
  private def freshDataDir(): String =
    "v_" + java.util.UUID.randomUUID.toString.replace("-", "").take(16)

  private def readDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(Paths.get(root, dir).toString)
      .select(empty(spark).columns.map(col).toIndexedSeq: _*)

  /** Read the live snapshot (empty frame when the store is new). */
  def read(spark: SparkSession): DataFrame = snapshot() match {
    case (_, Some(dir)) => readDir(spark, dir)
    case _              => empty(spark)
  }

  /** Bulk keyed read — the engine analog of the reference's
    * `get_records_bulk` / `get_sitemap_info_bulk`
    * (adsmp/app.py:279-352; timed in tests/test_app.py:818-1008). The
    * reference chunks `IN (...)` queries against Postgres and assembles a
    * driver-side dict; here the key list rides an IN-list predicate so
    * Catalyst pushes it into the parquet scan (visible as PushedFilters —
    * non-matching row groups never leave storage), and `loadOnly` is plain
    * column selection whose pruning reaches the scan's ReadSchema: a
    * 2-column projection of a 30-column master reads 2 columns, which is
    * the whole point at 100 TB. The key column always rides along (the
    * reference's dict is keyed by bibcode). An empty key list returns the
    * empty frame without touching storage, matching the reference's
    * `{}` short-circuit. */
  def lookup(spark: SparkSession, keys: Seq[String],
      loadOnly: Seq[String] = Nil): DataFrame = {
    val base = read(spark)
    val projected =
      if (loadOnly.isEmpty) base
      else base.select((keyCol +: loadOnly.filterNot(_ == keyCol)).map(col): _*)
    if (keys.isEmpty) projected.limit(0)
    else projected.filter(col(keyCol).isin(keys: _*))
  }

  /** CAS publish: generation `expected`+1 points at `dataDir` iff no
    * other writer published that generation first. */
  private def tryPublish(expected: Long, dataDir: String): Boolean = {
    Files.createDirectories(Paths.get(root))
    val target = Paths.get(root, f"gen_${expected + 1}%012d")
    if (Files.exists(target)) return false
    val tmp = Files.createTempFile(Paths.get(root), ".gen", ".tmp")
    try {
      Files.write(tmp, dataDir.getBytes("UTF-8"))
      try { Files.createLink(target, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp)
  }

  private def deleteTree(p: Path): Unit = FsUtil.deleteTree(p)

  /** Replace the whole table with `master` (blind write — the next
    * snapshot does not depend on the current one, so a lost CAS just
    * re-publishes the same data directory at the new generation; nothing
    * re-runs). A crashed attempt leaves an orphan directory no generation
    * references, and the replay (e.g. a restarted streaming micro-batch)
    * publishes a fresh identical snapshot. Concurrent read-modify-write
    * merges must use `writeMerge` — `write(read() merged delta)` re-opens
    * the lost-update window this store exists to close. */
  def write(master: DataFrame): Long = {
    val dir = freshDataDir()
    master
      .repartition(numBuckets, col(keyCol))
      .write.mode("overwrite").parquet(Paths.get(root, dir).toString)
    var g = snapshot()._1
    while (!tryPublish(g, dir)) g = snapshot()._1
    g + 1
  }

  /** Read-merge-publish with CAS retry — the engine-side replacement for
    * the reference's Postgres-serialized `update_storage`
    * (adsmp/app.py:120-195): `applyDelta` receives the CURRENT snapshot
    * and returns the merged table; if another writer published first, the
    * stale merge's data directory is dropped and the delta is re-applied
    * on top of the winner's snapshot. Two interleaved writers therefore
    * both land — neither merge can be silently discarded. `applyDelta`
    * must be re-runnable (pure in its input frame). */
  def writeMerge(spark: SparkSession, applyDelta: DataFrame => DataFrame): Long = {
    while (true) {
      val (g, dirOpt) = snapshot()
      val current = dirOpt.map(readDir(spark, _)).getOrElse(empty(spark))
      val dir = freshDataDir()
      applyDelta(current)
        .repartition(numBuckets, col(keyCol))
        .write.mode("overwrite").parquet(Paths.get(root, dir).toString)
      if (tryPublish(g, dir)) return g + 1
      // lost: this merge was computed against a superseded snapshot —
      // discard it and re-merge on top of the winner
      deleteTree(Paths.get(root, dir))
    }
    sys.error("unreachable")
  }

  /** M6 — truncate with backup (adsmp/app.py:1241-1261): publish a fresh
    * empty snapshot FIRST, then park the old snapshot in the backup dir —
    * a crash between the two steps leaves a readable (empty) table plus an
    * unmoved old dir, never a live generation referencing a moved
    * directory. */
  def truncate(spark: SparkSession, backupDir: String): Unit = {
    val (_, old) = snapshot()
    write(empty(spark))
    old.foreach { d =>
      val src = Paths.get(root, d)
      val dst = Paths.get(backupDir, d)
      Files.createDirectories(Paths.get(backupDir))
      Files.move(src, dst, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Drop all generations older than the live one and the data dirs
    * those SUPERSEDED generations reference. Safe under concurrent
    * writers: a dir is deleted only if a generation below the live one
    * names it — an in-flight writer's not-yet-published dir is
    * unreferenced and therefore untouched, and a generation published
    * concurrently is above `live` and keeps its (fresh-nonce) dir.
    *
    * `alsoOrphans = true` additionally removes unreferenced `v_` dirs
    * (crashed or CAS-losing attempts). That sweep CANNOT distinguish a
    * dead orphan from a concurrent writer's dir mid-write, so it is for
    * quiesced maintenance windows only — the same contract as any
    * table-format VACUUM's retention override. */
  def vacuum(alsoOrphans: Boolean = false): Unit = {
    val (live, liveDir) = snapshot()
    if (live == 0L) return
    val superseded = generations().filter(_._1 < live)
    val refs = superseded.flatMap { case (_, p) =>
      try Some(new String(Files.readAllBytes(p), "UTF-8").trim)
      catch { case _: java.nio.file.NoSuchFileException => None }
    }.toSet -- liveDir
    refs.foreach(d => deleteTree(Paths.get(root, d)))
    superseded.foreach { case (_, p) => Files.deleteIfExists(p) }
    if (alsoOrphans) {
      val keep = liveDir.toSet ++
        generations().flatMap { case (_, p) =>
          try Some(new String(Files.readAllBytes(p), "UTF-8").trim)
          catch { case _: java.nio.file.NoSuchFileException => None }
        }
      val dir = Paths.get(root)
      val listing = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        listing.iterator().asScala
          .filter(p => Files.isDirectory(p) &&
            p.getFileName.toString.startsWith("v_") &&
            !keep.contains(p.getFileName.toString))
          .toSeq
          .foreach(deleteTree)
      } finally listing.close()
    }
  }

  /** Published generation numbers, oldest first. */
  def versions: Seq[Long] = generations().map(_._1).sorted
}
