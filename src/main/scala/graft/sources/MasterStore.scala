package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.operators.MergeEngine

/** Snapshot store for the mutable master table on immutable columnar
  * storage (SURVEY.md §7.4 risk 2).
  *
  * The reference mutates Postgres rows in place; here every mutation batch
  * produces the next immutable snapshot and an atomic pointer swap:
  *
  *   root/
  *     v_00000001/   (parquet, hash-distributed by bibcode)
  *     v_00000002/
  *     CURRENT       (one line: the live version)
  *
  * Readers resolve CURRENT once and read a consistent snapshot; a crashed
  * writer leaves at most an orphan directory, never a torn table. Old
  * versions remain for time travel until `vacuum`.
  *
  * Scale: snapshots are written `repartition(n, bibcode)` so every
  * merge-on-write join against a delta keyed by bibcode co-partitions with
  * AQE, and bibcode point-lookups prune to one partition's files. At
  * cluster scale `n` tracks corpus size (the 28.8M-row reference corpus at
  * ~2 KB/row → ~60 GB → a few hundred buckets).
  */
class MasterStore(val root: String, numBuckets: Int = 8,
    empty: SparkSession => DataFrame = MergeEngine.emptyMaster,
    keyCol: String = "bibcode") {

  private def currentFile = Paths.get(root, "CURRENT")

  def currentVersion: Option[Long] =
    if (Files.exists(currentFile))
      Some(new String(Files.readAllBytes(currentFile), "UTF-8").trim.toLong)
    else None

  private def versionDir(v: Long) = Paths.get(root, f"v_$v%08d")

  /** Read the live snapshot (empty frame when the store is new). */
  def read(spark: SparkSession): DataFrame = currentVersion match {
    case Some(v) => spark.read.parquet(versionDir(v).toString)
      .select(empty(spark).columns.map(col).toIndexedSeq: _*)
    case None => empty(spark)
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

  /** Write the next snapshot and atomically advance CURRENT. Overwrite
    * mode makes the write replay-tolerant: a crashed attempt leaves an
    * orphan v_N directory CURRENT never pointed at, and the replay (e.g.
    * a restarted streaming micro-batch) simply rewrites it. */
  def write(master: DataFrame): Long = {
    val next = currentVersion.getOrElse(0L) + 1
    master
      .repartition(numBuckets, col(keyCol))
      .write.mode("overwrite").parquet(versionDir(next).toString)
    val tmp = Paths.get(root, "CURRENT.tmp")
    Files.createDirectories(Paths.get(root))
    Files.write(tmp, next.toString.getBytes("UTF-8"))
    Files.move(tmp, currentFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** M6 — truncate with backup (adsmp/app.py:1241-1261): point CURRENT at
    * a fresh empty snapshot FIRST, then park the old snapshot in the
    * backup dir — a crash between the two steps leaves a readable (empty)
    * table plus an unmoved old dir, never a CURRENT referencing a moved
    * directory. */
  def truncate(spark: SparkSession, backupDir: String): Unit = {
    val old = currentVersion
    write(empty(spark))
    old.foreach { v =>
      val src = versionDir(v)
      val dst = Paths.get(backupDir, src.getFileName.toString)
      Files.createDirectories(Paths.get(backupDir))
      Files.move(src, dst, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Drop all snapshots older than the live one (the reference's
    * truncate+backup M6 keeps one generation too). */
  def vacuum(): Unit = currentVersion.foreach { live =>
    for (v <- versions if v != live) {
      val walk = Files.walk(versionDir(v))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
      finally walk.close()
    }
  }

  def versions: Seq[Long] = {
    val dir = Paths.get(root)
    if (!Files.exists(dir)) Nil
    else {
      // Files.list holds an open DirectoryStream until closed — a
      // long-lived driver calling this per micro-batch would otherwise
      // leak one fd per call until GC finalizes them
      val listing = Files.list(dir)
      try {
        val out = scala.collection.mutable.ArrayBuffer.empty[Long]
        listing.forEach { p =>
          val n = p.getFileName.toString
          if (n.startsWith("v_")) out += n.stripPrefix("v_").toLong
        }
        out.sorted.toSeq
      } finally listing.close()
    }
  }
}
