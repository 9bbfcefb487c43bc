package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Persisted MinHash fingerprint index with segment-append maintenance —
  * the table `dd_incremental` and `StreamingNearDup` assume as "the
  * standing corpus's banded index", made a real store with a lifecycle:
  * admit a batch → APPEND its 4 band rows per doc; retract docs → append
  * a tombstone set; periodically COMPACT the segments into one.
  *
  * Layout (MasterStore's atomic-pointer discipline, adapted to appends —
  * a snapshot-per-mutation store would rewrite the whole 4-rows-per-doc
  * index to admit one batch, which at a 12B-doc corpus is the difference
  * between touching ~KBs and rewriting ~TBs):
  *
  *   root/
  *     seg_<batchId>/   (parquet: doc_id, sh, band_idx, band_val)
  *     ts_<batchId>/    (parquet: doc_id — retracted)
  *     CURRENT          (manifest: one live segment/tombstone name per line)
  *     CURRENT.v        (monotone manifest version, for audits)
  *
  * Mutations write their segment dir FIRST (overwrite mode), then swap
  * the manifest atomically. A crash between the two leaves an orphan
  * directory the manifest never referenced — never a torn index — and
  * the replay (at-least-once delivery, the reference's ST4 contract,
  * adsmp/tasks.py:404-429) rewrites the same segment byte-identically
  * and re-swaps an IDENTICAL manifest: appends are idempotent in the
  * caller-supplied batchId, not in arrival count.
  *
  * Readers resolve the manifest once and union the listed segments —
  * a consistent view however many appends race behind them. At cluster
  * scale each segment is a co-partitioned parquet write (band-key joins
  * shuffle only the probe side; see StreamingNearDup) and compaction is
  * the one whole-index rewrite, scheduled like any table-maintenance job.
  */
class FingerprintIndexStore(val root: String, numBuckets: Int = 8) {

  private def currentFile = Paths.get(root, "CURRENT")
  private def versionFile = Paths.get(root, "CURRENT.v")

  /** Live manifest entries (segment + tombstone dir names), oldest first. */
  def manifest: Seq[String] =
    if (!Files.exists(currentFile)) Nil
    else new String(Files.readAllBytes(currentFile), "UTF-8")
      .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)

  def manifestVersion: Long =
    if (!Files.exists(versionFile)) 0L
    else new String(Files.readAllBytes(versionFile), "UTF-8").trim.toLong

  private def swapManifest(entries: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(root))
    val tmp = Paths.get(root, "CURRENT.tmp")
    Files.write(tmp, entries.mkString("\n").getBytes("UTF-8"))
    Files.move(tmp, currentFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    val tv = Paths.get(root, "CURRENT.v.tmp")
    Files.write(tv, (manifestVersion + 1).toString.getBytes("UTF-8"))
    Files.move(tv, versionFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Admit a batch of documents (doc_id, text): write its fingerprint
    * segment, then add it to the manifest. Idempotent in `batchId` — a
    * replay overwrites the same segment with the same rows and the
    * manifest set-union is a no-op. Contract: a doc_id is admitted once
    * (re-admission goes through retract + append under a new batch). */
  def append(docs: DataFrame, batchId: Long): Unit = {
    val seg = f"seg_$batchId%08d"
    graft.streaming.StreamingNearDup.fingerprintIndex(docs)
      .repartition(numBuckets, col("band_idx"), col("band_val"))
      .write.mode("overwrite").parquet(Paths.get(root, seg).toString)
    val m = manifest
    if (!m.contains(seg)) swapManifest(m :+ seg)
  }

  /** Retract documents by id: a tombstone segment, same idempotence. */
  def retract(spark: SparkSession, docIds: Seq[Long], batchId: Long): Unit = {
    import spark.implicits._
    val ts = f"ts_$batchId%08d"
    docIds.toDF("doc_id").coalesce(1)
      .write.mode("overwrite").parquet(Paths.get(root, ts).toString)
    val m = manifest
    if (!m.contains(ts)) swapManifest(m :+ ts)
  }

  private def read(spark: SparkSession, names: Seq[String]): Option[DataFrame] =
    names.map(n => spark.read.parquet(Paths.get(root, n).toString))
      .reduceOption(_ unionAll _)

  /** The live index: union of live segments minus tombstoned docs — the
    * `corpusIndex` input of StreamingNearDup.nearDupStream and the
    * standing side of dd_incremental. The tombstone side of the anti-join
    * is small by nature (retractions, not corpus) — broadcastable. */
  def activeIndex(spark: SparkSession): DataFrame = {
    val m = manifest
    val segs = read(spark, m.filter(_.startsWith("seg_")))
      .getOrElse(emptyIndex(spark))
    read(spark, m.filter(_.startsWith("ts_"))) match {
      case Some(ts) => segs.join(broadcast(ts.select(col("doc_id")).distinct()),
        Seq("doc_id"), "left_anti")
      case None => segs
    }
  }

  /** Fold every live segment into one, dropping retracted docs and any
    * defensively-duplicated (doc_id, band_idx) rows, then vacuum the
    * superseded dirs. The merged segment id must be FRESH (greater than
    * any live batch id) so a compaction replay stays idempotent too. */
  def compact(spark: SparkSession, batchId: Long): Unit = {
    val old = manifest
    val seg = f"seg_$batchId%08d"
    require(!old.contains(seg), s"compaction batchId $batchId already live")
    activeIndex(spark)
      .dropDuplicates("doc_id", "band_idx")
      .repartition(numBuckets, col("band_idx"), col("band_val"))
      .write.mode("overwrite").parquet(Paths.get(root, seg).toString)
    swapManifest(Seq(seg))
    // vacuum: superseded dirs are unreferenced from here on; a crash
    // mid-delete leaves orphans, never a live reference to a missing dir
    old.foreach { n =>
      val p = Paths.get(root, n)
      if (Files.exists(p)) {
        val walk = Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.delete(f))
        finally walk.close()
      }
    }
  }

  private def emptyIndex(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("sh", ArrayType(LongType)),
        StructField("band_idx", IntegerType),
        StructField("band_val", LongType))))
  }
}
