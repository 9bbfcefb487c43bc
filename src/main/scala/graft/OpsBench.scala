package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoders

import graft.records.UpdateMessage
import graft.sources.MasterStore

/** The composed DAILY OPS LOOP as one scenario — the pieces PipelineBench
  * and BootstrapBench price separately (ingest wave, feed-driven index
  * sweep, feed-driven sitemap cadence, vacuum) run together, several
  * cycles, against one standing corpus, asserting what no single-leg
  * bench can: that the two feed cursors advance in lockstep with the
  * waves, that the cadence stays in feed mode cycle after cycle (the
  * sitemap summary survives the index sweep's interleaved publishes),
  * that retention + vacuum keep the stores bounded while both consumers
  * hold registered cursors, and that each cycle's wall is ∝ the wave,
  * not the corpus.
  *
  * Reference analog: one operational day of `run.py` — the queue
  * consumers land updates, the reindex cron sweeps, the sitemap cron
  * regenerates, and the DBA never has to vacuum because Postgres
  * overwrites rows in place (this engine's vacuum is that garbage
  * collection, priced here on the cadence).
  *
  * Cycle 0 is untimed setup: the one-time sitemap bootstrap plus the two
  * crons' cursor-bootstrap runs (each table-wide once, by design).
  * Cycles 1..N are the steady state the loop exists to measure.
  *
  * Env: SPARK_GRAFT_OPS_ROWS (default 28,816,728 — the reference corpus),
  * SPARK_GRAFT_OPS_CYCLES (default 3), SPARK_GRAFT_OPS_WAVE (default
  * 2,500), SPARK_GRAFT_OPS_DIR, SPARK_GRAFT_CPUS.
  */
object OpsBench {

  private def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_OPS_ROWS", "28816728").toLong
    val cycles = sys.env.getOrElse("SPARK_GRAFT_OPS_CYCLES", "3").toInt
    val waveK = sys.env.getOrElse("SPARK_GRAFT_OPS_WAVE", "2500").toLong
    val work = sys.env.getOrElse("SPARK_GRAFT_OPS_DIR", "target/ops-bench")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-ops-bench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    require(rows >= cycles * waveK * 4, s"corpus $rows too small for the waves")

    val workPath = new org.apache.hadoop.fs.Path(work)
    val fs = workPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(workPath)) fs.delete(workPath, true)

    val root = s"$work/master"
    val buckets = math.max(8, (rows / 1000000L).toInt)
    val store = new MasterStore(root, numBuckets = buckets)
    val outBuf = new java.lang.StringBuilder
    val deps = Cli.Deps(new Cli.LogTransport("solr", _ => ()),
      new Cli.LogTransport("bulk", _ => ()),
      out = s => { outBuf.append(s).append('\n'); () })
    val argvBase = Seq("--store", root)
    def cli(expect: String, args: String*): Double = {
      outBuf.setLength(0)
      val t0 = System.nanoTime()
      val rc = Cli.run(spark, argvBase ++ args, deps)
      val w = secs(t0)
      require(rc == 0, s"cli ${args.mkString(" ")} failed rc=$rc: $outBuf")
      require(expect.isEmpty || outBuf.toString.contains(expect),
        s"expected '$expect' in: $outBuf")
      w
    }

    // ── untimed setup: the standing, fully-indexed corpus ───────────────
    val doneTs = new java.sql.Timestamp(System.currentTimeMillis() - 7200 * 1000L)
    var t0 = System.nanoTime()
    store.write(TransformBench.fixture(spark, rows)
      .withColumn("processed", lit(doneTs))
      .withColumn("status", lit("success")))
    val fixtureSec = secs(t0)
    // one-time sitemap bootstrap (priced on its own in BootstrapBench)
    t0 = System.nanoTime()
    cli("", "--manage-sitemap", "--action", "bootstrap")
    val smBootstrapSec = secs(t0)
    // cursor-bootstrap runs: table-wide once each, by design
    t0 = System.nanoTime()
    cli("discovery=table-scan", "--index-from-feed")
    cli("table-scan discovery", "--update-sitemaps-auto", "--days-back", "1")
    val cursorBootstrapSec = secs(t0)

    val wmIndex = s"$root-watermarks"
    val wmSitemap = s"$root-sitemap-watermarks"
    def cursorOf(dir: String, key: String): Long =
      graft.streaming.Watermark.readGen(spark, dir, key).getOrElse(-1L)

    // ── the daily loop, timed per stage per cycle ───────────────────────
    // the wave's INTERNAL stage breakdown (the r15 feed-sweep discipline
    // applied to the ingest merge): merge_read = keyed lookup + upsert
    // compute to the merged count, publish = stamp compute + layer write
    // + CAS + auto-compaction, report = cached status aggregations
    val waveStages = scala.collection.mutable.Map.empty[String, Double]
    def wave(c: Int): Unit = {
      // merge-only ingest (sinks off): the wave lands PENDING — updated
      // moved past processed — exactly the state the cadences discover
      val lo = rows / 2 + (c - 1) * waveK
      val m = PipelineBench.messages(spark, lo, lo + waveK, rev = c,
        tsBase = System.currentTimeMillis())
        .as[UpdateMessage](Encoders.product[UpdateMessage])
      Pipeline.runBatch(spark, store, m,
        deps.solrTransport, deps.bulkTransport,
        now = new java.sql.Timestamp(System.currentTimeMillis()),
        sinks = Set.empty, keyLocal = true,
        stageTimer = (n, s) => { waveStages(n) = s; () })
      ()
    }
    case class Cycle(wave: Double, index: Double, sitemap: Double, vacuum: Double,
      waveMergeRead: Double, wavePublish: Double, lookupProbe: Double)
    val walls = (1 to cycles).map { c =>
      val preIdxCur = cursorOf(wmIndex, Pipeline.GenCursorKey)
      val preSmCur = cursorOf(wmSitemap, "last.sitemaps.generation")
      t0 = System.nanoTime()
      wave(c)
      val waveSec = secs(t0)
      // steady state: BOTH cadences must discover from the feed
      val idxSec = cli("discovery=feed", "--index-from-feed")
      require(outBuf.toString.contains(s"solrOk=$waveK"),
        s"cycle $c index sweep must deliver exactly the wave: $outBuf")
      val smSec = cli("feed discovery", "--update-sitemaps-auto", "--days-back", "1")
      val vacSec = cli("vacuum master", "--vacuum", "--retain", "2",
        "--orphans", "--orphan-grace-min", "60")
      // cursors advance every cycle; a stuck cursor would re-deliver
      require(cursorOf(wmIndex, Pipeline.GenCursorKey) > preIdxCur,
        s"cycle $c: index cursor did not advance")
      require(cursorOf(wmSitemap, "last.sitemaps.generation") > preSmCur,
        s"cycle $c: sitemap cursor did not advance")
      // standalone probe of the wave's keyed read (same key shape as the
      // wave just merged, post-vacuum store state): isolates the
      // lookupFrame plan from the merge it feeds — the stage the r15
      // breakdown couldn't see inside
      val lo = rows / 2 + (c - 1) * waveK
      val probeKeys = spark.range(lo, lo + waveK)
        .select(concat(lit("2026Pipe"), format_string("%07d", col("id")),
          lit("....A")).as("bibcode")) // the wave's own key shape
      val tp = System.nanoTime()
      store.lookupFrame(spark, probeKeys).count()
      val probeSec = secs(tp)
      val mr = waveStages.getOrElse("merge_read", -1.0)
      val pb = waveStages.getOrElse("publish", -1.0)
      System.err.println(f"[ops-bench] cycle $c: wave $waveSec%.1f s " +
        f"(merge_read $mr%.1f, publish $pb%.1f), lookup probe " +
        f"$probeSec%.1f s, index $idxSec%.1f s, sitemap $smSec%.1f s, " +
        f"vacuum $vacSec%.1f s")
      Cycle(waveSec, idxSec, smSec, vacSec, mr, pb, probeSec)
    }

    // ── post-loop invariants: bounded stores, registered consumers ──────
    require(store.versions.size <= 3,
      s"vacuum must bound master generations, got ${store.versions}")
    val smStore = new MasterStore(s"$root-sitemap",
      empty = graft.operators.SitemapState.empty)
    require(smStore.versions.size <= 3,
      s"vacuum must bound sitemap generations, got ${smStore.versions}")
    val consumers = store.consumerCursors.keySet
    require(consumers == Set("reindex", "sitemaps"),
      s"both cadences must hold registered cursors, got $consumers")
    require(store.stats.get.consumersBehind == 0,
      "no consumer may end the loop behind the feed horizon")
    val smRows = smStore.read(spark).count()

    def col3(f: Cycle => Double): String =
      walls.map(w => f"${f(w)}%.1f").mkString("[", ",", "]")
    println(
      s"""{"metric":"ops_loop","rows":$rows,"cycles":$cycles,"wave":$waveK,""" +
      s""""fixture_sec":${f"$fixtureSec%.1f"},""" +
      s""""sitemap_bootstrap_sec":${f"$smBootstrapSec%.1f"},""" +
      s""""cursor_bootstrap_sec":${f"$cursorBootstrapSec%.1f"},""" +
      s""""wave_sec":${col3(_.wave)},"index_sec":${col3(_.index)},""" +
      s""""sitemap_sec":${col3(_.sitemap)},"vacuum_sec":${col3(_.vacuum)},""" +
      s""""wave_merge_read_sec":${col3(_.waveMergeRead)},""" +
      s""""wave_publish_sec":${col3(_.wavePublish)},""" +
      s""""wave_lookup_probe_sec":${col3(_.lookupProbe)},""" +
      s""""steady_cycle_sec":${f"${(if (walls.size > 1) walls.drop(1) else walls)
        .map(w => w.wave + w.index + w.sitemap + w.vacuum).max}%.1f"},""" +
      s""""sitemap_state_rows":$smRows,""" +
      s""""master_generations":${store.versions.size},""" +
      s""""consumers_registered":${consumers.size}}""")
    spark.stop()
  }
}
