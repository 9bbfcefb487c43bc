package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/session warmup so the first measured query doesn't absorb
    // classloading + codegen compiler startup (a fixed ~3-5s tax that
    // would be attributed to whichever query the map yields first)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).limit(1000).groupBy("l_returnflag").count().collect()
    // Deterministic name order. `queries` is a HashMap whose iteration
    // order reshuffles whenever the catalog gains an entry, which moved
    // queries between rounds and made per-query timings incomparable
    // (r1→r2 showed 3 phantom "regressions" — j4/t4/p7 — that were just
    // position changes: each absorbed different JIT/codegen warmup at its
    // new slot). Sorted order pins each query's position and neighbors
    // across rounds so BENCH_rN diffs measure the code, not the map.
    // Optional comma-separated name filter for local iteration (slope
    // checks on one query without the 161-query sweep); unset = all.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // drop any caches a query materialized so timings stay independent
    // (incl. the sitemap ordinal pins, whose queue must drain too)
    def cleanup(): Unit = graft.catalog.Catalog.unpersistAll(spark)
    // Untimed warmup pass: every query compiles its codegen and JITs its
    // UDFs once, so the timed pass measures steady-state execution — the
    // alphabetically-first queries otherwise absorb the session's residual
    // warmup (~2-4x on sub-second queries) no matter what ran in the
    // generic warmup above.
    ordered.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      cleanup()
    }
    // cumulative JVM GC wall-clock — printed per pass to answer the r8
    // drift question (uniform ~15-25% overlap drift smelled like heap
    // pressure from the growing single-session catalog, not plan changes)
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).filter(_ > 0).sum
    }
    def timedPass(dir: String): (Seq[(String, Double)], Double) = {
      val gc0 = gcMillis()
      val res = ordered.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, dir).count() } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        cleanup()
        name -> dt
      }
      (res, (gcMillis() - gc0) / 1e3)
    }
    def jsonOf(results: Seq[(String, Double)]): String = results
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // Optional second scale factor (default sf0.01, "off" disables): a
    // per-query timing at 10x-smaller data printed BEFORE the headline
    // lines, so per-family scaling slope is visible from one artifact.
    // The driver's parser reads the LAST lines, which stay unchanged.
    // Every pass's full per-query map ALSO lands in a standalone artifact:
    // the driver's tail-capture truncates the front of the long stdout
    // lines (r4, r6, r9 — the first ~100 queries vanish from BENCH_rN),
    // so round-over-round diffs must not depend on stray /tmp logs. One
    // JSON object per pass, keyed by sf dir, atomically rewritten.
    val artifact = new scala.collection.mutable.LinkedHashMap[String, String]()
    def record(dir: String, line: String): Unit = {
      artifact(dir) = line
      val body = artifact.map { case (k, v) => "\"" + k + "\": " + v }
        .mkString("{\n", ",\n", "\n}")
      val tmp = java.nio.file.Paths.get("target/bench_full.json.tmp")
      java.nio.file.Files.writeString(tmp, body)
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get("target/bench_full.json"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val sfDir2 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR2", "/root/testdata/sf0.01")
    if (sfDir2 != "off" && new java.io.File(sfDir2).isDirectory) {
      val (r2, gc2) = timedPass(sfDir2)
      val line2 = s"""{"metric":"total_sf2","value":${r2.map(_._2).sum},"unit":"sec","gc_sec":$gc2,"queries":${jsonOf(r2)},"sf":"$sfDir2"}"""
      println(line2)
      record(sfDir2, line2)
    }
    // Headline = per-query MIN across N timed passes (default 2,
    // SPARK_GRAFT_BENCH_PASSES=1 restores the single-pass form). Twice
    // now an isolated single-pass reading diverged ~40% from same-day
    // pairs on identical code — uniform across untouched queries, i.e.
    // session/machine noise, which the untimed warmup above cannot damp.
    // The min across same-session passes is the same estimator the
    // recorded BENCH_DUALSF_MIN series uses; the JSON says so explicitly
    // ("mode") and records every pass total, so nothing is hidden.
    val passes = sys.env.get("SPARK_GRAFT_BENCH_PASSES")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(2)
    val timed = (1 to passes).map(_ => timedPass(sfDir))
    val byName = timed.map(_._1.toMap)
    val results = ordered.map { case (n, _) => n -> byName.map(_(n)).min }
    val qs = jsonOf(results)
    val total = results.map(_._2).sum
    val passTotals = timed.map(_._1.map(_._2).sum)
    val line = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""mode":"min-of-$passes-passes",""" +
      s""""pass_totals":${passTotals.map(t => f"$t%.1f").mkString("[", ",", "]")},""" +
      s""""pass_gc_sec":${timed.map(t => f"${t._2}%.1f").mkString("[", ",", "]")},""" +
      s""""gc_sec":${timed.map(_._2).sum},"queries":$qs,"sf":"$sfDir"}"""
    println(line)
    record(sfDir, line)
    // second, SHORT line: the driver's tail-capture has truncated the
    // front of the long per-query line in past rounds (r4, r6), losing
    // the headline "metric":"total" field — a line this short always
    // survives whole
    println(s"""{"total":$total,"n_queries":${results.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
