package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-time decomposition for the small relational rows whose dual-SF
  * slopes look superlinear (`s2_scan_prune` 5.7×, `j2_inlist_lookup`
  * 4.6×, `q1_agg` 3.2× for 10× data — sub-second absolute, but the
  * catalog's scale story should say WHY with evidence, SCALING.md).
  *
  * Method: run each query twice per SF (cold = first execution incl.
  * file listing + AQE planning; warm = steady state) with a listener
  * summing per-stage task counts, executor run time, and stage wall
  * clock. The decomposition separates three candidate explanations:
  *   - compute growth (executor run time scales ~10× with the data),
  *   - task/file overhead (task count grows with the fixture's file
  *     count while per-task work stays trivial),
  *   - fixed driver overhead (wall ≫ executor-time/slots — scheduling,
  *     planning, result fetch dominate the sub-second total).
  * A bare `count()` over each table at both SFs is printed as the scan
  * floor the queries cannot beat. Usage: runMain graft.SlopeForensic
  * [sf0.1dir sf1.0dir]. */
object SlopeForensic {
  def main(args: Array[String]): Unit = {
    val sfA = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val sfB = if (args.length > 1) args(1) else "target/sf1.0"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class StageRow(tasks: Int, execMs: Long, wallMs: Long)
    val stages = collection.mutable.ArrayBuffer.empty[StageRow]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages.synchronized {
          stages += StageRow(si.numTasks, si.taskMetrics.executorRunTime,
            (for (c <- si.completionTime; s <- si.submissionTime) yield c - s)
              .getOrElse(0L))
        }
      }
    })

    def measured[T](body: => T): (T, Double, Seq[StageRow]) = {
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      // stage-completed events arrive on the listener bus asynchronously
      // (the public API hides the bus): poll until the set is quiet for
      // 300 ms, so a late event can't leak into the NEXT probe's row —
      // that mis-attribution would corrupt the very decomposition this
      // tool exists to produce
      var last = -1
      var quietSince = System.nanoTime()
      while ((System.nanoTime() - quietSince) < 300L * 1000 * 1000 &&
          (System.nanoTime() - t0) < 5L * 1000 * 1000 * 1000) {
        val now = stages.synchronized(stages.size)
        if (now != last) { last = now; quietSince = System.nanoTime() }
        Thread.sleep(50)
      }
      (r, sec, stages.synchronized(stages.toSeq))
    }
    def report(tag: String, sf: String, sec: Double, rows: Long,
        ss: Seq[StageRow]): Unit = {
      val execSec = ss.map(_.execMs).sum / 1e3
      println(f"""{"probe":"$tag","sf":"$sf","wall_sec":$sec%.3f,""" +
        f""""rows":$rows,"stages":${ss.size},"tasks":${ss.map(_.tasks).sum},""" +
        f""""executor_sec":$execSec%.3f,""" +
        f""""ideal_parallel_sec":${execSec / cpus}%.3f,""" +
        f""""stage_wall_sec":${ss.map(_.wallMs).sum / 1e3}%.3f}""")
    }

    for ((dir, sf) <- Seq(sfA -> "sf0.1", sfB -> "sf1.0")) {
      for (t <- Seq("lineitem", "events", "customer", "orders")) {
        val (n, sec, ss) = measured(Tables.load(spark, dir, t).count())
        report(s"floor_count_$t", sf, sec, n, ss)
      }
      for (q <- Seq("s2_scan_prune", "j2_inlist_lookup", "q1_agg")) {
        val df = SparkEntry.queries(q)(spark, dir)
        val (n1, sec1, ss1) = measured(df.count())
        report(s"${q}_cold", sf, sec1, n1, ss1)
        val (n2, sec2, ss2) = measured(df.count())
        report(s"${q}_warm", sf, sec2, n2, ss2)
        graft.catalog.Catalog.unpersistAll(spark)
      }
    }
    spark.stop()
  }
}
