package graft.operators

import org.apache.spark.SparkContext
import org.apache.spark.sql.SparkSession

/** ST8 — priority scheduling (reference run.py:744-749: Celery queue
  * priority 0–10, cron jobs high). The Spark-native analog is FAIR
  * scheduler pools: concurrent jobs (e.g. a cron-driven incremental
  * reindex next to a long sitemap bootstrap) are weighted instead of
  * FIFO-queued, so a high-priority batch is not starved behind a bulk
  * job's thousands of tasks.
  *
  * Usage: build the session with [[fairSessionConfigs]] (scheduler mode +
  * allocation file), then wrap each submission in [[withPriority]] — the
  * pool routing is a thread-local property, exactly matching the "per
  * submitted job" scope of the reference's per-task priority. */
object Scheduling {

  /** Reference priorities are 0–10 with 10 highest; three pools keep the
    * allocation file legible: 7+ → high, 3–6 → default, else low. */
  def poolFor(priority: Int): String =
    if (priority >= 7) "high" else if (priority >= 3) "default" else "low"

  /** FAIR allocation: high gets 4× the share of default, low runs on
    * leftovers; minShare keeps a starved high-priority job schedulable
    * immediately even while a bulk job holds every executor busy. */
  val allocationXml: String =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<allocations>
      |  <pool name="high">
      |    <schedulingMode>FAIR</schedulingMode>
      |    <weight>4</weight>
      |    <minShare>2</minShare>
      |  </pool>
      |  <pool name="default">
      |    <schedulingMode>FAIR</schedulingMode>
      |    <weight>2</weight>
      |    <minShare>1</minShare>
      |  </pool>
      |  <pool name="low">
      |    <schedulingMode>FAIR</schedulingMode>
      |    <weight>1</weight>
      |    <minShare>0</minShare>
      |  </pool>
      |</allocations>
      |""".stripMargin

  /** Writes the allocation file and returns the configs to put on the
    * session builder. */
  def fairSessionConfigs(): Map[String, String] = {
    val f = java.nio.file.Files.createTempFile("graft-fairscheduler", ".xml")
    java.nio.file.Files.write(f, allocationXml.getBytes("UTF-8"))
    Map("spark.scheduler.mode" -> "FAIR",
      "spark.scheduler.allocation.file" -> f.toString)
  }

  /** Route every job submitted by `body` (on this thread) to the pool for
    * `priority`; restores the previous pool afterwards so nesting works. */
  def withPriority[T](spark: SparkSession, priority: Int)(body: => T): T = {
    val sc: SparkContext = spark.sparkContext
    val prev = sc.getLocalProperty("spark.scheduler.pool")
    sc.setLocalProperty("spark.scheduler.pool", poolFor(priority))
    try body
    finally sc.setLocalProperty("spark.scheduler.pool", prev)
  }
}
