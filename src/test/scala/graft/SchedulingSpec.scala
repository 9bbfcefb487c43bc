package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scheduling

/** ST8 priority scheduling: pool mapping, thread-local routing with
  * restore, and a valid allocation file. */
class SchedulingSpec extends AnyFunSuite with SparkSpec {

  test("priority 0-10 maps to the three pools like the reference's bands") {
    assert((7 to 10).forall(Scheduling.poolFor(_) == "high"), "cron-style high")
    assert((3 to 6).forall(Scheduling.poolFor(_) == "default"))
    assert((0 to 2).forall(Scheduling.poolFor(_) == "low"))
  }

  test("withPriority routes jobs to the pool and restores the previous one") {
    val sc = spark.sparkContext
    sc.setLocalProperty("spark.scheduler.pool", null)
    val seen = Scheduling.withPriority(spark, 9) {
      // a real job runs under the pool
      assert(spark.range(1000).count() == 1000L)
      sc.getLocalProperty("spark.scheduler.pool")
    }
    assert(seen == "high")
    assert(sc.getLocalProperty("spark.scheduler.pool") == null, "restored")

    // nesting restores the outer pool, not null
    Scheduling.withPriority(spark, 8) {
      Scheduling.withPriority(spark, 0) {
        assert(sc.getLocalProperty("spark.scheduler.pool") == "low")
      }
      assert(sc.getLocalProperty("spark.scheduler.pool") == "high")
    }
  }

  test("allocation file is valid XML with weighted pools and parses by Spark's shape") {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    val doc = f.newDocumentBuilder().parse(
      new java.io.ByteArrayInputStream(Scheduling.allocationXml.getBytes("UTF-8")))
    val pools = doc.getElementsByTagName("pool")
    assert(pools.getLength == 3)
    val names = (0 until 3).map(i =>
      pools.item(i).getAttributes.getNamedItem("name").getNodeValue).toSet
    assert(names == Set("high", "default", "low"))
    val cfg = Scheduling.fairSessionConfigs()
    assert(cfg("spark.scheduler.mode") == "FAIR")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(cfg("spark.scheduler.allocation.file"))))
  }
}
