package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe for Components.assign round count / per-round wall —
  * optimization-round measurement tool (not part of the driver surface).
  * Usage: runMain graft.CCProbe [sfDir] */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session
    spark.range(1000000L).selectExpr("sum(id)").collect()
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val out = SparkEntry.queries("dd_cluster_assign")(spark, sfDir).count()
      println(f"pass $i: dd_cluster_assign rows=$out ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.catalog.Catalog.unpersistAll(spark)
    }
    spark.stop()
  }
}
