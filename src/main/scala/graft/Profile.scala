package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler: time one catalog query and dump its physical plan.
  * Usage: runMain graft.Profile <queryName> <sfDir> */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // time CONSTRUCTION separately: operators built on eager driver-side
    // steps (the Packing prefix-sum subtotal collect, Components' rounds)
    // do their real work inside fn(), which per-run timers would miss
    val tc = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(s"construct: ${(System.nanoTime() - tc) / 1e9}s")
    df.explain("formatted")
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = df.count()
      println(s"run $i: rows=$n  ${(System.nanoTime() - t0) / 1e9}s")
    }
    spark.stop()
  }
}
