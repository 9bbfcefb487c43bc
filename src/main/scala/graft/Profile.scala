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
    if (name == "x_simhash_steps") {
      import org.apache.spark.sql.functions._
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(s"step $label: ${(System.nanoTime() - t0) / 1e9}s"); r
      }
      val q = SparkEntry.queries
      t("simhash_only")(q("dd_simhash")(spark, sfDir).count())
      t("simhash_again")(q("dd_simhash")(spark, sfDir).count())
      val base = q("dd_simhash")(spark, sfDir)
        .select(col("doc_id"), col("simhash"),
          explode(array(
            struct(lit(0).as("half"), expr("simhash div 65536").as("half_val")),
            struct(lit(1).as("half"), (col("simhash") % 65536).as("half_val")))).as("band"))
        .select(col("doc_id"), col("simhash"),
          col("band.half").as("half"), col("band.half_val").as("half_val"))
      t("exploded_count")(base.count())
      val cached = base.cache()
      t("cache_build")(cached.count())
      t("join")(cached.as("a").join(cached.as("b"),
        col("a.half") === col("b.half") && col("a.half_val") === col("b.half_val") &&
          col("a.doc_id") < col("b.doc_id")).count())
      spark.stop()
      return
    }
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = df.count()
      println(s"run $i: rows=$n  ${(System.nanoTime() - t0) / 1e9}s")
    }
    spark.stop()
  }
}
