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
    if (name == "x_lenband_steps") {
      import org.apache.spark.sql.functions._
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(s"step $label: ${(System.nanoTime() - t0) / 1e9}s  -> $r"); r
      }
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id"), graft.functions.TextHashes.shingles3Udf(col("text")).as("sh"),
          expr("n_chars div 64").as("bucket"))
        .cache()
      val n = t("docs_count")(docs.count())
      val dfCap = math.max(100L, n / 50)
      val inv = docs.select(col("doc_id"), col("bucket"),
        size(col("sh")).as("setsize"), explode(col("sh")).as("s"))
      t("inv_count")(inv.count())
      val dfs = inv.groupBy(col("s")).agg(count(lit(1)).as("df"))
      t("dfs_count")(dfs.count())
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))
      val ranked = inv.join(dfs, Seq("s")).withColumn("rn", row_number().over(w))
      val beta = 0.5 / 1.5
      val prefixLen = greatest(
        col("setsize") - ceil(lit(beta) * col("setsize")) + 2, lit(1L))
      val postings = ranked
        .filter(col("rn") <= prefixLen && (col("df") <= dfCap || col("rn") <= 8))
        .select(col("doc_id"), col("bucket"), col("s"))
        .cache()
      t("postings_count")(postings.count())
      val cand = postings.as("a").join(postings.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
            abs(col("a.bucket") - col("b.bucket")) <= 1)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      t("cand_raw_count")(cand.count())
      val dcand = cand.distinct().cache()
      t("cand_distinct_count")(dcand.count())
      val dim = docs.select(col("doc_id"), col("sh"))
      val verified = dcand.join(dim.as("da"), col("doc_a") === col("da.doc_id"))
        .join(dim.as("db"), col("doc_b") === col("db.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          graft.functions.TextHashes.jaccardStringsUdf(col("da.sh"), col("db.sh")).as("jaccard"))
      t("verify_count")(verified.filter(col("jaccard") >= 0.5).count())
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
