package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.PortableHash

/** ANN-family throughput and recall at corpus scale — 1M vectors.
  *
  * The sf0.1 catalog exercises the similarity family at 5k vectors, which
  * says nothing about whether IVF actually BUYS anything once the corpus
  * is large: the whole point of the cell index is that a probe scans
  * nprobe/C of the corpus instead of all of it, and that only shows at
  * scale. This bench synthesizes a clustered vector corpus with planted
  * structure, trains the coarse quantizer with the SAME Lloyd-step shape
  * the catalog ships (`sim_kmeans_train`), builds the cell index, runs
  * the query set at several nprobe settings, and reports recall@10
  * against the exact brute-force answer plus the measured speedup — a
  * speed number without its quality number is meaningless for ANN.
  *
  * Corpus design (deterministic, no RNG): C true centers with coordinates
  * from the portable hash family in [-1, 1]; vector i = center(i mod C) +
  * hash noise in [-0.1, 0.1] per dim. Queries are held-out perturbations
  * of the same centers (different salt), so each query's true neighbors
  * concentrate in one planted cluster — exactly the regime IVF exists
  * for. K-means initializes from an 8-hyperplane sign LSH of the raw
  * vectors (the realistic coarse init — correlated with location, no
  * oracle knowledge of the planted cells).
  *
  * 100 TB reading: the corpus never broadcasts and never pairs with
  * itself — training cost is rounds × (corpus × C) map-side distance
  * evals, search cost is the candidate equi-join on the cell id. Both
  * divide by executor count; the only corpus-sized shuffles are the
  * per-round centroid aggregations (map-side combined, C × dim rows out).
  */
object SimilarityBench {

  private val Dim = 32

  /** hash(salt:a:b) → double in [-scale, scale], as a column expr. */
  private def h(salt: String, a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column, scale: Double) =
    (PortableHash.hash64(concat_ws(":", lit(salt), a.cast("string"), b.cast("string")))
      % 2001L - 1000L).cast("double") / lit(1000.0 / scale)

  def syntheticVecs(spark: SparkSession, n: Long, cells: Int): DataFrame =
    spark.range(n).toDF("vec_id")
      .withColumn("true_cell", col("vec_id") % cells)
      .withColumn("v", transform(sequence(lit(0), lit(Dim - 1)), k =>
        h("c", col("true_cell"), k, 1.0) + h("n", col("vec_id"), k, 0.1)))
      .drop("true_cell")

  def syntheticQueries(spark: SparkSession, nq: Int, cells: Int): DataFrame =
    spark.range(nq).toDF("query_id")
      .withColumn("qcell", col("query_id") % cells)
      .withColumn("qv", transform(sequence(lit(0), lit(Dim - 1)), k =>
        h("c", col("qcell"), k, 1.0) + h("q", col("query_id"), k, 0.1)))
      .drop("qcell")

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_ANN_ROWS", "1000000").toLong
    val cells = sys.env.getOrElse("SPARK_GRAFT_ANN_CELLS", "256").toInt
    val nq = 64
    val topK = 10
    val work = sys.env.getOrElse("SPARK_GRAFT_ANN_DIR", "target/ann-bench")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-ann-bench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.graftnative.NativeExpressions.dotCol

    val p = new org.apache.hadoop.fs.Path(work)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    // fixture (untimed): to parquet, like a real embedding table
    val dir = s"$work/vecs"
    val tFix = System.nanoTime()
    syntheticVecs(spark, n, cells)
      .repartition(math.max(32, (n / 125000L).toInt), col("vec_id"))
      .write.mode("overwrite").parquet(dir)
    val fixtureS = secs(tFix)
    val corpus = spark.read.parquet(dir)
    val queries = syntheticQueries(spark, nq, cells).cache()
    queries.count()

    // ── stage 1: coarse-quantizer training, the sim_kmeans_train shape.
    // Init = 8-hyperplane sign LSH over the raw vector (hyperplane
    // coefficients from the hash family — no knowledge of planted cells;
    // 256 signature buckets, relabeled to 0..C-1). ──
    val tTrain = System.nanoTime()
    val planes = (0 until 8).map { b =>
      val coef = transform(sequence(lit(0), lit(Dim - 1)), k =>
        when(PortableHash.hash64(concat_ws(":", lit("p"), lit(b), k.cast("string")))
          % 2 === 0, 1.0).otherwise(-1.0))
      when(dotCol(col("v"), coef) > 0, 1L << b).otherwise(0L)
    }.reduce(_ + _)
    var state = corpus.withColumn("label", planes % cells)
      .select(col("vec_id"), col("v"), col("label"))
    // The handle that actually holds the previous round's cache: `state` is
    // a PROJECTION of the cached `assigned`, so unpersisting it is a no-op
    // (r9 advice) — we must unpersist the cached frame itself.
    var prevCached: DataFrame = null
    val roundStats = (1 to 3).map { r =>
      val cent = state
        .select(col("label").as("clabel"), posexplode(col("v")).as(Seq("i", "x")))
        .groupBy(col("clabel"), col("i")).agg(avg(col("x")).as("m"))
        .groupBy(col("clabel"))
        .agg(transform(array_sort(collect_list(struct(col("i"), col("m")))),
          q => q("m")).as("c"))
        .withColumn("cnorm2", dotCol(col("c"), col("c")))
      val w = Window.partitionBy(col("vec_id")).orderBy(col("dist2"), col("clabel"))
      val assigned = state
        .withColumn("vnorm2", dotCol(col("v"), col("v")))
        .crossJoin(broadcast(cent))
        .select(col("vec_id"), col("v"), col("label").as("old_label"), col("clabel"),
          (col("vnorm2") - lit(2.0) * dotCol(col("v"), col("c")) + col("cnorm2"))
            .as("dist2"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("vec_id"), col("v"), col("clabel").as("label"), col("dist2"),
          col("old_label"))
        .cache()
      val agg = assigned
        .agg(sum(col("dist2")).as("inertia"),
          sum(when(col("label") =!= col("old_label"), 1L).otherwise(0L)).as("moved"))
        .collect().head
      // agg.collect() above materialized this round's `assigned` cache, so
      // the previous round's cached frame can be freed now.
      if (prevCached != null) prevCached.unpersist()
      prevCached = assigned
      state = assigned.select(col("vec_id"), col("v"), col("label"))
      (r, agg.getDouble(0), agg.getLong(1))
    }
    val index = state.cache()
    val indexedN = index.count()
    if (prevCached != null) prevCached.unpersist()
    val trainS = secs(tTrain)

    // trained centroids + norms, broadcast-sized (C × dim)
    val centroids = index
      .select(col("label").as("cell"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("cell"), col("i")).agg(avg(col("x")).as("m"))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("m")))),
        q => q("m")).as("c"))
      .withColumn("cnorm2", dotCol(col("c"), col("c")))
      .cache()
    centroids.count()

    // ── stage 2: exact truth — brute-force top-10 per query (the cost
    // this index exists to avoid; timed as the baseline) ──
    val tBrute = System.nanoTime()
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    def cosExpr = dotCol(col("qv"), col("v")) /
      (sqrt(dotCol(col("qv"), col("qv"))) * sqrt(dotCol(col("v"), col("v"))))
    val truth = corpus.crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"), cosExpr.as("cos_sim"))
      .withColumn("rank", row_number().over(wq)).filter(col("rank") <= topK)
      .select(col("query_id"), col("vec_id")).cache()
    val truthN = truth.count()
    val bruteS = secs(tBrute)

    // ── stage 3: IVF search at nprobe ∈ {4, 8, 16} ──
    val results = Seq(4, 8, 16).map { nprobe =>
      val tS = System.nanoTime()
      val wc = Window.partitionBy(col("query_id"))
        .orderBy(col("qdist2"), col("cell"))
      val probed = queries.crossJoin(broadcast(centroids))
        .select(col("query_id"), col("qv"), col("cell"),
          (dotCol(col("qv"), col("qv")) - lit(2.0) * dotCol(col("qv"), col("c")) +
            col("cnorm2")).as("qdist2"))
        .withColumn("rn", row_number().over(wc)).filter(col("rn") <= nprobe)
        .select(col("query_id"), col("qv"), col("cell"))
      val cand = index.withColumnRenamed("label", "cell")
        .join(probed, Seq("cell"))
      val got = cand
        .select(col("query_id"), col("vec_id"), cosExpr.as("cos_sim"))
        .withColumn("rank", row_number().over(wq)).filter(col("rank") <= topK)
        .select(col("query_id"), col("vec_id"))
      val hits = got.join(truth, Seq("query_id", "vec_id"), "left_semi").count()
      val searchS = secs(tS)
      val recall = hits.toDouble / truthN
      (nprobe, searchS, recall)
    }

    val stats = roundStats.map { case (r, in, mv) =>
      s"""{"iter":$r,"inertia":${f"$in%.1f"},"moved":$mv}"""
    }.mkString("[", ",", "]")
    val probeJson = results.map { case (np, sSec, rec) =>
      s""""nprobe$np":{"search_sec":${f"$sSec%.1f"},"recall":${f"$rec%.4f"},""" +
        s""""speedup":${f"${bruteS / sSec}%.1f"}}"""
    }.mkString(",")
    println(
      s"""{"metric":"ann_recall_at_$topK","rows":$indexedN,"cells":$cells,""" +
        s""""n_queries":$nq,"fixture_sec":${f"$fixtureS%.1f"},""" +
        s""""train_sec":${f"$trainS%.1f"},"rounds":$stats,""" +
        s""""bruteforce_sec":${f"$bruteS%.1f"},$probeJson}""")
    spark.stop()
  }
}
