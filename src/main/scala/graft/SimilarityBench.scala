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

  /** Correlated-subspace variant (SPARK_GRAFT_ANN_GEOM=correlated):
    * within each 4-dim PQ subspace the residual is one of 16 shared
    * patterns plus a ±0.01 jitter — the low-intrinsic-dimension
    * structure real embeddings carry (PCA energy concentration), which
    * is the regime product quantization is DESIGNED for (Jégou et al.
    * 2011 evaluate on SIFT/GIST, both strongly correlated). The default
    * iid corpus above is PQ's adversarial floor: its residual spends
    * equal energy in every direction, so 8 bits per 4-dim subspace
    * cannot resolve within-cell order. Benchmarking both pins the
    * operator's floor AND its intended regime. */
  def syntheticVecsCorrelated(spark: SparkSession, n: Long, cells: Int): DataFrame =
    spark.range(n).toDF("vec_id")
      .withColumn("true_cell", col("vec_id") % cells)
      .withColumn("v", transform(sequence(lit(0), lit(Dim - 1)), k => {
        val m = (k / 4) // PQ subspace of this coordinate
        // within-cell residual = a PRODUCT DICTIONARY: per subspace one
        // of 16 shared 4-dim atoms, chosen independently per vector
        // (16^8 ≈ 4.3B combinations — vectors stay unique). This is the
        // structure PQ assumes exactly (a product code over per-subspace
        // dictionaries): the codebook can represent every residual
        // losslessly, so the quantized ordering IS the exact ordering.
        // Real embeddings sit between this and the iid floor; the two
        // corpora bracket the operator.
        val z = pmod(PortableHash.hash64(concat_ws(":", lit("z"),
          col("vec_id").cast("string"), m.cast("string"))), lit(16L))
        h("c", col("true_cell"), k, 1.0) +
          h("pat", concat_ws("#", z.cast("string"), m.cast("string")), k, 0.1)
      }))
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
    val geom = sys.env.getOrElse("SPARK_GRAFT_ANN_GEOM", "iid")
    val dir = s"$work/vecs"
    val tFix = System.nanoTime()
    (if (geom == "correlated") syntheticVecsCorrelated(spark, n, cells)
     else syntheticVecs(spark, n, cells))
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
    // one hyperplane per label bit: 8 planes give only 256 signatures, so
    // a larger cell budget would silently collapse back to 256 populated
    // labels (and each "cell" would then mix several planted clusters)
    val nPlanes = math.max(8, (math.log(cells.toDouble) / math.log(2.0)).ceil.toInt)
    val planes = (0 until nPlanes).map { b =>
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

    // ── shared probe assignment for the compressed + filtered legs ──
    def probedCells(nprobe: Int): DataFrame = {
      val wc = Window.partitionBy(col("query_id"))
        .orderBy(col("qdist2"), col("cell"))
      queries.crossJoin(broadcast(centroids))
        .select(col("query_id"), col("qv"), col("cell"),
          (dotCol(col("qv"), col("qv")) - lit(2.0) * dotCol(col("qv"), col("c")) +
            col("cnorm2")).as("qdist2"))
        .withColumn("rn", row_number().over(wc)).filter(col("rn") <= nprobe)
        .select(col("query_id"), col("qv"), col("cell"))
    }
    def sqd(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      dotCol(a, a) - lit(2.0) * dotCol(a, b) + dotCol(b, b)
    def dirBytes(d: String): Long =
      fs.getContentSummary(new org.apache.hadoop.fs.Path(d)).getLength

    // ── stage 4: L2 exact truth — the baseline the compressed paths
    // approximate (PQ's ADC and SQ8's reconstruction are L2 estimators;
    // judging them against the cosine truth would mix metric error into
    // quantization error) ──
    val wL2 = Window.partitionBy(col("query_id")).orderBy(col("l2"), col("vec_id"))
    val tBrute2 = System.nanoTime()
    val truthL2 = corpus.crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"), sqd(col("qv"), col("v")).as("l2"))
      .withColumn("rank", row_number().over(wL2)).filter(col("rank") <= topK)
      .select(col("query_id"), col("vec_id")).cache()
    val truthL2N = truthL2.count()
    val bruteL2S = secs(tBrute2)

    // ── stage 5: SQ8 — per-dim min/max model (2×Dim values, a one-row
    // broadcast), codes stored as a 1-byte-per-dim table; search is a
    // FULL scan of reconstructed vectors. In a compute-bound local bench
    // the scan does the same distance work as brute force — the 4× win
    // is bytes scanned (recorded below), which is the production
    // bottleneck; recall is the near-lossless claim under test. ──
    val tSqTrain = System.nanoTime()
    val mm = corpus.select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("i")).agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .orderBy(col("i")).collect()
    val loC = typedLit(mm.map(_.getDouble(1)).toSeq)
    val hiC = typedLit(mm.map(_.getDouble(2)).toSeq)
    val sq8Dir = s"$work/sq8"
    corpus.select(col("vec_id"),
      transform(sequence(lit(0), lit(Dim - 1)), i =>
        round((element_at(col("v"), i + 1) - element_at(loC, i + 1)) /
          (element_at(hiC, i + 1) - element_at(loC, i + 1)) * 255.0).cast("int")).as("codes"))
      .write.mode("overwrite").parquet(sq8Dir)
    val sq8TrainS = secs(tSqTrain)
    val tSq = System.nanoTime()
    val rec8 = spark.read.parquet(sq8Dir).select(col("vec_id"),
      transform(sequence(lit(0), lit(Dim - 1)), i =>
        element_at(loC, i + 1) + element_at(col("codes"), i + 1).cast("double") /
          255.0 * (element_at(hiC, i + 1) - element_at(loC, i + 1))).as("rv"))
    val sqTop = rec8.crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"), sqd(col("qv"), col("rv")).as("l2"))
      .withColumn("rank", row_number().over(wL2)).filter(col("rank") <= topK)
      .select(col("query_id"), col("vec_id"))
    val sqHits = sqTop.join(truthL2, Seq("query_id", "vec_id"), "left_semi").count()
    val sq8S = secs(tSq)

    // ── stage 6: IVF-PQ with RESIDUAL encoding (Jégou et al. 2011, the
    // IVFADC design): PQ quantizes v − centroid(cell), not v — the
    // residual lives at the within-cell noise scale, which is exactly
    // the scale a same-cell top-10 ranking must resolve (quantizing raw
    // vectors was measured at recall 0.14 here: codeword resolution ~
    // cell radius, useless within a cell). M=8 subspaces × K=256
    // codewords; codebook = 256 hash-picked seed residuals refined by 2
    // Lloyd rounds per subspace over a ~1.6% hash sample. Codes: one
    // broadcast-codebook join + map-side argmin per (vector, subspace) —
    // the corpus's only wide row is 8 small ints, 32× narrower than the
    // raw doubles. Search: per-(query, probed-cell) LUT of codeword
    // distances to the QUERY residual, broadcast against the candidates'
    // codes; approx distance is a SUM of 8 table entries — the ADC scan
    // never touches raw floats. ──
    import spark.implicits._
    val tPqTrain = System.nanoTime()
    val Msub = 8; val dsub = Dim / Msub; val Kcb = 256
    val centC = centroids.select(col("cell").as("label"), col("c"))
    def residual(v: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =
      zip_with(v, c, (a, b) => a - b)
    val seedVs = index.join(broadcast(centC), Seq("label"))
      .orderBy(PortableHash.hash64(col("vec_id").cast("string")), col("vec_id"))
      .limit(Kcb).select(residual(col("v"), col("c")).as("rv"))
      .collect().map(_.getSeq[Double](0))
    require(seedVs.length >= Kcb,
      s"IVF-PQ needs at least $Kcb indexed vectors to seed a $Kcb-codeword " +
        s"codebook; got ${seedVs.length} — raise SPARK_GRAFT_ANN_ROWS")
    var cb = (for { m <- 0 until Msub; k <- 0 until Kcb }
      yield (m, k, seedVs(k).slice(m * dsub, (m + 1) * dsub))).toDF("m", "k", "cw")
    val subSample = index.filter(pmod(xxhash64(col("vec_id")), lit(61L)) === 0)
      .join(broadcast(centC), Seq("label"))
      .withColumn("rv", residual(col("v"), col("c")))
      .withColumn("m", explode(sequence(lit(0), lit(Msub - 1))))
      .select(col("vec_id"), col("m"),
        slice(col("rv"), col("m") * dsub + 1, lit(dsub)).as("sv"))
      .cache()
    (1 to 2).foreach { _ =>
      val best = subSample.join(broadcast(cb), Seq("m"))
        .select(col("vec_id"), col("m"), col("sv"),
          struct(sqd(col("sv"), col("cw")).as("d2"), col("k").as("k")).as("s"))
        .groupBy(col("vec_id"), col("m"))
        .agg(min(col("s")).as("best"), first(col("sv")).as("sv"))
      cb = best.select(col("m"), col("best.k").as("k"),
          posexplode(col("sv")).as(Seq("i", "x")))
        .groupBy(col("m"), col("k"), col("i")).agg(avg(col("x")).as("mu"))
        .groupBy(col("m"), col("k"))
        .agg(transform(array_sort(collect_list(struct(col("i"), col("mu")))),
          s => s("mu")).as("cw"))
        .cache()
      cb.count()
    }
    val pqDir = s"$work/pq"
    index.join(broadcast(centC), Seq("label"))
      .withColumn("rv", residual(col("v"), col("c")))
      .withColumn("m", explode(sequence(lit(0), lit(Msub - 1))))
      .select(col("vec_id"), col("label"), col("m"),
        slice(col("rv"), col("m") * dsub + 1, lit(dsub)).as("sv"))
      .join(broadcast(cb), Seq("m"))
      .select(col("vec_id"), col("label"), col("m"),
        struct(sqd(col("sv"), col("cw")).as("d2"), col("k").as("k")).as("s"))
      .groupBy(col("vec_id"), col("label"), col("m"))
      .agg(min(col("s")).as("best"))
      .select(col("vec_id"), col("label"), col("m"), col("best.k").as("k"))
      .groupBy(col("vec_id"), col("label"))
      .agg(transform(array_sort(collect_list(struct(col("m"), col("k")))),
        s => s("k")).as("codes"))
      .write.mode("overwrite").parquet(pqDir)
    val pqTrainS = secs(tPqTrain)

    // ── shared ANN building blocks: the composed stack (stage 8) runs
    // the SAME definitions as the isolated legs it claims to compose
    // (stage 6's ADC scorer, stage 7's adaptive walk) — one body each,
    // so a fix to either cannot silently diverge the measurements ──

    // adaptive budget: per query, widen past the 8-cell floor until the
    // probed cells hold at least this many QUALIFYING vectors — the
    // remedy for the fixed-nprobe recall decay under selective
    // predicates (r10 measured 0.8219 at 0.3 %): candidates stay ∝ the
    // budget, never ∝ corpus, and dense predicates never widen at all
    val adaptiveBudget = 100L * topK

    // occupancy-driven probe walk: per-cell QUALIFYING occupancy (one
    // map-side agg, ≤ C rows, broadcast) drives the per-query width —
    // keep the 8 nearest cells, widen in centroid-distance order until
    // cumulative qualifying occupancy reaches the budget
    def adaptiveProbes(
        pred: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
      val occ = index.filter(pred(col("vec_id")))
        .groupBy(col("label").as("cell")).agg(count(lit(1)).as("occ"))
      val wc = Window.partitionBy(col("query_id"))
        .orderBy(col("qdist2"), col("cell"))
      queries.crossJoin(broadcast(centroids))
        .select(col("query_id"), col("qv"), col("cell"),
          (dotCol(col("qv"), col("qv")) - lit(2.0) * dotCol(col("qv"), col("c")) +
            col("cnorm2")).as("qdist2"))
        .join(broadcast(occ), Seq("cell"), "left")
        .withColumn("occ", coalesce(col("occ"), lit(0L)))
        .withColumn("rn", row_number().over(wc))
        .withColumn("cum", sum(col("occ")).over(wc))
        .filter(col("rn") <= 8 ||
          (col("cum") - col("occ")) < lit(adaptiveBudget))
        .filter(col("occ") > 0)
        .select(col("query_id"), col("qv"), col("cell"))
    }

    // ADC scorer: the LUT is per (query, probed cell) — codeword
    // distances to the QUERY's residual against that cell's centroid,
    // nq × probes × M × K rows, corpus-independent, broadcast; the
    // corpus side contributes only (optionally predicate-filtered) PQ
    // codes, 8 small ints per vector
    def adcCandidates(probes: DataFrame,
        vecPred: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column])
        : DataFrame = {
      val lut = probes
        .join(broadcast(centroids.select(col("cell"), col("c"))), Seq("cell"))
        .withColumn("qres", residual(col("qv"), col("c")))
        .withColumn("m", explode(sequence(lit(0), lit(Msub - 1))))
        .select(col("query_id"), col("cell"), col("m"),
          slice(col("qres"), col("m") * dsub + 1, lit(dsub)).as("qsv"))
        .join(broadcast(cb), Seq("m"))
        .select(col("query_id"), col("cell"), col("m"), col("k"),
          sqd(col("qsv"), col("cw")).as("ld2"))
      val codes0 = spark.read.parquet(pqDir).withColumnRenamed("label", "cell")
      val codes = vecPred.fold(codes0)(p => codes0.filter(p(col("vec_id"))))
      codes
        .withColumn("m", explode(sequence(lit(0), lit(Msub - 1))))
        .select(col("cell"), col("vec_id"), col("m"),
          col("codes")(col("m")).as("k"))
        .join(broadcast(lut), Seq("cell", "m", "k"))
        .groupBy(col("query_id"), col("vec_id"))
        .agg(sum(col("ld2")).as("approx_d2"))
    }

    val tPqSearch = System.nanoTime()
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_d2"), col("vec_id"))
    // ADC shortlist: top-1000 by quantized distance (cached — both the
    // pure-ADC top-10 and the re-rank leg read it; 100x the final k, the
    // shortlist depth the IVFADC+R design runs at — ~3% of the ~31k
    // probed candidates per query)
    val pqCand = adcCandidates(probedCells(8), None)
      .withColumn("rank", row_number().over(wA)).filter(col("rank") <= 1000)
      .cache()
    pqCand.count()
    val candS = secs(tPqSearch)
    val tAdc = System.nanoTime()
    val pqTop = pqCand.filter(col("rank") <= topK)
      .select(col("query_id"), col("vec_id"))
    val pqHits = pqTop.join(truthL2, Seq("query_id", "vec_id"), "left_semi").count()
    val pqSearchS = candS + secs(tAdc)
    // re-rank (IVFADC+R, Jégou 2011 §VI): fetch the 100 shortlisted raw
    // vectors per query and order them by EXACT distance — the standard
    // production refinement; the corpus-wide scan still touched only
    // codes, the raw fetch is 100 rows/query
    val tRer = System.nanoTime()
    val rerTop = pqCand.select(col("query_id"), col("vec_id"))
      .join(index.select(col("vec_id"), col("v")), Seq("vec_id"))
      .join(broadcast(queries), Seq("query_id"))
      .select(col("query_id"), col("vec_id"), sqd(col("qv"), col("v")).as("l2"))
      .withColumn("rank", row_number().over(wL2)).filter(col("rank") <= topK)
      .select(col("query_id"), col("vec_id"))
    val rerHits = rerTop.join(truthL2, Seq("query_id", "vec_id"), "left_semi").count()
    val rerSearchS = candS + secs(tRer)
    pqCand.unpersist()

    // ── stage 7: filtered search at three selectivities — the predicate
    // rides INSIDE the candidate join (sim_ann_filtered's contract), so
    // the candidate set shrinks with qualifying bucket occupancy instead
    // of post-filtering a fixed-k result down to nothing. Truth is brute
    // force over the qualifying corpus at the same predicate. ──
    val probedQ8 = probedCells(8).cache()
    probedQ8.count()
    val filteredResults = Seq(10L, 100L, 1000L).map { mod =>
      def pred(c: org.apache.spark.sql.Column) = pmod(c, lit(mod)) < 3
      val truthF = corpus.filter(pred(col("vec_id"))).crossJoin(broadcast(queries))
        .select(col("query_id"), col("vec_id"), cosExpr.as("cos_sim"))
        .withColumn("rank", row_number().over(wq)).filter(col("rank") <= topK)
        .select(col("query_id"), col("vec_id")).cache()
      val truthFN = truthF.count()
      val tS = System.nanoTime()
      val candF = index.withColumnRenamed("label", "cell")
        .filter(pred(col("vec_id")))
        .join(probedQ8, Seq("cell"))
        .cache()
      val nCand = candF.count()
      val gotF = candF
        .select(col("query_id"), col("vec_id"), cosExpr.as("cos_sim"))
        .withColumn("rank", row_number().over(wq)).filter(col("rank") <= topK)
        .select(col("query_id"), col("vec_id"))
      val hitsF = gotF.join(truthF, Seq("query_id", "vec_id"), "left_semi").count()
      val fS = secs(tS)
      val recF = hitsF.toDouble / math.max(truthFN, 1L)
      candF.unpersist()

      // ── adaptive leg: the shared occupancy-driven walk (one
      // definition with the composed stack — see adaptiveProbes) ──
      val tA = System.nanoTime()
      val probedA = adaptiveProbes(pred).cache()
      val avgProbes = probedA.groupBy(col("query_id")).count()
        .agg(avg(col("count"))).collect().head.getDouble(0)
      val candA = index.withColumnRenamed("label", "cell")
        .filter(pred(col("vec_id")))
        .join(probedA, Seq("cell"))
        .cache()
      val nCandA = candA.count()
      val gotA = candA
        .select(col("query_id"), col("vec_id"), cosExpr.as("cos_sim"))
        .withColumn("rank", row_number().over(wq)).filter(col("rank") <= topK)
        .select(col("query_id"), col("vec_id"))
      val hitsA = gotA.join(truthF, Seq("query_id", "vec_id"), "left_semi").count()
      val aS = secs(tA)
      val recA = hitsA.toDouble / math.max(truthFN, 1L)
      truthF.unpersist(); candA.unpersist(); probedA.unpersist()
      (mod, nCand, recF, fS, nCandA, recA, aS, avgProbes)
    }

    // ── stage 8: the COMPOSED production stack at corpus scale — the
    // sim_ann_stack catalog row's topology at 1M vectors: trained IVF
    // (this run's cell count) + 32× PQ residual codes + a
    // 0.3%-selectivity attribute filter + occupancy-adaptive probes +
    // ADC shortlist + exact re-rank. The interaction under test (the r12
    // open question): at 0.3% selectivity the adaptive walk widens far
    // past the 8-cell floor to gather its qualifying-candidate budget,
    // and the PQ shortlist must still surface the true top-10 from those
    // ~budget candidates before the exact re-rank can recover them —
    // probe recall and shortlist depth interact only here, not in the
    // isolated legs. Scale shape: occupancy/probe list/LUT broadcast;
    // the corpus contributes qualifying PQ codes only (8 small ints per
    // vector at scan time); the raw-float fetch is shortlist-sized. ──
    def predS(c: org.apache.spark.sql.Column) = pmod(c, lit(1000L)) < 3
    val truthS = corpus.filter(predS(col("vec_id"))).crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"), sqd(col("qv"), col("v")).as("l2"))
      .withColumn("rank", row_number().over(wL2)).filter(col("rank") <= topK)
      .select(col("query_id"), col("vec_id")).cache()
    val truthSN = truthS.count()
    val tStack = System.nanoTime()
    // the composition IS the shared definitions: stage 7's adaptive walk
    // feeding stage 6's ADC scorer, predicate inside both
    val probedS = adaptiveProbes(predS).cache()
    val avgProbesS = probedS.groupBy(col("query_id")).count()
      .agg(avg(col("count"))).collect().head.getDouble(0)
    val candStack = adcCandidates(probedS, Some(predS)).cache()
    val nCandStack = candStack.count()
    val shortDepth = 10 * topK
    val shortS = candStack
      .withColumn("rank", row_number().over(wA)).filter(col("rank") <= shortDepth)
      .select(col("query_id"), col("vec_id"))
    val stackTop = shortS
      .join(index.select(col("vec_id"), col("v")), Seq("vec_id"))
      .join(broadcast(queries), Seq("query_id"))
      .select(col("query_id"), col("vec_id"), sqd(col("qv"), col("v")).as("l2"))
      .withColumn("rank", row_number().over(wL2)).filter(col("rank") <= topK)
      .select(col("query_id"), col("vec_id"))
    val stackHits = stackTop.join(truthS, Seq("query_id", "vec_id"), "left_semi").count()
    val stackSearchS = secs(tStack)
    val stackRecall = stackHits.toDouble / math.max(truthSN, 1L)
    candStack.unpersist(); probedS.unpersist(); truthS.unpersist()

    val stats = roundStats.map { case (r, in, mv) =>
      s"""{"iter":$r,"inertia":${f"$in%.1f"},"moved":$mv}"""
    }.mkString("[", ",", "]")
    val probeJson = results.map { case (np, sSec, rec) =>
      s""""nprobe$np":{"search_sec":${f"$sSec%.1f"},"recall":${f"$rec%.4f"},""" +
        s""""speedup":${f"${bruteS / sSec}%.1f"}}"""
    }.mkString(",")
    val filteredJson = filteredResults.map {
      case (mod, nc, rec, fSec, ncA, recA, aSec, avgP) =>
        s""""sel_${(300.0 / mod)}pct":{"candidates":$nc,""" +
          s""""recall":${f"$rec%.4f"},"search_sec":${f"$fSec%.1f"},""" +
          s""""adaptive":{"candidates":$ncA,"recall":${f"$recA%.4f"},""" +
          s""""search_sec":${f"$aSec%.1f"},"avg_probes":${f"$avgP%.1f"}}}"""
    }.mkString(",")
    println(
      s"""{"metric":"ann_recall_at_$topK","geom":"$geom","rows":$indexedN,"cells":$cells,""" +
        s""""n_queries":$nq,"fixture_sec":${f"$fixtureS%.1f"},""" +
        s""""train_sec":${f"$trainS%.1f"},"rounds":$stats,""" +
        s""""bruteforce_sec":${f"$bruteS%.1f"},$probeJson}""")
    println(
      s"""{"metric":"ann_compressed_at_$topK","geom":"$geom","rows":$indexedN,""" +
        s""""bruteforce_l2_sec":${f"$bruteL2S%.1f"},""" +
        s""""raw_bytes":${dirBytes(dir)},""" +
        s""""sq8":{"train_sec":${f"$sq8TrainS%.1f"},"bytes":${dirBytes(sq8Dir)},""" +
        s""""scan_sec":${f"$sq8S%.1f"},"recall":${f"${sqHits.toDouble / truthL2N}%.4f"}},""" +
        s""""ivfpq":{"train_sec":${f"$pqTrainS%.1f"},"bytes":${dirBytes(pqDir)},""" +
        s""""search_sec":${f"$pqSearchS%.1f"},""" +
        s""""speedup_vs_l2_brute":${f"${bruteL2S / pqSearchS}%.1f"},""" +
        s""""recall":${f"${pqHits.toDouble / truthL2N}%.4f"},""" +
        s""""rerank_search_sec":${f"$rerSearchS%.1f"},""" +
        s""""rerank_recall":${f"${rerHits.toDouble / truthL2N}%.4f"}},""" +
        s""""filtered":{$filteredJson}}""")
    println(
      s"""{"metric":"ann_stack_at_$topK","geom":"$geom","rows":$indexedN,""" +
        s""""cells":$cells,"n_queries":$nq,"selectivity_pct":0.3,""" +
        s""""compression_x":${Dim * 8 / Msub},""" +
        s""""adaptive_budget":$adaptiveBudget,""" +
        s""""avg_probes":${f"$avgProbesS%.1f"},""" +
        s""""avg_candidates":${f"${nCandStack.toDouble / nq}%.1f"},""" +
        s""""shortlist_depth":$shortDepth,""" +
        s""""search_sec":${f"$stackSearchS%.1f"},""" +
        s""""recall":${f"$stackRecall%.4f"}}""")
    spark.stop()
  }
}
