package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup-family throughput at corpus scale — the companion large-run to
  * `BootstrapBench` for the LLM-pipeline side of the engine. Dedup is the
  * headline operation of a 100 TB training-data pipeline; the sf0.1 bench
  * exercises it at 5k documents, which says nothing about the shuffle
  * behavior that decides whether MinHash-LSH survives a real corpus. This
  * run synthesizes millions of documents with PLANTED duplicates, runs the
  * production dedup shapes end-to-end, and reports throughput AND recall
  * of the planted structure — a speed number without a quality number
  * would be meaningless here.
  *
  * Corpus design (deterministic in doc_id; re-runs are byte-identical):
  *  - ~120 words per document drawn from a 50k-word synthetic vocabulary
  *    via the portable 64-bit hash (so text ≈ 800 B/doc — n documents ≈
  *    n × 0.8 KB of text);
  *  - 4 % exact duplicates: doc i with i % 25 == 1 repeats the text of
  *    doc i - 1 verbatim;
  *  - 4 % near duplicates: doc i with i % 25 == 13 copies doc i - 1 and
  *    rewrites every 40th word (3 of 120 words; each rewrite kills ≤ 5
  *    of the 116 5-gram shingles → shingle Jaccard ≈ 0.77, giving the
  *    4-band × 2-row LSH an expected ≈ 0.97 recall — measured below,
  *    not assumed).
  *
  * Timed stages (each its own wall-clock + docs/sec):
  *  1. exact    — full-text hash groupBy, dup groups + members
  *     (dd_exact_dedup's shape);
  *  2. minhash  — 8 minhashes per doc from the 5-gram shingle hashes,
  *     4 × 2 banded candidates by equi-join, pairs deduped
  *     (dd_minhash_lsh's shape, shared TextHashes primitives);
  *  3. verify   — recall: the fraction of planted pairs (exact + near)
  *     the banded candidates contain. Exactness argument: an exact dup
  *     shares all minhashes, so recall of planted exact pairs must be
  *     1.0 — anything less is a bug, not tuning.
  *
  * Row count via SPARK_GRAFT_DEDUP_ROWS (default 1,000,000 ≈ 0.8 GB of
  * text); SPARK_GRAFT_DEDUP_DIR for the workdir.
  */
object DedupBench {

  /** Deterministic word: vocab index from the portable hash family. */
  private def wordCol(seed: org.apache.spark.sql.Column) =
    concat(lit("w"), pmod(xxhash64(seed), lit(50000L)).cast("string"))

  def syntheticDocs(spark: SparkSession, n: Long): DataFrame = {
    // base text for every doc id: 120 words keyed (id, position); exact
    // and near dups re-derive from the PREDECESSOR id so the generator
    // stays a pure map (no self-join): base(i-1) recomputes in place.
    def textOf(id: org.apache.spark.sql.Column, mutate: Boolean,
        nWords: Int = 120) = {
      val words = transform(sequence(lit(0), lit(nWords - 1)), i => {
        val w = wordCol(concat_ws(":", id.cast("string"), i.cast("string")))
        if (mutate)
          when(i % 40 === 7,
            concat(lit("m"), wordCol(concat_ws(";", id.cast("string"), i.cast("string")))))
            .otherwise(w)
        else w
      })
      array_join(words, " ")
    }
    spark.range(n).toDF("doc_id")
      .withColumn("role",
        when(col("doc_id") % 25 === 1 && col("doc_id") > 0, lit("exact_dup"))
          .when(col("doc_id") % 25 === 13, lit("near_dup"))
          // 4 % truncated-prefix copies (first 60 of the predecessor's 120
          // words): shingle-contained in the predecessor but Jaccard ≈ 0.49
          // — the asymmetric case the symmetric families miss BY DESIGN,
          // planted for the containment stage's recall check
          .when(col("doc_id") % 25 === 19 && col("doc_id") > 0, lit("contained"))
          .otherwise(lit("base")))
      .withColumn("text",
        when(col("role") === "exact_dup", textOf(col("doc_id") - 1, mutate = false))
          .when(col("role") === "near_dup", textOf(col("doc_id") - 1, mutate = true))
          .when(col("role") === "contained",
            textOf(col("doc_id") - 1, mutate = false, nWords = 60))
          .otherwise(textOf(col("doc_id"), mutate = false)))
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_DEDUP_ROWS", "1000000").toLong
    val work = sys.env.getOrElse("SPARK_GRAFT_DEDUP_DIR", "target/dedup-bench")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-dedup-bench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = s"$work/docs"
    val p = new org.apache.hadoop.fs.Path(work)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)

    def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    // fixture (untimed): write the corpus to parquet so every stage reads
    // from storage like a real pipeline pass, not from a cached plan
    val tFix = System.nanoTime()
    val parts = math.max(32, (n / 250000L).toInt)
    syntheticDocs(spark, n).repartition(parts, col("doc_id"))
      .write.mode("overwrite").parquet(dir)
    val fixtureS = secs(tFix)

    val docs = spark.read.parquet(dir)

    // ── stage 1: exact dedup (dd_exact_dedup shape) ────────────────────
    val tEx = System.nanoTime()
    val exactGroups = docs
      .select(col("doc_id"), xxhash64(col("text")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("members"), min(col("doc_id")).as("canonical"))
      .filter(col("members") > 1)
    val (exGroups, exMembers) = {
      val r = exactGroups.agg(count(lit(1)), sum(col("members"))).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val exactS = secs(tEx)

    // ── stage 2: minhash-LSH candidate pairs (dd_minhash_lsh shape) ────
    val tMh = System.nanoTime()
    val Mersenne31 = graft.functions.PortableHash.Mersenne31
    val fp = docs.select(col("doc_id"),
        graft.functions.TextHashes.minhashesUdf(8)(col("text")).as("mh"))
    val bands = fp.select(col("doc_id"),
        explode(array((0 until 4).map(k => struct(
          lit(k).as("band_idx"),
          (element_at(col("mh"), 2 * k + 1) * Mersenne31 +
            element_at(col("mh"), 2 * k + 2)).as("band_val"))): _*)).as("b"))
      .select(col("doc_id"), col("b.band_idx").as("band_idx"), col("b.band_val").as("band_val"))
    val pairs = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .cache()
    val nPairs = pairs.count()
    val minhashS = secs(tMh)

    // ── stage 3: planted-structure recall ──────────────────────────────
    val tVer = System.nanoTime()
    val planted = docs.filter(col("role") =!= "base")
      .select((col("doc_id") - 1).as("doc_a"), col("doc_id").as("doc_b"), col("role"))
    val found = planted.join(pairs, Seq("doc_a", "doc_b"), "left_semi")
      .groupBy(col("role")).agg(count(lit(1)).as("found"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = planted.groupBy(col("role")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val verifyS = secs(tVer)
    pairs.unpersist()

    def recall(role: String): Double =
      found.getOrElse(role, 0L).toDouble / math.max(total.getOrElse(role, 0L), 1L)
    val exactRecall = recall("exact_dup")
    val nearRecall = recall("near_dup")

    // ── stage 4: content-defined chunking (dd_cdc_chunks shape) ────────
    // chunk-store dedup ratio over the whole corpus, plus the planted-
    // pair chunk containment that demonstrates WHY CDC: a mutation
    // damages only the chunks containing it, so near-dup predecessors
    // keep most chunks shared while every fixed-offset window past the
    // edit would differ. Exact-dup containment must be exactly 1.0 (same
    // text → same boundaries → same chunks) — an invariant, not tuning.
    val tCdc = System.nanoTime()
    val chunks = docs
      .select(col("doc_id"), explode(graft.catalog.DedupCatalog.cdcChunks(col("text"))).as("c"))
      .select(col("doc_id"), col("c.h").as("h"), col("c.l").as("l"))
    val chunkStats = chunks
      .groupBy(col("h")).agg(min(col("l")).as("l"), count(lit(1)).as("occ"))
      .agg(count(lit(1)).as("n_chunks"), sum(col("l") * col("occ")).as("raw_bytes"),
        sum(col("l")).as("stored_bytes"))
      .collect()(0)
    val (nChunks, rawBytes, storedBytes) =
      (chunkStats.getLong(0), chunkStats.getLong(1), chunkStats.getLong(2))
    val cdcS = secs(tCdc)

    val tCont = System.nanoTime()
    val plIds = planted.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id")).distinct()
    val arr = chunks.join(plIds, Seq("doc_id"), "left_semi")
      .groupBy(col("doc_id")).agg(collect_list(col("h")).as("hs"))
    val contByRole = planted
      .join(arr.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), Seq("doc_a"))
      .join(arr.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), Seq("doc_b"))
      .select(col("role"),
        (size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") /
          size(array_distinct(col("hs_a"))).cast("double")).as("cont"))
      .groupBy(col("role")).agg(avg(col("cont")).as("avg"), min(col("cont")).as("min"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val cdcContS = secs(tCont)
    val (exactCont, nearCont) = (
      contByRole.getOrElse("exact_dup", (0.0, 0.0)),
      contByRole.getOrElse("near_dup", (0.0, 0.0)))

    // ── stage 5: containment join (dd_containment shape) ───────────────
    // the planted truncated-prefix docs are shingle-CONTAINED in their
    // predecessors (C = 1.0) while their Jaccard ≈ 0.49 sits under every
    // symmetric threshold — exactly the asymmetric case this operator
    // exists for. Recall of the planted containment pairs must be
    // EXACTLY 1.0: the asymmetric prefix filter's recall proof (plus the
    // float-boundary slack) is an invariant, not a tuned number.
    val tCj = System.nanoTime()
    // cached: containmentPairs consumes the shingle sets ~4 times (probe
    // + index postings, two verify join-backs) — uncached, the 2M-row
    // windowHashes UDF pass would recompute per consumer (the catalog
    // path caches this frame too; the bench must bench the shipped shape)
    val shingleSets = docs.select(col("doc_id"),
      graft.functions.TextHashes.windowHashesUdf(3, distinct = true)(col("text")).as("sh"))
      .cache()
    val cpairs = graft.catalog.DedupCatalog
      .containmentPairs(shingleSets, threshold = 0.8,
        dfCap = math.max(100L, n / 50))
      .select(col("doc_a"), col("doc_b"))
      .cache()
    val nContPairs = cpairs.count()
    val contJoinS = secs(tCj)
    val tCr = System.nanoTime()
    val plantedCont = docs.filter(col("role") === "contained")
      .select(col("doc_id").as("doc_a"), (col("doc_id") - 1).as("doc_b"))
    val totCont = plantedCont.count()
    val foundCont = plantedCont.join(cpairs, Seq("doc_a", "doc_b"), "left_semi").count()
    cpairs.unpersist()
    shingleSets.unpersist()
    val contRecallS = secs(tCr)
    val contRecall = foundCont.toDouble / math.max(totCont, 1L)

    // ── stage 6: edit-distance verify (dd_edit_pairs shape) ────────────
    // banded 60-bit simhash candidates → compiled bounded-Levenshtein
    // verify at sim ≥ 0.75. Two planted invariants: every exact-dup pair
    // must verify at distance 0 (identical text → identical fingerprint
    // → hamming-0 candidate), and near-dup recall reports how many
    // 3-word rewrites survive BOTH the simhash bands and the edit gate —
    // the honest compound number for this candidate path.
    val tEd = System.nanoTime()
    val fps = docs.select(col("doc_id"),
      org.apache.spark.sql.graftnative.NativeExpressions
        .simhash60Col(col("text")).as("fp"))
    val etexts = docs.select(col("doc_id"), col("text"))
    val epairs = graft.catalog.DedupCatalog
      .bandedHammingPairs(fps, maxHamming = 6)
      .select(col("doc_a"), col("doc_b"))
      .repartition(cpus.toInt * 4, col("doc_a"), col("doc_b"))
      .join(etexts.select(col("doc_id").as("doc_a"), col("text").as("ta")), Seq("doc_a"))
      .join(etexts.select(col("doc_id").as("doc_b"), col("text").as("tb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        graft.functions.TextHashes.boundedLevUdf(col("ta"), col("tb"),
          (floor(lit(0.25) * greatest(length(col("ta")), length(col("tb"))))
            .cast("int") + 1)).cast("long").as("edit_dist"),
        greatest(length(col("ta")), length(col("tb"))).cast("double").as("__len"))
      .filter(col("edit_dist") >= 0 &&
        lit(1.0) - col("edit_dist").cast("double") / col("__len") >= 0.75)
      .select(col("doc_a"), col("doc_b"), col("edit_dist"))
      .cache()
    val nEditPairs = epairs.count()
    val editS = secs(tEd)
    val tEr = System.nanoTime()
    val plantedEx = docs.filter(col("role") === "exact_dup")
      .select((col("doc_id") - 1).as("doc_a"), col("doc_id").as("doc_b"))
    val totEx = plantedEx.count()
    val foundExZero = plantedEx
      .join(epairs.filter(col("edit_dist") === 0), Seq("doc_a", "doc_b"), "left_semi")
      .count()
    val plantedNe = docs.filter(col("role") === "near_dup")
      .select((col("doc_id") - 1).as("doc_a"), col("doc_id").as("doc_b"))
    val totNe = plantedNe.count()
    val foundNe = plantedNe.join(epairs, Seq("doc_a", "doc_b"), "left_semi").count()
    epairs.unpersist()
    val editRecallS = secs(tEr)
    val editExactRecall = foundExZero.toDouble / math.max(totEx, 1L)
    val editNearRecall = foundNe.toDouble / math.max(totNe, 1L)

    val totalS = exactS + minhashS + verifyS + cdcS + cdcContS +
      contJoinS + contRecallS + editS + editRecallS
    println(s"""{"metric":"dedup_docs_per_sec","value":${(n / totalS).round},""" +
      s""""rows":$n,"fixture_sec":${f"$fixtureS%.1f"},""" +
      s""""exact_sec":${f"$exactS%.1f"},"exact_dup_groups":$exGroups,"exact_dup_members":$exMembers,""" +
      s""""minhash_sec":${f"$minhashS%.1f"},"candidate_pairs":$nPairs,""" +
      s""""verify_sec":${f"$verifyS%.1f"},""" +
      s""""exact_recall":$exactRecall,"near_recall":$nearRecall,""" +
      s""""cdc_sec":${f"$cdcS%.1f"},"cdc_chunks":$nChunks,""" +
      s""""cdc_raw_bytes":$rawBytes,"cdc_stored_bytes":$storedBytes,""" +
      s""""cdc_dedup_ratio":${f"${rawBytes.toDouble / math.max(storedBytes, 1L)}%.4f"},""" +
      s""""cdc_verify_sec":${f"$cdcContS%.1f"},""" +
      s""""cdc_exact_containment":${f"${exactCont._1}%.4f"},""" +
      s""""cdc_near_containment_avg":${f"${nearCont._1}%.4f"},""" +
      s""""cdc_near_containment_min":${f"${nearCont._2}%.4f"},""" +
      s""""containment_sec":${f"$contJoinS%.1f"},"containment_pairs":$nContPairs,""" +
      s""""containment_verify_sec":${f"$contRecallS%.1f"},""" +
      s""""containment_planted":$totCont,"containment_recall":$contRecall,""" +
      s""""edit_sec":${f"$editS%.1f"},"edit_pairs":$nEditPairs,""" +
      s""""edit_verify_sec":${f"$editRecallS%.1f"},""" +
      s""""edit_exact_recall":${f"$editExactRecall%.4f"},""" +
      s""""edit_near_recall":${f"$editNearRecall%.4f"}}""")
    spark.stop()
  }
}
