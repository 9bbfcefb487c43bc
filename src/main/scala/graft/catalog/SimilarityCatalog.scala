package graft.catalog

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Approximate-nearest-neighbor search over the embeddings table.
  *
  * Two tiers, matching how a 100 TB pipeline scales vector search:
  *  - brute force: broadcast the (small) query set against the full corpus —
  *    one pass, no shuffle of the corpus, exact results; the baseline.
  *  - IVF-style: restrict search to the query's coarse cell (`label` plays
  *    the role of a k-means cell assignment), turning O(N) per query into
  *    O(N / cells). Same shape as Faiss IVF probing with nprobe=1; on a
  *    cluster the corpus is bucketed by cell so a probe is a partition-local
  *    scan.
  */
object SimilarityCatalog extends Catalog {

  private def cosine(a: Column, b: Column): Column =
    graft.functions.VectorOps.cosineUdf(a, b)

  /** Corpus side with precomputed norms (one dot per candidate pair). */
  private def cosPrecomputed(qv: Column, qnorm: Column, v: Column, norm: Column): Column =
    round(graft.functions.VectorOps.dotUdf(qv, v) / (qnorm * norm), 6)

  private def dotSql(x: String, y: String) =
    s"list_sum(list_transform(generate_series(1, len($x)), i -> $x[i]::DOUBLE * $y[i]::DOUBLE))"

  private def cosineSql(a: String, b: String) =
    s"round(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})), 6)"

  private def vecs(s: SparkSession, d: String) =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))

  def queries: Map[String, QFn] = Map(

    // ── Brute-force top-k: broadcast queries × full corpus, rank per query ──
    "sim_ann_bruteforce" -> ((s, d) => {
      val corpus = vecs(s, d)
        .withColumn("norm", graft.functions.VectorOps.normUdf(col("v")))
      val qs = corpus.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("neighbor_id"))
      corpus.join(broadcast(qs), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          cosPrecomputed(col("qv"), col("qnorm"), col("v"), col("norm")).as("cos_sim"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // ── Hyperplane-LSH bucketed top-k: 8 deterministic ±1 hyperplanes
    // (coefficients from the portable hash family) give an 8-bit bucket
    // signature; candidates = same-bucket vectors, exact-cosine reranked.
    // The scale path when no cell assignment exists: one equi-join on the
    // signature, work ∝ bucket occupancy, identical math in the oracle. ──
    "sim_ann_lsh" -> ((s, d) => {
      val corpus = vecs(s, d)
        .withColumn("norm", graft.functions.VectorOps.normUdf(col("v")))
        .withColumn("sig", graft.functions.VectorOps.lshSigUdf8(col("v")))
        .cache()
      val qs = corpus.filter(col("vec_id") >= 20 && col("vec_id") < 25)
        .select(col("vec_id").as("query_id"), col("sig").as("qsig"),
          col("v").as("qv"), col("norm").as("qnorm"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("neighbor_id"))
      corpus.join(broadcast(qs),
          col("sig") === col("qsig") && col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          cosPrecomputed(col("qv"), col("qnorm"), col("v"), col("norm")).as("cos_sim"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .orderBy(col("query_id"), col("rank"))
    }),

    // ── IVF-style cell-restricted top-k: probe only the query's cell ──
    "sim_ann_ivf" -> ((s, d) => {
      val corpus = vecs(s, d)
        .withColumn("norm", graft.functions.VectorOps.normUdf(col("v")))
      val qs = corpus.filter(col("vec_id") >= 3 && col("vec_id") < 13)
        .select(col("vec_id").as("query_id"), col("label").as("qcell"),
          col("v").as("qv"), col("norm").as("qnorm"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("neighbor_id"))
      corpus.join(broadcast(qs),
          col("label") === col("qcell") && col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          cosPrecomputed(col("qv"), col("qnorm"), col("v"), col("norm")).as("cos_sim"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .orderBy(col("query_id"), col("rank"))
    })
  )

  /** DuckDB mirror of VectorOps.lshSig: same coefficients (portable hash
    * of "plane:dim"), same left-to-right double accumulation, same strict
    * sign test — bit-identical signatures. */
  private def lshSigSql(emb: String): String = {
    val planeTerms = (0 until 8).map { j =>
      val coef = s"(((('0x' || substr(md5(CAST($j AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)), 1, 15))::BIGINT % 2147483647) % 2) * 2 - 1)"
      s"CASE WHEN list_sum(list_transform(generate_series(1, len($emb)), i -> $emb[i]::DOUBLE * $coef)) > 0 THEN ${1 << j} ELSE 0 END"
    }
    s"CAST(${planeTerms.mkString("(", " + ", ")")} AS INT)"
  }

  def oracle: Map[String, String] = Map(
    "sim_ann_lsh" ->
      s"""WITH sigs AS (
           SELECT vec_id, embedding, ${lshSigSql("embedding")} AS sig FROM embeddings),
         q AS (SELECT vec_id AS query_id, sig AS qsig, embedding AS qv
             FROM sigs WHERE vec_id >= 20 AND vec_id < 25),
         p AS (SELECT q.query_id, e.vec_id AS neighbor_id,
             ${cosineSql("q.qv", "e.embedding")} AS cos_sim
           FROM sigs e JOIN q ON e.sig = q.qsig AND e.vec_id <> q.query_id)
         SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank FROM p) t
         WHERE rank <= 3 ORDER BY query_id, rank""",
    "sim_ann_bruteforce" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
         p AS (SELECT q.query_id, e.vec_id AS neighbor_id,
             ${cosineSql("q.qv", "e.embedding")} AS cos_sim
           FROM embeddings e JOIN q ON e.vec_id <> q.query_id)
         SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank FROM p) t
         WHERE rank <= 5 ORDER BY query_id, rank""",
    "sim_ann_ivf" ->
      s"""WITH q AS (SELECT vec_id AS query_id, label AS qcell, embedding AS qv
             FROM embeddings WHERE vec_id >= 3 AND vec_id < 13),
         p AS (SELECT q.query_id, e.vec_id AS neighbor_id,
             ${cosineSql("q.qv", "e.embedding")} AS cos_sim
           FROM embeddings e JOIN q ON e.label = q.qcell AND e.vec_id <> q.query_id)
         SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank FROM p) t
         WHERE rank <= 3 ORDER BY query_id, rank"""
  )
}
