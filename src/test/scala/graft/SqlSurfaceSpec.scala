package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.graftnative.NativeExpressions

/** The pure-SQL surface: a user who works in `spark.sql` (views + the
  * registered `graft_*` functions) gets byte-identical answers to the
  * DataFrame catalog — the API-parity story for SQL-first operators. */
class SqlSurfaceSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("dd_simhash and dd_exact_dedup are expressible in pure SQL via the " +
    "registered native functions, matching the catalog output") {
    NativeExpressions.register(spark)
    Tables.documents(spark, sf).createOrReplaceTempView("documents_v")

    val sqlSimhash = spark.sql(
      """SELECT doc_id, graft_simhash60(text) AS simhash
         FROM documents_v ORDER BY doc_id""").collect().toSeq
    val catalogSimhash = SparkEntry.queries("dd_simhash")(spark, sf)
      .collect().toSeq
    assert(sqlSimhash == catalogSimhash)

    // engine functions compose with plain SQL aggregation
    val sqlDedup = spark.sql(
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
         FROM documents_v GROUP BY graft_simhash60(text)
         HAVING count(*) > 1 ORDER BY keep_id""").collect()
    assert(sqlDedup.nonEmpty, "the synthetic corpus has planted duplicates")
    assert(sqlDedup.forall(_.getLong(1) >= 2))
  }

  test("graft_dot powers SQL-side cosine math identically to VectorOps") {
    NativeExpressions.register(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("embeddings_v")
    val rows = spark.sql(
      """SELECT vec_id,
           graft_dot(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>)) AS n2
         FROM embeddings_v ORDER BY vec_id LIMIT 5""").collect()
    val direct = Tables.embeddings(spark, sf)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        NativeExpressions.dotCol(
          org.apache.spark.sql.functions.col("embedding").cast("array<double>"),
          org.apache.spark.sql.functions.col("embedding").cast("array<double>")).as("n2"))
      .orderBy("vec_id").limit(5).collect()
    assert(rows.toSeq == direct.toSeq)
  }
}
