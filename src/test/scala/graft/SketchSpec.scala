package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Invariants of the sketch operators beyond the value-level oracle:
  * the CMS one-sided error guarantee and the KMV small-set exactness —
  * the properties a user RELIES on, pinned independently of any one
  * fixture's values. */
class SketchSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("count-min estimate is a one-sided overestimate on every key") {
    val out = SparkEntry.queries("ev_cms_topk")(spark, sf).cache()
    val nKeys = Tables.events(spark, sf).select("user_id").na.drop().distinct().count()
    assert(out.count() == math.min(20L, nKeys), "top-20 capped by distinct keys")
    assert(out.filter(col("cms_est") < col("exact")).count() == 0,
      "CMS must never undercount — min over d bucket rows each ≥ true count")
    assert(out.filter(col("overestimate") =!=
      col("cms_est") - col("exact")).count() == 0)
    out.unpersist()
  }

  test("KMV is exact below k distinct values and within theory error above") {
    val out = SparkEntry.queries("dd_kmv_distinct")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nExact, kUsed, nEst) = (r.getAs[Long]("n_exact"),
        r.getAs[Long]("k_used"), r.getAs[Long]("n_est"))
      if (kUsed < 64)
        assert(nEst == nExact, s"small source must be exact: $r")
      else
        // σ ≈ 1/√(k−2) ≈ 12.7% at k=64; 5σ bound keeps the test about
        // the estimator being WIRED right, not about fixture luck
        assert(math.abs(nEst - nExact).toDouble / nExact < 0.65,
          s"estimate out of theoretical range: $r")
    }
  }

  test("KMV small-set exactness on a synthetic sub-k source") {
    import spark.implicits._
    // a corpus whose every source has < 64 distinct shingles must come
    // back exact through the full plan (the when-branch, not luck)
    val dir = java.nio.file.Files.createTempDirectory("graft_kmv").toString
    (1L to 30L).map(i => (i, s"alpha beta gamma delta epsilon zeta", "en", "tiny"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("dd_kmv_distinct")(spark, dir).collect()
    assert(r.length == 1 && r.head.getAs[Long]("n_exact") == 4L &&
      r.head.getAs[Long]("n_est") == 4L && r.head.getAs[Double]("rel_err") == 0.0,
      s"4 distinct 3-gram windows, exact: ${r.toSeq}")
  }
}
