package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.catalog.DedupCatalog

/** Property tests for the capped containment candidate generator against
  * driver-side brute force, on random corpora with a SMALL shingle
  * alphabet (so over-cap "stop shingles" arise naturally and the df-cap
  * actually bites). Two contracts:
  *  1. soundness: every emitted pair really has C(A,B) ≥ t (the verify is
  *     exact, so this should be unconditional);
  *  2. the bounded-loss contract: a qualifying pair may be missing ONLY
  *     when the probe doc violates the zero-loss condition — fewer than
  *     ⌊(1−t)|A|⌋+2 of its shingles under the cap (a hot-saturated
  *     probe). With the cap off, recall must be exact everywhere.
  * Trials are few but each corpus is adversarial by construction: a
  * 12-symbol alphabet over 20-40 docs makes most shingles over-cap. */
class ContainmentPropSpec extends AnyFunSuite with SparkSpec {

  private val t = 0.8

  private def brute(docs: Seq[(Long, Seq[String])]): Set[(Long, Long)] =
    (for {
      (ia, sa) <- docs; (ib, sb) <- docs
      if ia != ib && sa.toSet.intersect(sb.toSet).size.toDouble / sa.size >= t
    } yield (ia, ib)).toSet

  test("capped containment is sound, exact under the zero-loss condition, " +
    "and exact with the cap off — random hot-shingle corpora") {
    import spark.implicits._
    val alphabet = (1 to 12).map(i => s"s$i")
    val genDocs: Gen[Seq[(Long, Seq[String])]] = for {
      n <- Gen.choose(8, 24)
      docs <- Gen.sequence[Seq[(Long, Seq[String])], (Long, Seq[String])](
        (1 to n).map { i =>
          for {
            len <- Gen.choose(2, 8)
            sh <- Gen.pick(len, alphabet)
          } yield (i.toLong, sh.toSeq.sorted)
        })
    } yield docs

    val prop = Prop.forAll(genDocs) { docsSeq =>
      val dfCap = 4L
      val df = docsSeq.toDF("doc_id", "sh")
      val want = brute(docsSeq)
      val got = DedupCatalog.containmentPairs(df, threshold = t, dfCap = dfCap)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val uncapped = DedupCatalog.containmentPairs(df, threshold = t)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // global df per shingle, for the zero-loss condition
      val allSh = docsSeq.flatMap { case (_, sh) => sh.distinct }
      val dfMap = allSh.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val byId = docsSeq.toMap
      def coldEnough(a: Long): Boolean = {
        val sh = byId(a)
        val prefixLen = math.floor((1.0 - t) * sh.size).toInt + 2
        sh.count(s => dfMap(s) <= dfCap) >= prefixLen
      }
      val lost = want -- got
      val sound = got.subsetOf(want)           // exact verify: no false pairs
      val uncappedExact = uncapped == want     // cap off ⇒ recall exact
      // every loss has a hot-saturated probe (the documented bounded case)
      val lossBounded = lost.forall { case (a, _) => !coldEnough(a) }
      sound && uncappedExact && lossBounded
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10).withWorkers(1), prop)
    assert(res.passed, s"containment property failed: ${res.status}")
  }

  // The oracle gate runs dd_containment's EXACT brute-force SQL against the
  // df-capped plan. That compare is only guaranteed green under the
  // zero-loss condition (every doc has ≥ ⌊(1−t)|A|⌋+2 sub-cap shingles).
  // Assert the condition ON THE GATE FIXTURES so the green is a checked
  // invariant: if a future fixture breaks it, THIS test goes red with a
  // targeted message instead of the oracle compare going red mysteriously.
  test("gate fixtures satisfy the containment zero-loss condition") {
    import org.apache.spark.sql.functions._
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = graft.Tables.documents(spark, sf)
        .select(col("doc_id"),
          graft.functions.TextHashes.windowHashesUdf(3, distinct = true)(col("text")).as("sh"))
        .cache()
      val dfCap = math.max(100L, docs.count() / 50) // the catalog's default
      val dfs = docs.select(explode(col("sh")).as("s"))
        .groupBy(col("s")).agg(count(lit(1)).as("df"))
      val violating = docs
        .select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("s"))
        .join(dfs, Seq("s"))
        .groupBy(col("doc_id"), col("n"))
        .agg(sum(when(col("df") <= dfCap, 1L).otherwise(0L)).as("cold"))
        .filter(col("cold") < floor((lit(1.0) - lit(t)) * col("n")) + 2)
        .count()
      docs.unpersist()
      assert(violating == 0L,
        s"$sf: $violating docs are hot-saturated — dd_containment's exact " +
          "oracle is no longer guaranteed; expect bounded-loss divergence " +
          "(see the contract note at the oracle entry), not a plan bug")
    }
  }
}
