package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.catalog.DedupCatalog

/** Candidate-generation recall of the length-banded Jaccard dedup —
  * specifically the mass-duplicate shape the df cap alone would lose. */
class DedupSpec extends AnyFunSuite with SparkSpec {

  private def docsOf(rows: Seq[(Long, Seq[String], Long)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "sh", "bucket")
  }

  test("a duplicate cluster larger than DfCap survives via the rarest-K floor") {
    // 30 identical docs: every one of their shingles has df = 30 > cap = 5.
    // Pure df-capping drops ALL their postings → the cluster vanishes,
    // the exact failure mode the floor exists for (identical docs share
    // identical rarest-K sets, so the floor always re-links them).
    val cluster = (1L to 30L).map(i =>
      (i, Seq("aa bb cc", "bb cc dd", "cc dd ee", "dd ee ff"), 1L))
    // plus two unrelated docs sharing nothing
    val noise = Seq(
      (100L, Seq("xx yy zz", "yy zz ww"), 1L),
      (101L, Seq("pp qq rr", "qq rr ss"), 1L))
    val docs = docsOf(cluster ++ noise)

    val pairs = DedupCatalog.lenbandJaccard(docs, threshold = 0.5,
      dfCap = 5, keepRarest = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.size == 30 * 29 / 2,
      "every pair of the 30-doc duplicate cluster is found despite df > cap")
    assert(!pairs.exists(p => p._1 >= 100 || p._2 >= 100), "no false pairs")

    // without the floor the cluster disappears — documenting the hole the
    // floor closes (ADVICE r2)
    val capped = DedupCatalog.lenbandJaccard(docs, threshold = 0.5,
      dfCap = 5, keepRarest = 0).count()
    assert(capped == 0, "df cap alone loses the whole cluster")
  }

  test("containment recall is exact at the threshold boundary and against " +
    "brute force, including the asymmetric small-in-large case") {
    import spark.implicits._
    val t = 0.8
    // doc 1 (10 shingles) has exactly 8 inside doc 2 → C(1→2) = 0.8, the
    // EXACT boundary that float-undercut prefix/size bounds dropped (the
    // sf0.1 regression this spec pins); C(2→1) = 8/8 = 1.0.
    // doc 3 ⊂ doc 4 with |3| = 3 ≪ |4| = 30 — the size-skew case a
    // symmetric length band would exclude by design.
    val docs = Seq(
      (1L, (1 to 10).map(i => s"s$i")),
      (2L, (1 to 8).map(i => s"s$i")),
      (3L, Seq("x1", "x2", "x3")),
      (4L, (1 to 27).map(i => s"y$i") ++ Seq("x1", "x2", "x3")),
      (5L, Seq("z1", "z2", "z3", "z4", "z5"))) // shares nothing
      .toDF("doc_id", "sh")
    val got = DedupCatalog.containmentPairs(docs, threshold = t)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = docs.collect().map(r => (r.getLong(0), r.getSeq[String](1).toSet))
    val want = (for {
      (ia, sa) <- all; (ib, sb) <- all
      if ia != ib && sa.intersect(sb).size.toDouble / sa.size >= t
    } yield (ia, ib)).toSet
    assert(got == want, s"containment recall: got $got want $want")
    assert(want.contains((1L, 2L)), "fixture must include the exact boundary")
    assert(want.contains((3L, 4L)), "fixture must include the size-skew case")
  }

  private def bruteContainment(docs: org.apache.spark.sql.DataFrame,
      t: Double): Set[(Long, Long)] = {
    val all = docs.collect().map(r => (r.getLong(0), r.getSeq[String](1).toSet))
    (for {
      (ia, sa) <- all; (ib, sb) <- all
      if ia != ib && sa.intersect(sb).size.toDouble / sa.size >= t
    } yield (ia, ib)).toSet
  }

  test("containment df-cap: zero loss when every probe has enough sub-cap " +
    "shingles — hot posting lists stay out of the candidate join") {
    import spark.implicits._
    val t = 0.8
    // "hot" sits in 14 docs (> cap = 5). A ⊂ B with rare overlap p..s, so
    // every probe prefix is all-cold — the zero-loss condition of the
    // recall argument. The 12 fillers give "hot" its over-cap df without
    // creating pairs (1/11 < t), and their huge shared posting list must
    // NOT reach the join.
    val a = 200L -> (Seq("hot") ++ (1 to 4).map(i => s"p$i"))
    val b = 201L -> (Seq("hot") ++ (1 to 4).map(i => s"p$i") ++ (1 to 10).map(i => s"b$i"))
    val fillers = (1L to 12L).map(i => i -> (Seq("hot") ++ (1 to 10).map(j => s"f$i-$j")))
    val docs = (fillers ++ Seq(a, b)).toDF("doc_id", "sh")
    val got = DedupCatalog.containmentPairs(docs, threshold = t, dfCap = 5)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteContainment(docs, t)
    assert(want == Set((200L, 201L)), "fixture: exactly the A-in-B pair qualifies")
    assert(got == want, s"capped containment equals brute force: got $got want $want")
  }

  test("containment df-cap: a mass-duplicated all-hot cluster re-links via " +
    "the prefix floor; the hot-probe-in-unrelated-container loss is exactly " +
    "the documented bounded case") {
    import spark.implicits._
    val t = 0.8
    // 12 identical docs: every shingle has df = 13 > cap = 5. Pure
    // df-capping would empty their container postings and the cluster
    // would vanish from the candidates (the primary dedup target!); the
    // prefix floor (identical sets order identically, so prefix(A) =
    // prefix(B)) must re-link every within-cluster pair.
    val clusterSh = Seq("aa", "bb", "cc", "dd")
    val docs = ((1L to 12L).map(i => (i, clusterSh)) ++ Seq(
      (50L, (1 to 26).map(i => s"big$i") ++ clusterSh),
      (60L, Seq("n1", "n2", "n3")))).toDF("doc_id", "sh")
    val got = DedupCatalog.containmentPairs(docs, threshold = t, dfCap = 5)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteContainment(docs, t)
    val withinCluster = want.filter(p => p._1 <= 12 && p._2 <= 12)
    assert(withinCluster.size == 12 * 11 && withinCluster.subsetOf(got),
      "every within-cluster containment survives the cap via the prefix floor")
    // the documented bounded loss: cluster members are hot-SATURATED
    // probes (zero sub-cap shingles), and doc 50's own prefix is its 8
    // rare big* shingles — so the cluster→50 links are dropped, and
    // NOTHING ELSE differs from brute force
    val lost = want -- got
    assert(lost == (1L to 12L).map(i => (i, 50L)).toSet,
      s"loss is exactly the hot-saturated-probe case: $lost")
    // with the cap off the operator is exact — including those pairs
    val uncapped = DedupCatalog.containmentPairs(docs, threshold = t)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped == want, "uncapped containment is exact brute force")
  }

  test("CDC chunks cover the text exactly, dedup identical text to " +
    "identical chunks, and keep almost all chunks across an insertion — " +
    "the property fixed-offset windows lack") {
    import spark.implicits._
    // deterministic pseudo-random text (LCG over a 16-char alphabet) so
    // boundary density matches the ~1/64 mask expectation
    def rndText(seed: Long, n: Int): String = {
      var x = seed
      val sb = new StringBuilder
      for (_ <- 1 to n) {
        x = x * 6364136223846793005L + 1442695040888963407L
        sb.append(('a' + ((x >>> 60) & 15)).toChar)
      }
      sb.toString
    }
    val base = rndText(42L, 2000)
    val inserted = base.substring(0, 500) + "INSERTED-SPAN-XYZ" + base.substring(500)
    val docs = Seq((1L, base), (2L, base), (3L, inserted)).toDF("doc_id", "text")
    val rows = docs
      .select(col("doc_id"), explode(DedupCatalog.cdcChunks(col("text"))).as("c"))
      .select(col("doc_id"), col("c.h").as("h"), col("c.l").as("l"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def of(id: Long) = rows.filter(_._1 == id).map(t => (t._2, t._3)).toSeq
    // coverage: chunk lengths sum to the document length, no gaps/overlap
    assert(of(1L).map(_._2).sum == base.length, "chunks tile the text exactly")
    assert(of(3L).map(_._2).sum == inserted.length)
    // determinism/dedup: identical text → identical chunk sequence
    assert(of(1L) == of(2L), "same text must chunk identically")
    // insertion resilience: boundaries are content-defined, so all chunks
    // except the few overlapping the edit re-align and stay shared
    val a = of(1L).map(_._1).toSet
    val b = of(3L).map(_._1).toSet
    assert(a.size >= 10, s"fixture needs enough chunks to be meaningful: ${a.size}")
    assert((a -- b).size <= 3,
      s"an insertion may damage only its neighborhood: lost ${(a -- b).size} of ${a.size}")
    // code-point discipline: Spark substr/length and DuckDB substr/len
    // count code points, so supplementary-plane characters must tile by
    // CODE POINTS (String.substring indexing would desync every boundary
    // after the first emoji)
    val emoji = rndText(7L, 300) + "😀😁" + rndText(9L, 300)
    val eRows = Seq((9L, emoji)).toDF("doc_id", "text")
      .select(explode(DedupCatalog.cdcChunks(col("text"))).as("c"))
      .select(col("c.l")).collect().map(_.getLong(0))
    assert(eRows.sum == emoji.codePointCount(0, emoji.length),
      "chunks tile non-BMP text in code points, matching the engines' substr")
  }

  test("compact keeps the most-token doc per cluster (tie → lowest id), " +
    "passes singletons through, and accounts per source across " +
    "cluster-spanning sources") {
    import spark.implicits._
    // cluster {1,2,3}: tokens 5,9,9 → keep 2 (max tokens, tie min id);
    // 4 is a singleton (kept); cluster {5,6} spans sources: 6 (srcB, 7
    // tokens) beats 5 (srcA, 4) → srcA loses all its clustered tokens
    val docs = Seq(
      (1L, "srcA", 5L), (2L, "srcA", 9L), (3L, "srcA", 9L),
      (4L, "srcB", 6L), (5L, "srcA", 4L), (6L, "srcB", 7L))
      .toDF("doc_id", "source", "n_tokens")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("src", "dst")
    val out = DedupCatalog.compact(docs, pairs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out("srcA") == ((4L, 1L, 27L, 9L, 0.333333)),
      "srcA: only doc 2 survives — 9 of 27 tokens kept")
    assert(out("srcB") == ((2L, 2L, 13L, 13L, 1.0)),
      "srcB: singleton 4 and cluster-winner 6 both kept")
  }

  test("prefix filter keeps exact recall against brute force") {
    import spark.implicits._
    // near-dup pairs with assorted overlap levels around the threshold
    val docs = docsOf(Seq(
      (1L, Seq("a", "b", "c", "d"), 0L),
      (2L, Seq("a", "b", "c", "e"), 0L),   // J = 3/5 = 0.6 ≥ 0.5 ✓
      (3L, Seq("a", "b", "x", "y"), 0L),   // vs 1: J = 2/6 = 0.33 ✗
      (4L, Seq("a", "b", "c", "d"), 5L),   // identical to 1 but out of band ✗
      (5L, Seq("c", "d"), 0L),             // vs 1: J = 2/4 = 0.5 ✓ (size skew)
      (6L, Seq("q"), 0L)))
    val got = DedupCatalog.lenbandJaccard(docs, threshold = 0.5,
      dfCap = 1000, keepRarest = 0)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // brute force over the same band + threshold
    val all = docs.collect().map(r =>
      (r.getLong(0), r.getSeq[String](1).toSet, r.getLong(2)))
    val want = (for {
      (ia, sa, ba) <- all; (ib, sb, bb) <- all
      if ia < ib && math.abs(ba - bb) <= 1
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= 0.5
    } yield (ia, ib)).toSet
    assert(got == want, s"prefix filtering must not lose pairs: got $got want $want")
  }

  test("connected components: chains, cycles, duplicate/reversed edges, " +
    "and separate components all resolve to min-id labels") {
    import spark.implicits._
    // component A: a 5-node chain given in mixed orientation (worst
    // diameter shape for label propagation); component B: a cycle with a
    // chord, plus duplicate and self-loop edges; node 50-51: a plain pair
    val edges = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L),  // chain 1-2-3-4-5
      (10L, 11L), (11L, 12L), (12L, 10L),      // cycle
      (12L, 13L), (10L, 13L),                  // chord + dup path
      (13L, 13L),                              // self-loop
      (10L, 11L),                              // duplicate edge
      (50L, 51L)).toDF("src", "dst")
    val got = graft.operators.Components.assign(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(got(_) == 1L), s"chain collapses to 1: $got")
    assert(Seq(10L, 11L, 12L, 13L).forall(got(_) == 10L), s"cycle to 10: $got")
    assert(got(50L) == 50L && got(51L) == 50L)
    assert(got.size == 11, "exactly the nodes present in edges are labeled")
  }
}
