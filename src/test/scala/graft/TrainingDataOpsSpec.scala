package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

/** Planted-case checks for the round-6 training-data operators
  * (tx_decontaminate, tx_rep_quality, tx_temperature_sample,
  * dd_incremental) — the DuckDB oracle pins their value-level output on
  * the synthetic corpus; these specs pin the SEMANTICS on hand-built
  * documents where the right answer is known by construction. */
class TrainingDataOpsSpec extends AnyFunSuite with SparkSpec {

  /** Write (doc_id, text, lang, source) rows as a documents.parquet the
    * catalog queries can read, return the table dir. */
  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_docs").toString
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", org.apache.spark.sql.functions.lit("src0"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")).cast("long"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dd_exact_substring: cross-doc verbatim runs are found, overlapping " +
    "duplicated windows merge into one covered span, within-doc-only " +
    "repeats don't count") {
    // docs 1+2 share one verbatim 8-token run (one shared window each);
    // doc 3 is all-unique; docs 4+5 share a 10-token run, so their three
    // consecutive shared windows (starts 1 apart) must MERGE to a
    // 10-token covered interval, not 3×8
    val dir = docsDir(Seq(
      (1L, "x1 x2 x3 s1 s2 s3 s4 s5 s6 s7 s8 y1 y2", "en"),
      (2L, "s1 s2 s3 s4 s5 s6 s7 s8 z1 z2 z3 z4", "en"),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12", "en"),
      (4L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", "en"),
      (5L, "p q t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", "en")))
    val out = SparkEntry.queries("dd_exact_substring")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    assert(out(1L) == ((13L, 6L, 1L, 8L, 0.615385)),
      "one shared window mid-doc covers exactly its 8 tokens")
    assert(out(2L) == ((12L, 5L, 1L, 8L, 0.666667)))
    assert(out(3L) == ((12L, 5L, 0L, 0L, 0.0)), "unique doc: zero coverage")
    assert(out(4L) == ((10L, 3L, 3L, 10L, 1.0)),
      "3 overlapping shared windows merge to the 10-token run — full doc")
    assert(out(5L) == ((12L, 5L, 3L, 10L, 0.833333)),
      "same run shifted by an offset still merges to 10 covered tokens")
  }

  test("tx_domain_cap keeps exactly min(10, n) docs per source and is " +
    "stable across runs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cap").toString
    val rows = (1L to 25L).map(i => (i, s"doc $i", "en", "big")) ++
      (100L to 103L).map(i => (i, s"doc $i", "en", "small"))
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def kept() = SparkEntry.queries("tx_domain_cap")(spark, dir).collect()
      .filter(_.getBoolean(3)).map(r => (r.getString(1), r.getLong(0))).toSet
    val k1 = kept()
    assert(k1.count(_._1 == "big") == 10, "over-quota domain capped at 10")
    assert(k1.count(_._1 == "small") == 4, "under-quota domain passes whole")
    assert(kept() == k1, "hash-ranked selection is deterministic across runs")
  }

  test("tx_bpe_encode: merges are learned sequentially on the rewritten " +
    "vocab (placeholders merge further), docs price in learned tokens, " +
    "and exhausted rounds no-op instead of dropping the vocabulary") {
    // vocab: abab ×3, cd ×3. round 1: 'ab' (count 6) → abab = ①①
    // round 2: '①①' ties 'cd' at 3, wins the ascending tie-break → ②
    // round 3: 'cd' → ③. round 4: NO pairs left anywhere — the round
    // must pass the vocab through (the cross-join bug would return 0 rows)
    val d = docsDir(Seq(
      (1L, "abab abab cd", "en"),
      (2L, "abab cd cd", "en")))
    val out = SparkEntry.queries("tx_bpe_encode")(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(out.size == 2, s"round 4 found no merge and must not drop docs: $out")
    assert(out(1L) == ((3L, 3L, 10L, 3.333333)),
      s"doc 1: abab→1 token twice, cd→1 token — 3 tokens over 10 chars: $out")
    assert(out(2L) == ((3L, 3L, 8L, 2.666667)), s"doc 2: $out")
  }

  test("pl_corpus_prep: every funnel stage fires on a corpus built to " +
    "trip it — holdout excluded, short doc filtered, scrub-equalized " +
    "twins deduped, eval-gram doc decontaminated, classifier gates last") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_prep").toString
    // 24 words, 2 stopword types, max word freq 1/24 — passes all rules;
    // ids 2 and 7 share it AND share doc_id%5 == 2, so their planted IP
    // suffixes differ only in digits and scrub to the SAME clean text —
    // the dedup stage only fires because redaction normalized them
    val T = ((1 to 22).map(i => f"word$i%02d") ++ Seq("the", "a")).mkString(" ")
    // passes the filter but shares the 3-grams (e1 e2 e3), (e2 e3 e4)
    // with the held-out doc 0 → contaminated
    val C = (Seq("e1", "e2", "e3", "e4") ++
      (1 to 18).map(i => f"pad$i%02d") ++ Seq("the", "a")).mkString(" ")
    // a distinct clean survivor, same construction as T
    val K = ((1 to 22).map(i => f"keep$i%02d") ++ Seq("the", "a")).mkString(" ")
    Seq(
      (0L, "e1 e2 e3 e4 e5", "en", "srcA"),   // holdout (0 % 97 == 0)
      (1L, "tiny doc", "en", "srcA"),          // fails word_count
      (2L, T, "en", "srcA"),
      (7L, T, "en", "srcB"),                   // scrub-twin of 2 → dropped
      (4L, C, "en", "srcB"),                   // contaminated
      (5L, K, "en", "srcB"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // independent model: does the classifier keep docs 2 and 5?
    def h64(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15), 16)
    def keepOf(cleanWords: Seq[String]): Boolean = {
      val raw = cleanWords.map(w =>
        (h64("qw" + (h64(w) % 64)) % 2001 - 1000).toDouble / 1000.0).sum / cleanWords.size
      -0.1 + 4.0 * raw >= 0
    }
    val keep2 = keepOf(T.split(" ").toSeq ++ Seq("host", "[IP]", "logged"))
    val keep5 = keepOf(K.split(" ").toSeq ++
      Seq("contact", "[EMAIL]", "now")) // doc 5 % 5 == 0 → email plant

    val out = SparkEntry.queries("pl_corpus_prep")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // srcA: raw {1,2}; 1 fails filter (pii: phone on 1, ip on 2 → 2 hits);
    // 2 passes, is canonical (min id of the twin pair), not contaminated
    assert(out("srcA") == ((2L, 2L, 1L, 1L, 1L, if (keep2) 1L else 0L)),
      s"srcA funnel: ${out("srcA")} (clf keep2=$keep2)")
    // srcB: raw {7,4,5}; all pass the filter (pii: ip on 7, email on 5);
    // 7 loses dedup to 2, 4 is contaminated, 5 survives to the classifier
    assert(out("srcB") == ((3L, 2L, 3L, 2L, 1L, if (keep5) 1L else 0L)),
      s"srcB funnel: ${out("srcB")} (clf keep5=$keep5)")
  }

  test("pl_train_manifest: shards are contiguous per language, respect the " +
    "2000-token budget boundaries, and the manifest never claims more " +
    "tokens than the funnel kept") {
    val sf = "/root/testdata/sf0.001"
    val funnel = SparkEntry.queries("pl_corpus_prep")(spark, sf).collect()
    val tokensKept = funnel.map(_.getLong(7)).sum
    val manifest = SparkEntry.queries("pl_train_manifest")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(manifest.nonEmpty && manifest.map(_._4).sum <= tokensKept,
      "sampling only ever removes from the kept set")
    manifest.groupBy(_._1).foreach { case (lang, shards) =>
      val ids = shards.map(_._2).sorted.toSeq
      assert(ids == (0L until ids.size).toSeq,
        s"$lang shard ids are contiguous from 0: $ids")
      // the first doc of shard k+1 had cum_before ≥ 2000(k+1), so the
      // running total through shard k must reach that boundary
      val cum = shards.sortBy(_._2).map(_._4).scanLeft(0L)(_ + _).drop(1)
      cum.dropRight(1).zipWithIndex.foreach { case (c, k) =>
        assert(c >= 2000L * (k + 1),
          s"$lang shard $k closes past its budget boundary: $c")
      }
    }
  }

  test("sim_kmeans_step reassigns a vector that sits nearer the other " +
    "cell's centroid") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vecs").toString
    // label 0 clusters near (0,0); label 1 near (10,10) — but vec 3,
    // initialized into label 0, sits at (9,9): the Lloyd step must move it
    Seq(
      (0L, Array(0.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(10.0f, 10.0f), 1),
      (4L, Array(10.0f, 9.0f), 1),
      (3L, Array(9.0f, 9.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("sim_kmeans_step")(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(3L).getInt(2) == 1 && out(3L).getBoolean(4),
      "outlier jumps to the nearer centroid")
    assert(Seq(0L, 1L, 2L, 4L).forall(id => !out(id).getBoolean(4)),
      "well-placed vectors keep their cell")
  }

  test("dd_url_dedup canonicalizes case/www/port/fragment/tracking-param/" +
    "slash noise and collapses URL variants 210 ids apart") {
    // ids 30 and 240 agree on every canonical component (site id%7,
    // path id%10, param id%3) but differ in every noise component the
    // normalization strips; id 31 shares nothing
    val d = docsDir(Seq((30L, "a b c", "en"), (240L, "d e f", "en"),
      (31L, "g h i", "en")))
    val out = SparkEntry.queries("dd_url_dedup")(spark, d).collect()
      .map(r => r.getLong(1) -> ((r.getString(0), r.getLong(2)))).toMap
    assert(out(30L) == (("https://site2.com/p/0?id=0", 2L)),
      s"variants collapse to the pinned canonical form: $out")
    assert(out(31L) == (("https://site3.com/p/1?id=1", 1L)),
      s"distinct resource survives alone: $out")
    assert(out.size == 2)
  }

  test("sim_kmeans_train: the misplaced vector moves in round 1, later " +
    "rounds are stable, and inertia never increases") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_kmt").toString
    // same planted shape as the single-step test: vec 3 starts in label 0
    // but sits at (9,9) beside cluster 1 — round 1 must move exactly it
    Seq(
      (0L, Array(0.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(10.0f, 10.0f), 1),
      (4L, Array(10.0f, 9.0f), 1),
      (3L, Array(9.0f, 9.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("sim_kmeans_train")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
    assert(out.map(_._1).toSeq == Seq(1, 2, 3))
    assert(out(0)._3 == 1L, s"round 1 moves exactly the outlier: ${out.toSeq}")
    assert(out(1)._3 == 0L && out(2)._3 == 0L,
      s"clean separation converges after one round: ${out.toSeq}")
    assert(out(0)._2 >= out(1)._2 && out(1)._2 == out(2)._2,
      s"inertia is non-increasing and flat once converged: ${out.toSeq}")
  }

  test("dd_semdedup drops the near-twin farther from its cell centroid, " +
    "keeps the prototype and unrelated members") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sdd").toString
    // cell 0: vec 1 at (1,0) near the centroid; vec 2 a near-twin of 1 but
    // farther out; vec 3 orthogonal (no pair). Centroid ≈ (0.7, 0.35).
    Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.05f), 0),
      (3L, Array(0.0f, 1.0f), 0),
      (9L, Array(5.0f, 5.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("dd_semdedup")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    // vecs 1 and 2 are a >0.35-cosine pair; 2 sits closer to the centroid
    // (its +y component leans toward vec 3's pull), so 1 drops
    assert(out.values.count(identity) == 1, s"exactly one of the twins drops: $out")
    assert(out(1L) ^ out(2L), "the drop lands on one twin")
    assert(!out(3L) && !out(9L), "singletons and other cells never drop")
  }

  test("sim_ann_sq8: integer grid points reconstruct exactly, a constant " +
    "dimension guards to scale 1 (no NaN), and off-grid values collapse " +
    "to the same cell (the lossy case)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sq8").toString
    // dim1 range [0,255] → every integer is a grid point (rec exact);
    // dim2 range [0,510] → grid step 2: corpus value 3 encodes to code 1,
    // reconstructs to 2.0 — exactly the query's raw value, so the
    // approximate distance collapses to 0 while the exact distance is 1;
    // dim3 is constant 7 → mx = mn, the scale-1 guard (0/0 would NaN
    // every distance and scramble every rank)
    Seq(
      (0L, Array(0.0f, 0.0f, 7.0f), 0),
      (1L, Array(255.0f, 510.0f, 7.0f), 0),
      (2L, Array(100.0f, 3.0f, 7.0f), 0),
      (3L, Array(100.0f, 2.0f, 7.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("sim_ann_sq8")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(out.forall(_._1 == 3L), "vec 3 is the only query in range")
    assert(out.map(r => (r._2, r._3)).toSeq == Seq(
      (2L, 0.0),        // off-grid 3 → rec 2.0 == query: approx collapses
      (0L, 10004.0),    // 100² + 2² — grid-exact reconstruction
      (1L, 282089.0)),  // 155² + 508² — 510 → code 255 → rec 510 exact
      s"reconstructed distances and ranking: ${out.toSeq}")
    assert(out.map(_._4).toSeq == Seq(1, 2, 3))
  }

  test("dd_incremental matches new-batch docs against the corpus only, " +
    "min-id tie-break, pass-through for novel docs") {
    val corpusText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = docsDir(Seq(
      (2L, corpusText, "en"),                       // corpus original
      (3L, corpusText, "en"),                       // corpus-internal dup of 2 (must NOT appear)
      (5L, "one two three four five six seven eight nine ten", "en"),
      (7L, corpusText + " lambda", "en"),           // batch: near-dup of 2 and 3 → dup_of = 2
      (17L, "red green blue cyan magenta yellow black white gray pink", "en"), // batch: novel
      (27L, corpusText, "en")))                     // batch: exact dup → dup_of = 2
    val out = SparkEntry.queries("dd_incremental")(spark, d).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(out.length == 3, "one row per batch doc, corpus docs absent")
    assert(byId(7L).getLong(1) == 2L && byId(7L).getBoolean(2),
      "near-dup resolves to the LOWEST matching corpus id")
    assert(byId(27L).getLong(1) == 2L && byId(27L).getBoolean(2))
    assert(byId(17L).isNullAt(1) && !byId(17L).getBoolean(2),
      "novel batch doc passes through with dup_of = NULL")
  }

  test("tx_decontaminate counts distinct shared n-grams vs the eval set; " +
    "flag needs >= 2 overlapping trigrams") {
    val evalText = "zebra quokka wombat narwhal axolotl pangolin" // doc_id 0 → eval
    val d = docsDir(Seq(
      (0L, evalText, "en"),
      // 4-word span copied from eval → 2 shared trigrams → contaminated
      (5L, "filler quokka wombat narwhal axolotl other words here", "en"),
      // one 3-word span → 1 shared trigram → counted, NOT flagged
      (12L, "filler zebra quokka wombat unrelated tail words", "en"),
      (30L, "completely different content with no overlap at all", "en")))
    val out = SparkEntry.queries("tx_decontaminate")(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(!out.contains(0L), "eval docs are not scored")
    assert(out(5L) == ((2L, true)), s"got ${out(5L)}")
    assert(out(12L) == ((1L, false)), "single-trigram coincidence is below threshold")
    assert(out(30L) == ((0L, false)))
  }

  test("tx_rep_quality: duplicate-word and top-bigram fractions with the " +
    "Gopher 0.18 threshold") {
    val d = docsDir(Seq(
      (1L, "spam spam spam spam", "en"),            // dup 0.75, top-bigram 3/3
      (2L, "one two three four five six", "en")))   // all distinct, top-bigram 1/5 > 0.18!
    val out = SparkEntry.queries("tx_rep_quality")(spark, d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getDouble(2) == 0.75 && out(1L).getDouble(3) == 1.0 &&
      out(1L).getBoolean(4))
    // 6 words → 5 bigrams, each unique → top fraction 0.2, above the 0.18
    // paper threshold only because the doc is tiny — the flag fires, which
    // is exactly Gopher's documented short-doc bias
    assert(out(2L).getDouble(2) == 0.0 && out(2L).getDouble(3) == 0.2)
  }

  test("tx_chunk_split: 64-token windows at stride 48, tail clamps, " +
    "short docs yield one chunk") {
    val long = (1 to 100).map(i => s"w$i").mkString(" ")  // 100 tokens → 2 chunks
    val d = docsDir(Seq((1L, long, "en"), (2L, "a b c", "en")))
    val out = SparkEntry.queries("tx_chunk_split")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 0L)) == 64, "first window is full")
    assert(out((1L, 1L)) == 52, "tail window clamps: tokens 49..100")
    assert(out((2L, 0L)) == 3 && !out.contains((2L, 1L)),
      "short doc yields exactly one chunk")
    assert(out.size == 3)
  }

  test("tx_unigram_logprob: common-word docs score higher than rare-word " +
    "docs under the corpus-estimated model") {
    // corpus: "the" appears 7 times of 10 tokens, "xyzzy" once
    val d = docsDir(Seq(
      (1L, "the the the", "en"),
      (2L, "the the the the", "en"),
      (3L, "xyzzy quux plugh", "en")))
    val out = SparkEntry.queries("tx_unigram_logprob")(spark, d).collect()
      .map(r => r.getLong(0) -> r).toMap
    val lpThe = math.log(7.0 / 10.0)
    assert(out(1L).getLong(1) == 3)
    assert(math.abs(out(1L).getDouble(2) -
      BigDecimal(lpThe).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    val lpRare = math.log(1.0 / 10.0)
    assert(math.abs(out(3L).getDouble(2) -
      BigDecimal(lpRare).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(out(1L).getDouble(2) > out(3L).getDouble(2),
      "rare-token docs sit lower under the model")
    assert(out(3L).getDouble(3) > out(1L).getDouble(3), "…and at higher perplexity")
  }

  test("tx_quality_classifier: margin is the mean bucket weight — " +
    "repetition-invariant, averages across words, and words colliding " +
    "into one bucket score identically (the hashing trick)") {
    // independent reimplementation of the portable hash (md5 first 15 hex
    // → long), as the oracle computes it — pins the weight derivation
    def h64(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15), 16)
    val words = (1 to 200).map(i => s"w$i")
    val byBucket = words.groupBy(w => h64(w) % 64)
    val (bkt, collide) = byBucket.filter(_._2.size >= 2).head
    val expectedW = (h64("qw" + bkt) % 2001 - 1000).toDouble / 1000.0

    val d = docsDir(Seq(
      (1L, collide(0), "en"),
      (2L, collide(1), "en"),                              // same bucket
      (3L, s"${collide(0)} ${collide(0)} ${collide(0)}", "en"), // repeated
      (4L, s"${collide(0)} zebra9", "en")))                // two-word mean
    val out = SparkEntry.queries("tx_quality_classifier")(spark, d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(math.abs(out(1L).getDouble(2) - expectedW) < 1e-6,
      "single-word margin equals the bucket weight the oracle derives")
    assert(out(1L).getDouble(2) == out(2L).getDouble(2),
      "bucket collision ⇒ identical weight")
    assert(out(1L).getDouble(2) == out(3L).getDouble(2),
      "mean weight is invariant to repeating the word")
    val wZebra = (h64("qw" + (h64("zebra9") % 64)) % 2001 - 1000).toDouble / 1000.0
    assert(math.abs(out(4L).getDouble(2) - BigDecimal((expectedW + wZebra) / 2.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
      "two-word doc averages the two bucket weights")
    assert(out(1L).getBoolean(4) == (-0.1 + 4.0 * out(1L).getDouble(2) >= 0),
      "keep decision matches the margin sign")
  }

  test("shardShuffle fills fixed-size shards in hash order, is reproducible " +
    "across runs, and decorrelates crawl order (contiguous sources mix)") {
    import spark.implicits._
    // 12 docs, crawl-ordered: ids 1-6 all srcA, 7-12 all srcB
    val docs = (1L to 12L).map(i =>
      (i, if (i <= 6) "srcA" else "srcB", 10L + i))
      .toDF("doc_id", "source", "n_tokens")
    val run1 = graft.catalog.TextCatalog.shardShuffle(docs, shardSize = 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val run2 = graft.catalog.TextCatalog.shardShuffle(docs, shardSize = 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(run1.toSeq == run2.toSeq, "no RNG — identical assignment on re-run")
    assert(run1.map(_._1).toSeq == Seq(0L, 1L, 2L), "⌈12/4⌉ = 3 shards")
    assert(run1.map(_._2).toSeq == Seq(4L, 4L, 4L), "each shard holds exactly 4")
    assert(run1.map(_._3).sum == (1L to 12L).map(10L + _).sum,
      "token mass is conserved")
    // the hash permutation interleaves the two crawl-contiguous sources —
    // deterministic for this fixture (hash values are fixed forever)
    assert(run1.count(_._4 == 2L) >= 2,
      "at least two of three shards draw from both sources")
  }

  test("tx_temperature_sample boosts rare languages to full retention and " +
    "tempers dominant ones (alpha = 0.3)") {
    val rows = (1L to 90L).map(i => (i, s"en doc $i", "en")) ++
      (101L to 110L).map(i => (i, s"de doc $i", "de"))
    val out = SparkEntry.queries("tx_temperature_sample")(spark, docsDir(rows))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    val keepBy = out.groupBy(_._2).map { case (l, rs) => l -> rs.head._3 }
    // share_de = .1 → q_de/share_de = (.1^.3/z)/.1 > 1 → clipped to keep all
    assert(keepBy("de") == 1000000L, s"rare language kept whole: $keepBy")
    // share_en = .9 → tempered share ~.66 → keep ~732k of 1e6
    assert(keepBy("en") > 700000L && keepBy("en") < 770000L, s"$keepBy")
    assert(out.filter(_._2 == "de").forall(_._4), "every rare-lang doc sampled")
    val enKept = out.count(r => r._2 == "en" && r._4)
    assert(enKept > 0 && enKept < 90, "dominant language is down-sampled")
  }

  test("tx_tfidf_keywords ranks a doc's distinctive terms above corpus-wide " +
    "ones, with exact tf/df/tfidf values") {
    // n_docs = 3; "the" in every doc → idf 0; "zebra" only in doc 1
    val d = docsDir(Seq(
      (1L, "zebra zebra the cat", "en"),
      (2L, "the dog runs", "en"),
      (3L, "the bird sings high", "en")))
    val doc1 = SparkEntry.queries("tx_tfidf_keywords")(spark, d).collect()
      .filter(_.getLong(0) == 1L)
      .map(r => r.getLong(1) -> ((r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(doc1(1L) == (("zebra", 2L, 1L, r6(2 * math.log(3.0)))),
      s"tf=2, df=1 term dominates: $doc1")
    assert(doc1(2L) == (("cat", 1L, 1L, r6(math.log(3.0)))))
    assert(doc1(3L) == (("the", 1L, 3L, 0.0)),
      "a term in every document carries zero idf")
  }

  test("tx_ngram_topk counts bigrams per language and the salted two-phase " +
    "top-10 equals the direct top-10 under the (cnt, bigram) order") {
    // "a b" occurs 3×, "b a" 2× in en; plus 12 once-seen bigrams whose
    // top-10 must be the 10 lexicographically-smallest — exercises the
    // tie-break surviving the salted local phase intact
    val d = docsDir(Seq(
      (1L, "a b a b a b", "en"),
      (2L, "g01 g02 g03 g04 g05 g06 g07 g08 g09 g10 g11 g12 g13", "fr")))
    val out = SparkEntry.queries("tx_ngram_topk")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val en = out.filter(_._1 == "en").sortBy(_._2)
    assert(en.map(t => (t._3, t._4)).toSeq == Seq(("a b", 3L), ("b a", 2L)))
    val fr = out.filter(_._1 == "fr").sortBy(_._2)
    assert(fr.length == 10, "exactly K survive for a 12-bigram language")
    assert(fr.map(_._3).toSeq ==
      (1 to 10).map(i => f"g$i%02d g${i + 1}%02d").toSeq,
      s"equal counts fall back to lexicographic bigram order: ${fr.toSeq}")
    assert(fr.forall(_._4 == 1L))
  }

  test("tx_length_quantiles interpolates exact quantiles per language") {
    // en token lengths {1,2,3,4}: p25 at rank .25*(4-1)=0.75 → 1.75, etc.
    val d = docsDir(Seq(
      (1L, "w", "en"), (2L, "w w", "en"), (3L, "w w w", "en"),
      (4L, "w w w w", "en"), (5L, "x x x x x", "de")))
    val out = SparkEntry.queries("tx_length_quantiles")(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(out("en") == ((4L, 1.75, 2.5, 3.25, 3.85)), s"$out")
    assert(out("de") == ((1L, 5.0, 5.0, 5.0, 5.0)),
      "a single-doc language pins every quantile to its one length")
  }

  test("tx_ccnet_bucket: terciles split 3/2/2 for 7 docs and order by " +
    "unigram score — common-word docs land in head, rare-word in tail") {
    // 7 en docs; the more "the" (the dominant corpus token) a doc has,
    // the higher its avg logprob → head. Unique-token docs sink to tail.
    val d = docsDir(Seq(
      (1L, "the the the the", "en"),
      (2L, "the the the q1", "en"),
      (3L, "the the q2 q3", "en"),
      (4L, "the q4 q5 q6", "en"),
      (5L, "q7 q8 q9 q10", "en"),
      (6L, "q11 q12 q13 q14", "en"),
      (7L, "q15 q16 q17 q18", "en")))
    val out = SparkEntry.queries("tx_ccnet_bucket")(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getLong(3), r.getString(4)))
    assert(out.groupBy(_._3).view.mapValues(_.length).toMap ==
      Map(1L -> 3, 2L -> 2, 3L -> 2),
      s"NTILE(3) over 7 rows gives the remainder to the first bucket: ${out.toSeq}")
    assert(out.filter(_._4 == "head").map(_._1).toSet == Set(1L, 2L, 3L),
      "the three most-common-worded docs are the head")
    val byBucket = out.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBucket(1L).min >= byBucket(2L).max &&
      byBucket(2L).min >= byBucket(3L).max,
      "bucket boundaries follow the score ordering")
  }

  test("tx_entropy: uniform docs hit the log2 ceiling, constant docs " +
    "floor at zero with a null normalized form, and skew lands between") {
    val d = docsDir(Seq(
      (1L, "a a a a", "en"),
      (2L, "a b c d", "en"),
      (3L, "a a a b", "en")))
    val out = SparkEntry.queries("tx_entropy")(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(out(1L) == ((4L, 1L, 0.0, None)),
      s"single-word doc: zero entropy, normalization undefined: $out")
    assert(out(2L) == ((4L, 4L, 2.0, Some(1.0))),
      s"uniform 4-word doc sits exactly at log2(4): $out")
    val expected = -(0.75 * math.log(0.75) / math.log(2.0) +
      0.25 * math.log(0.25) / math.log(2.0))
    assert(out(3L)._1 == 4L && out(3L)._2 == 2L &&
      math.abs(out(3L)._3 - expected) < 1e-6 &&
      math.abs(out(3L)._4.get - expected) < 1e-6,
      s"3:1 skew: H=$expected: $out")
  }

  test("ev_path_topk counts per-user consecutive transitions and ranks " +
    "each source type's successors with deterministic ties") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_path").toString
    def ns(sec: Long) = sec * 1000000000L
    // u1: view→click→view→purchase; u2: view→click→click
    Seq(
      (1L, ns(10), 1L, "view", 1.0, "{}"), (2L, ns(20), 1L, "click", 1.0, "{}"),
      (3L, ns(30), 1L, "view", 1.0, "{}"), (4L, ns(40), 1L, "purchase", 1.0, "{}"),
      (5L, ns(10), 2L, "view", 1.0, "{}"), (6L, ns(20), 2L, "click", 1.0, "{}"),
      (7L, ns(30), 2L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("ev_path_topk")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      ("click", "click", 1L, 1), ("click", "view", 1L, 2),
      ("view", "click", 2L, 1), ("view", "purchase", 1L, 2)),
      s"transition counts, tie broken to successor asc: ${out.toSeq}")
  }

  test("ev_anomaly z-scores each hour against its type's trailing " +
    "baseline: the spike alerts, warmup and zero-variance baselines " +
    "yield null z and never alert") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_anom").toString
    def ns(sec: Long) = sec * 1000000000L
    // clicks per hour: 3, 5, 4, 4, 20 — the last hour is the spike;
    // views are constant 2/hour — zero variance, must never alert
    val clicks = Seq(3, 5, 4, 4, 20).zipWithIndex.flatMap { case (n, h) =>
      (0 until n).map(i => (h * 100L + i, ns(h * 3600L + i), 1L, "click", 1.0, "{}"))
    }
    val views = (0 until 5).flatMap(h =>
      (0 until 2).map(i => (9000L + h * 10 + i, ns(h * 3600L + i), 2L, "view", 1.0, "{}")))
    (clicks ++ views)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("ev_anomaly")(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(0)) ->
        ((r.getLong(2), if (r.isNullAt(5)) None else Some(r.getDouble(5)),
          r.getBoolean(6)))).toMap
    val spike = out(("click", 4 * 3600L))
    val expZ = {
      val base = Seq(3.0, 5.0, 4.0, 4.0)
      val m = base.sum / 4
      val sd = math.sqrt(base.map(x => (x - m) * (x - m)).sum / 3)
      BigDecimal((20.0 - m) / sd).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(spike._1 == 20L && spike._2.contains(expZ) && spike._3,
      s"the 20-event hour alerts at z=$expZ: $spike")
    assert(out(("click", 0L))._2.isEmpty && !out(("click", 0L))._3,
      "first window has no baseline — null z, no alert")
    assert(out(("click", 3600L))._2.isEmpty,
      "single-sample baseline has no sample stddev — null z")
    assert((0 until 5).forall { h =>
      val v = out(("view", h * 3600L)); v._2.isEmpty && !v._3
    }, "zero-variance baseline never alerts (no engine-dependent inf)")
    assert(!out(("click", 2 * 3600L))._3 && !out(("click", 3 * 3600L))._3,
      "in-baseline hours stay quiet")
  }

  test("ev_asof_join attributes each purchase to the latest view at or " +
    "before it, per user, with deterministic tie handling") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_asof").toString
    def ns(sec: Long) = sec * 1000000000L
    // user 1: views at t=10 (id 100) and t=20 (ids 101,102 — same second,
    // max id wins), purchases at t=20 (inclusive match) and t=15;
    // user 2: purchase with NO prior view (its view comes later)
    Seq(
      (100L, ns(10), 1L, "view", 1.0, "{}"),
      (101L, ns(20), 1L, "view", 1.0, "{}"),
      (102L, ns(20), 1L, "view", 1.0, "{}"),
      (200L, ns(20), 1L, "purchase", 9.5, "{}"),
      (201L, ns(15), 1L, "purchase", 4.0, "{}"),
      (300L, ns(5), 2L, "purchase", 7.0, "{}"),
      (301L, ns(8), 2L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("ev_asof_join")(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(200L).getLong(4) == 102L && out(200L).getLong(5) == 20L &&
      out(200L).getLong(6) == 0L,
      "same-second view matches (inclusive) and the max event_id represents the tie")
    assert(out(201L).getLong(4) == 100L && out(201L).getLong(6) == 5L,
      "an earlier purchase sees only the earlier view")
    assert(out(300L).isNullAt(4) && out(300L).isNullAt(5) && out(300L).isNullAt(6),
      "no prior view → null attribution, the purchase row still survives")

    // the windowed companion on the same events: the window is STRICTLY
    // before the purchase, so both t=20 purchases and views exclude each
    // other and only the t=10 view counts; user 2's purchase sees none
    val win = SparkEntry.queries("ev_attribution_window")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4))))
      .toMap
    assert(win(200L) == ((1L, 10L)),
      s"same-instant views fall outside the strict window: $win")
    assert(win(201L) == ((1L, 10L)), s"$win")
    assert(win(300L) == ((0L, -1L)), "zero views → count 0, null last_view_t")
  }

  test("sim_pq_assign quantizes each 8-dim subspace independently to the " +
    "nearest codeword, ties to the smaller code id") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pq").toString
    def const(x: Float) = Array.fill(64)(x)
    // vecs 0..3 ARE the codebook (codewords constant 0,1,2,3 per dim);
    // 10: nearest code 1 everywhere; 11: split halves → codes 0 and 3;
    // 12: exactly between codes 1 and 2 → tie falls to code 1
    Seq(
      (0L, const(0f), 0), (1L, const(1f), 0),
      (2L, const(2f), 0), (3L, const(3f), 0),
      (10L, const(1.25f), 1),
      (11L, (Array.fill(32)(0f) ++ Array.fill(32)(3f)), 1),
      (12L, const(1.5f), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("sim_pq_assign")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    for (sub <- 0L to 7L) {
      assert(out((1L, sub)) == ((1L, 0.0)), "a codeword quantizes to itself")
      assert(out((10L, sub)) == ((1L, 0.5)), s"8 × 0.25² = 0.5 to code 1: $out")
      assert(out((12L, sub))._1 == 1L, "equidistant between 1 and 2 → smaller id")
      assert(out((11L, sub))._1 == (if (sub < 4) 0L else 3L),
        "subspaces quantize independently")
    }
  }

  test("sim_ann_ivfpq ranks cell-mates by summed LUT distances over their " +
    "stored codes — never touching corpus floats at query time") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    def const(x: Float) = Array.fill(64)(x)
    // same layout as the PQ spec: codebook = vecs 0..3; queries are
    // vec_id ∈ [3, 13) → 3 (cell 0) and 10,11,12 (cell 1)
    Seq(
      (0L, const(0f), 0), (1L, const(1f), 0),
      (2L, const(2f), 0), (3L, const(3f), 0),
      (10L, const(1.25f), 1),
      (11L, (Array.fill(32)(0f) ++ Array.fill(32)(3f)), 1),
      (12L, const(1.5f), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("sim_ann_ivfpq")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    // q10 (const 1.25): 12 codes to 1 everywhere → 8 subs × 8·0.25² = 4;
    // 11 codes split 0/3 → 4×(8·1.25²) + 4×(8·1.75²) = 148
    assert(out((10L, 1)) == ((12L, 4.0)) && out((10L, 2)) == ((11L, 148.0)),
      s"ADC sums the per-subspace LUT entries of the stored codes: $out")
    // q3 (cell 0, const 3): nearest cell-mate by code distance is 2
    assert(out((3L, 1)) == ((2L, 64.0)), s"$out")
  }

  test("dd_bloom_incremental classifies a batch exactly despite the " +
    "approximate prune: dups resolve to the lowest corpus owner, novel " +
    "docs pass, and a bloom false positive cannot flip a verdict") {
    // batch = doc_id % 10 == 7; corpus = the rest
    val d = docsDir(Seq(
      (1L, "corpus text one", "en"),
      (2L, "shared duplicate body", "en"),
      (3L, "twice in the corpus", "en"),
      (11L, "twice in the corpus", "en"),
      (7L, "shared duplicate body", "en"),   // dup of 2
      (17L, "genuinely novel content", "en"), // novel
      (27L, "twice in the corpus", "en")))    // dup of min(3, 11)
    val out = SparkEntry.queries("dd_bloom_incremental")(spark, d).collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getBoolean(2)))
      .toMap
    assert(out.keySet == Set(7L, 17L, 27L), "only batch docs classify")
    assert(out(7L) == ((2L, true)), s"$out")
    assert(out(27L) == ((3L, true)), "multi-copy content resolves to the lowest owner")
    assert(out(17L) == ((-1L, false)), "novel content passes with null owner")
  }

  test("tx_dsir_weight upweights docs whose hashed-feature profile matches " +
    "the target slice and downweights the rest") {
    // target slice = lang 'en'; its vocabulary is disjoint from de's, so
    // en-vocabulary buckets carry all the target mass
    val d = docsDir(Seq(
      (1L, "alpha beta gamma alpha beta", "en"),
      (2L, "alpha gamma beta beta", "en"),
      (3L, "zeta eta theta iota", "de"),
      (4L, "zeta theta eta eta zeta", "de")))
    val out = SparkEntry.queries("tx_dsir_weight")(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    assert(out.size == 4, "every raw doc gets a weight")
    assert(out(1L)._1 == 5 && out(2L)._1 == 4)
    for (en <- Seq(1L, 2L); de <- Seq(3L, 4L))
      assert(out(en)._2 > out(de)._2,
        s"target-like docs score above off-target docs: $out")
    assert(out(1L)._3 && out(2L)._3 && !out(3L)._3 && !out(4L)._3,
      s"the upweighted flag follows the sign: $out")
  }

  test("dd_minhash_calibration: an identical pair lands in the top decile " +
    "with a perfect estimate and zero error") {
    val d = docsDir(Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en"),
      (2L, "alpha beta gamma delta epsilon zeta", "en"),
      (3L, "one two three four five six seven", "en")))
    val out = SparkEntry.queries("dd_minhash_calibration")(spark, d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out.contains(9L), s"identical docs must collide in every band: $out")
    assert(out(9L) == ((1L, 1.0, 1.0, 0.0)),
      s"J=1 pair: est 1.0, truth 1.0, zero error: $out")
  }

  /** docsDir with a caller-chosen source column (tx_url_filter branches
    * on it). */
  private def docsDir4(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_docs").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")).cast("long"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("tx_mix_weights: a dominant source is downweighted below 1, a tiny " +
    "one is upweighted and capped at 5 epochs") {
    // src0: 32 tokens of 40 total; src1: 6; src2: 2 (uniform target:
    // 40/3 ≈ 13.33 tokens each → weights 0.416667, 2.222222, 5.0 capped)
    val d = docsDir4(Seq(
      (1L, ("w " * 15).trim, "en", "src0"),
      (2L, ("w " * 17).trim, "en", "src0"),
      (3L, "a b c d e f", "en", "src1"),
      (4L, "x y", "en", "src2")))
    val out = SparkEntry.queries("tx_mix_weights")(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    assert(out("src0") == ((2L, 32L, 0.8, 0.416667, false)),
      s"dominant source downweighted: ${out("src0")}")
    assert(out("src1") == ((1L, 6L, 0.15, 2.222222, false)),
      s"small source upweighted: ${out("src1")}")
    assert(out("src2") == ((1L, 2L, 0.05, 5.0, true)),
      s"tiny source hits the 5-epoch cap: ${out("src2")}")
  }

  test("tx_pii_scrub: each planted PII class is counted and redacted, " +
    "a clean doc passes through untouched") {
    val d = docsDir(Seq(
      (10L, "hello world", "en"),  // %5=0: email
      (11L, "quick brown fox", "en"),  // %5=1: phone
      (12L, "lazy dog", "en"),  // %5=2: ip
      (13L, "pack my box", "en"),  // %5=3: email + ip
      (14L, "five boxing wizards", "en")))  // %5=4: nothing planted
    val out = SparkEntry.queries("tx_pii_scrub")(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))).toMap
    assert(out(10L) == ((1L, 0L, 0L, 1L,
      "hello world contact [EMAIL] now")))
    assert(out(11L) == ((0L, 0L, 1L, 1L,
      "quick brown fox call [PHONE] today")))
    assert(out(12L) == ((0L, 1L, 0L, 1L,
      "lazy dog host [IP] logged")))
    assert(out(13L) == ((1L, 1L, 0L, 2L,
      "pack my box mail [EMAIL] and ip [IP] end")),
      s"a doc with two PII classes counts and scrubs both: ${out(13L)}")
    assert(out(14L) == ((0L, 0L, 0L, 0L, "five boxing wizards")),
      "no planted PII: untouched text, zero counts")
  }

  test("tx_url_filter: tracker subdomains, spam TLDs, blocklisted " +
    "sources, and deep hosts are each dropped; a plain host is kept") {
    val d = docsDir4(Seq(
      (15L, "a", "en", "src3"),  // ads. tracker AND blocked source
      (16L, "b", "en", "src0"),  // cdn.static. depth-4 host, .info TLD
      (17L, "c", "en", "src0"),  // bare host, .org: the keeper
      (18L, "d", "en", "src7")))  // clean shape but blocklisted
    val out = SparkEntry.queries("tx_url_filter")(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6), r.getBoolean(7))))
      .toMap
    assert(out(15L) == (("https://ads.w1.src3.com/p/15", 3L,
      true, false, true, false)), s"tracker + blocklist: ${out(15L)}")
    assert(out(16L) == (("https://cdn.static.w2.src0.info/p/16", 4L,
      false, true, false, false)), s"spam TLD + deep host: ${out(16L)}")
    assert(out(17L) == (("https://w3.src0.org/p/17", 2L,
      false, false, false, true)), s"plain host survives: ${out(17L)}")
    assert(out(18L) == (("https://w4.src7.com/p/18", 2L,
      false, false, true, false)), s"blocklist alone drops: ${out(18L)}")
  }

  test("tx_span_scrub removes exactly the words covered by cross-doc " +
    "duplicated 5-grams; within-doc repeats and unique docs are untouched") {
    // docs 1+2 share exactly one 5-gram (d1..d5): those 5 words vanish
    // from both, surrounding words survive in order. doc 3 repeats its
    // OWN 5-gram twice but shares nothing → untouched (df counts distinct
    // docs). doc 4 is unique → untouched.
    val dir = docsDir(Seq(
      (1L, "a1 a2 d1 d2 d3 d4 d5 a3 a4", "en"),
      (2L, "d1 d2 d3 d4 d5 b1 b2 b3 b4", "en"),
      (3L, "r1 r2 r3 r4 r5 r1 r2 r3 r4 r5 c1", "en"),
      (4L, "u1 u2 u3 u4 u5 u6 u7", "en")))
    val out = SparkEntry.queries("tx_span_scrub")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out(1L) == ((5L, "a1 a2 a3 a4")),
      "the shared gram's 5 words are removed, prefix+suffix kept in order")
    assert(out(2L) == ((5L, "b1 b2 b3 b4")))
    assert(out(3L) == ((0L, "r1 r2 r3 r4 r5 r1 r2 r3 r4 r5 c1")),
      "a doc repeating its own gram is NOT scrubbed — df is cross-doc")
    assert(out(4L) == ((0L, "u1 u2 u3 u4 u5 u6 u7")))
  }

  test("tx_bpe_step counts frequency-weighted adjacent character pairs — " +
    "the hand-checked first BPE merge wins") {
    // 'aab' ×3 → pairs aa,ab ×3; 'ab' ×2 → ab ×2; 'ba' ×1 → ba ×1.
    // Totals: ab=5, aa=3, ba=1 → merge order ab, aa, ba.
    val dir = docsDir(Seq(
      (1L, "aab aab ab", "en"),
      (2L, "aab ab ba", "en")))
    val out = SparkEntry.queries("tx_bpe_step")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("ab", 5L), ("aa", 3L), ("ba", 1L)),
      s"frequency-weighted pair counts in merge order: ${out.toSeq}")
  }

  test("tx_filter_pipeline applies the Gopher rules in precedence order " +
    "with per-language stoplists and a vacuous pass for unsupported langs") {
    // 30 distinct 6-char filler words keep avg word length mid-range
    val pad = (1 to 30).map(i => f"fill$i%02d").mkString(" ")
    val dir = docsDir(Seq(
      (1L, s"the a of and $pad", "en"),   // all rules pass
      (2L, "the a b c", "en"),            // 4 words → word_count
      (3L, s"the $pad", "en"),            // 31 words, ONE stopword → stopwords
      (4L, s"le la $pad", "fr"),          // french stoplist applies → keep
      (5L, s"le la $pad", "zh"),          // zh: no stoplist → vacuous pass
      (6L, ("repeat " * 10).trim + s" $pad the a", "en"))) // mode 10/42 > 0.2
    val out = SparkEntry.queries("tx_filter_pipeline")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(out(1L) == ((true, "")), s"clean doc keeps: ${out(1L)}")
    assert(out(2L) == ((false, "word_count")))
    assert(out(3L) == ((false, "stopwords")),
      "one distinct stopword is below the two-stopword floor")
    assert(out(4L) == ((true, "")), "French stoplist applies for lang=fr")
    assert(out(5L) == ((true, "")),
      "no stoplist for zh: the stopword rule passes vacuously")
    assert(out(6L) == ((false, "repetition")),
      "10/42 repeats of one word exceed the 0.2 mode ratio")
  }

  /** Reference Levenshtein DP for exact expected values. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("boundedLevenshtein equals the full DP whenever the true distance " +
    "is within the band, returns -1 beyond it, and counts code points") {
    import graft.functions.TextHashes.boundedLevenshtein
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val cases = for {
      i <- 0 until 40
      a = (0 until 6).map(p => words((i * 7 + p * 3) % 5)).mkString(" ")
      b = (0 until 6).map(p => words((i * 11 + p * 5 + (if (p == i % 6) 1 else 0)) % 5)).mkString(" ")
    } yield (a, b)
    cases.foreach { case (a, b) =>
      val d = lev(a, b)
      for (k <- Seq(0, 1, 3, d - 1, d, d + 1, 200).filter(_ >= 0)) {
        val got = boundedLevenshtein(a, b, k)
        if (d <= k) assert(got == d, s"k=$k a=$a b=$b")
        else assert(got == -1, s"must reject beyond the band: k=$k d=$d")
      }
    }
    assert(boundedLevenshtein("", "", 0) == 0)
    assert(boundedLevenshtein("", "abc", 3) == 3)
    assert(boundedLevenshtein("", "abc", 2) == -1)
    // code points, not UTF-16 units: one astral char differs by 1, not 2
    assert(boundedLevenshtein("a😀b", "ab", 5) == 1)
    assert(boundedLevenshtein("café", "cafe", 5) == 1)
  }

  test("boundedLevUdf null-propagates like the builtin levenshtein " +
    "instead of failing the task (r9 advice)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val df = Seq((1L, Option("abc"), Option("abd")),
      (2L, None: Option[String], Option("abd")),
      (3L, Option("abc"), None: Option[String])).toDF("id", "a", "b")
    val out = df.select(col("id"),
      graft.functions.TextHashes.boundedLevUdf(col("a"), col("b"), lit(5)).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .toMap
    assert(out == Map(1L -> Some(1), 2L -> None, 3L -> None),
      s"null text yields NULL, not an NPE: $out")
  }

  test("dd_edit_pairs: word-ORDER edits that Jaccard scores as identical " +
    "still cost edit distance; substitutions cost exactly their chars; " +
    "distances match an independent DP") {
    val base = (1 to 30).map(i => f"word$i%02d").mkString(" ")
    val swapped = {                       // words 10 and 11 swapped
      val w = base.split(" "); val t = w(9); w(9) = w(10); w(10) = t
      w.mkString(" ")
    }
    val substituted = base.replace("word15", "worm15") // 1 char differs
    val dir = docsDir(Seq(
      (1L, base, "en"), (2L, swapped, "en"), (3L, substituted, "en"),
      (4L, (1 to 30).map(i => f"other$i%02d").mkString(" "), "en")))
    val out = SparkEntry.queries("dd_edit_pairs")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // identical word MULTISET → identical simhash → always a candidate;
    // n-gram Jaccard calls these a perfect dup, the DP does not
    assert(out.contains((1L, 2L)), s"swap pair found: ${out.keySet}")
    assert(out((1L, 2L))._1 == lev(base, swapped).toLong)
    assert(out((1L, 2L))._1 > 0, "word order is not free under edit distance")
    assert(out.contains((1L, 3L)), "substitution pair found")
    assert(out((1L, 3L))._1 == lev(base, substituted).toLong)
    assert(out((1L, 3L))._1 == 1L, "one substituted char costs exactly 1")
    val expSim = BigDecimal(1.0 - 1.0 / base.length)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out((1L, 3L))._2 == expSim)
    assert(!out.keys.exists(p => p._1 == 4L || p._2 == 4L),
      "the unrelated doc pairs with nobody")
  }

  test("dd_split_leakfree: no simhash near-dup pair ever straddles a " +
    "split, and the split is a deterministic function of the cluster") {
    val rows = (1L to 40L).map { i =>
      // 10 clusters of 4 exact copies each → guaranteed pairs
      val c = (i - 1) / 4
      (i, (1 to 25).map(j => f"c$c%02d w$j%02d").mkString(" "), "en")
    }
    val dir = docsDir(rows)
    val split = SparkEntry.queries("dd_split_leakfree")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(split.size == 40)
    val pairs = SparkEntry.queries("dd_simhash_pairs")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "exact copies must band together")
    pairs.foreach { case (a, b) =>
      assert(split(a)._2 == split(b)._2,
        s"near-dups $a/$b landed in ${split(a)._2} vs ${split(b)._2}")
    }
    // all four copies of a cluster share the canonical AND the split
    (0L to 9L).foreach { c =>
      val members = (c * 4 + 1) to (c * 4 + 4)
      assert(members.map(split(_)._1).toSet.size == 1, s"cluster $c canonical")
      assert(members.map(split(_)._2).toSet.size == 1, s"cluster $c split")
    }
    // rerun → identical assignment (salted hash, no RNG)
    val again = SparkEntry.queries("dd_split_leakfree")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(again == split)
  }

  test("tx_curriculum_order: rank follows chars/token with doc_id " +
    "tie-break, stages cut the rank range into 4 even bands") {
    // difficulties: doc i has words of length i+1 → chars/token separates
    val dir = docsDir((1L to 8L).map { i =>
      (i, (1 to 10).map(_ => "x" * (i.toInt + 1)).mkString(" "), "en")
    })
    val out = SparkEntry.queries("tx_curriculum_order")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSeq == (1L to 8L),
      "shortest words rank first (easy → hard)")
    assert(out.map(_._3).toSeq == (0L to 7L), "dense global rank")
    assert(out.map(_._4).toSeq == Seq(0L, 0L, 1L, 1L, 2L, 2L, 3L, 3L),
      "4 contiguous stages of 2")
    // difficulty = chars/token incl. separators: 10 words of len L + 9
    // spaces over 10 tokens
    val d1 = out.find(_._1 == 1L).get._2
    assert(d1 == (10.0 * 2 + 9) / 10, s"doc 1 difficulty $d1")
  }

  test("sim_ann_filtered: the predicate reaches the candidate join — a " +
    "post-filtered top-k returns NOTHING on the same corpus") {
    import spark.implicits._
    // query 20 (label 0) sits in a tight label-0 cluster; the label-1
    // vectors are slightly farther. Unfiltered top-3 is all label 0, so
    // filtering AFTER a top-3 truncation yields the empty set — while
    // the filtered search must return the three label-1 neighbors.
    val base = Array.tabulate(8)(i => 1.0f + i * 0.5f)
    def near(eps: Float, dim: Int) =
      base.zipWithIndex.map { case (x, i) => if (i == dim) x + eps else x }
    val rows =
      Seq((20L, base, 0)) ++
        (1L to 5L).map(i => (i, near(0.001f, (i % 8).toInt), 0)) ++
        (11L to 13L).map(i => (i, near(0.05f, (i % 8).toInt), 1))
    val dir = java.nio.file.Files.createTempDirectory("graft_emb").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val filtered = SparkEntry.queries("sim_ann_filtered")(spark, dir).collect()
    assert(filtered.length == 3, s"filtered search fills k: ${filtered.length}")
    assert(filtered.forall(_.getInt(2) == 1), "every neighbor is cross-label")
    assert(filtered.map(_.getLong(1)).toSet == Set(11L, 12L, 13L))

    // the naive composition: unfiltered top-3, THEN the predicate
    val naive = SparkEntry.queries("sim_ann_multiprobe")(spark, dir).collect()
      .filter(_.getLong(0) == 20L)
    assert(naive.length == 3 && naive.forall(r => Set(1L, 2L, 3L, 4L, 5L)(r.getLong(1))),
      "unfiltered top-3 is all same-label")
    // post-filtering that truncated list against label != 0 leaves nothing
    assert(!naive.exists(r => r.getLong(1) >= 11L),
      "post-filter on the truncated top-k returns the empty set")
  }

  test("mm_modal_align: score equals an independently computed cosine of " +
    "the two towers, bounded in [-1, 1]") {
    import graft.functions.TextHashes
    val text = (1 to 20).map(i => f"tok$i%02d").mkString(" ")
    val dir = docsDir(Seq((1L, text, "en")))
    val row = SparkEntry.queries("mm_modal_align")(spark, dir).collect()
    assert(row.length == 1)
    val got = row.head.getDouble(1)
    // media tower: byte-fold mod 8; text tower: word-hash bucket counts
    val m = new Array[Double](8)
    text.getBytes("UTF-8").zipWithIndex.foreach { case (b, i) =>
      m(i % 8) += (b & 0xff) / 255.0
    }
    val t = new Array[Double](8)
    text.split(" ").foreach { w =>
      t((TextHashes.hash64("align:" + w) % 8).toInt) += 1.0
    }
    val dot = (0 until 8).map(k => m(k) * t(k)).sum
    val exp = BigDecimal(dot / (math.sqrt(m.map(x => x * x).sum) *
        math.sqrt(t.map(x => x * x).sum)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == exp, s"cosine $got vs independent $exp")
    assert(got >= -1.0 && got <= 1.0)
    assert(row.head.getBoolean(2) == (got >= 0.85), "gate applies the threshold")
  }
}
