package graft.catalog

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.PortableHash

/** Text-analysis operators for a large-scale training-data pipeline:
  * language ID, quality scoring, token counting, document fingerprinting.
  * All pure column expressions (whole-stage codegen, no UDFs), each with an
  * exact DuckDB oracle.
  *
  * At 100 TB these are embarrassingly parallel map-side transforms: no
  * shuffle, cost scales with input splits, and the regex/hash work happens
  * next to the parquet scan with only the projected columns read.
  */
object TextCatalog extends Catalog {

  private val StopEn = Seq("the", "a", "of", "and")
  private val StopFr = Seq("le", "la", "et", "les")
  private val StopEs = Seq("el", "los", "y", "que")
  private val StopDe = Seq("der", "die", "und", "das")

  def queries: Map[String, QFn] = Map(

    // ── Language ID: marker-word scoring with deterministic tie-break.
    // (A real corpus would use char-n-gram profiles; the scoring/argmax
    // plumbing is identical and that is what the oracle pins down.)
    "tx_lang_id" -> ((s, d) => {
      val words = split(col("text"), " ")
      def hits(markers: Seq[String]) =
        size(filter(words, w => w.isInCollection(markers))).cast("long")
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          hits(StopEn).as("en_hits"), hits(StopFr).as("fr_hits"),
          hits(StopEs).as("es_hits"), hits(StopDe).as("de_hits"))
        .withColumn("best",
          greatest(col("en_hits"), col("fr_hits"), col("es_hits"), col("de_hits")))
        .select(col("doc_id"), col("lang"),
          when(col("best") === 0, "und")
            .when(col("en_hits") === col("best"), "en")
            .when(col("fr_hits") === col("best"), "fr")
            .when(col("es_hits") === col("best"), "es")
            .otherwise("de").as("predicted_lang"))
        .orderBy(col("doc_id"))
    }),

    // ── Quality scoring: length / word-shape / stopword-ratio features ──
    "tx_quality_score" -> ((s, d) => {
      val words = split(col("text"), " ")
      val nWords = size(words).cast("long")
      val charLen = length(regexp_replace(col("text"), " ", "")).cast("double")
      val stopHits = size(filter(words, w => w.isInCollection(StopEn))).cast("double")
      val avgWordLen = charLen / nWords.cast("double")
      val score =
        least(nWords.cast("double") / 100.0, lit(1.0)) * 0.5 +
          (stopHits / nWords.cast("double")) * 0.3 +
          (lit(1.0) - least(abs(avgWordLen - 4.0) / 4.0, lit(1.0))) * 0.2
      Tables.documents(s, d)
        .select(col("doc_id"), nWords.as("n_words"),
          round(avgWordLen, 6).as("avg_word_len"),
          round(score, 6).as("quality_score"))
        .orderBy(col("doc_id"))
    }),

    // ── Token counting: whitespace tokens + BPE-ish regex pre-tokenizer ──
    "tx_token_count" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("ws_tokens"),
          size(regexp_extract_all(col("text"),
            lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long").as("re_tokens"))
        .orderBy(col("doc_id"))
    }),

    // ── Deterministic stratified sampling: hash-bucket the doc key and
    // keep a per-language permille rate. No RNG — the sample is
    // reproducible across runs/retries (a rerun of a failed partition
    // must select the same rows), and at 100 TB it is a pure map-side
    // filter that pushes nothing through a shuffle. The hash is salted so
    // the sample is independent of every other hash use of doc_id. ──
    "tx_sample_hash" -> ((s, d) => {
      val rate = when(col("lang") === "en", 500L)
        .when(col("lang").isin("fr", "es"), 250L)
        .otherwise(100L)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          pmod(PortableHash.hash64(concat(lit("sample:"), col("doc_id").cast("string"))),
            lit(1000L)).as("bucket"), rate.as("rate_permille"))
        .withColumn("sampled", col("bucket") < col("rate_permille"))
        .orderBy(col("doc_id"))
    }),

    // ── Token-budget shard packing (graft.operators.Packing): documents
    // fill fixed-budget training shards per language in doc_id order via a
    // DISTRIBUTED exclusive prefix sum — range-partition on (lang,
    // doc_id), per-(partition, lang) subtotals, broadcast offsets,
    // partition-local window. A plain lang-partitioned window would
    // funnel each language through one task at scale. ──
    "tx_pack_budget" -> ((s, d) => {
      val withTokens = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
      graft.operators.Packing
        .packByBudget(withTokens, "lang", "doc_id", "n_tokens", budget = 2000L)
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          col("cum_before"), col("shard_id"))
        .orderBy(col("doc_id"))
    }),

    // ── Document fingerprint: min rolling-hash over 5-gram word shingles ──
    "tx_fingerprint" -> ((s, d) => {
      val words = split(col("text"), " ")
      val shingles = transform(
        sequence(lit(1), greatest(size(words) - 4, lit(1))),
        i => array_join(slice(words, i, lit(5)), " "))
      Tables.documents(s, d)
        .select(col("doc_id"),
          array_min(transform(shingles, sh => PortableHash.hash64(sh))).as("fingerprint"))
        .orderBy(col("doc_id"))
    })
  )

  private def hitsSql(markers: Seq[String]) =
    s"CAST(len(list_filter(string_split(text, ' '), w -> list_contains(${markers.mkString("['", "','", "']")}, w))) AS BIGINT)"

  def oracle: Map[String, String] = Map(
    "tx_lang_id" ->
      s"""WITH scored AS (
           SELECT doc_id, lang,
             ${hitsSql(StopEn)} AS en_hits, ${hitsSql(StopFr)} AS fr_hits,
             ${hitsSql(StopEs)} AS es_hits, ${hitsSql(StopDe)} AS de_hits
           FROM documents)
         SELECT doc_id, lang,
           CASE WHEN greatest(en_hits, fr_hits, es_hits, de_hits) = 0 THEN 'und'
                WHEN en_hits = greatest(en_hits, fr_hits, es_hits, de_hits) THEN 'en'
                WHEN fr_hits = greatest(en_hits, fr_hits, es_hits, de_hits) THEN 'fr'
                WHEN es_hits = greatest(en_hits, fr_hits, es_hits, de_hits) THEN 'es'
                ELSE 'de' END AS predicted_lang
         FROM scored ORDER BY doc_id""",
    "tx_quality_score" ->
      s"""WITH f AS (
           SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(length(replace(text, ' ', '')) AS DOUBLE) AS char_len,
             CAST(${hitsSql(StopEn)} AS DOUBLE) AS stop_hits
           FROM documents)
         SELECT doc_id, n_words,
           round(char_len / CAST(n_words AS DOUBLE), 6) AS avg_word_len,
           round(least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.5
                 + (stop_hits / CAST(n_words AS DOUBLE)) * 0.3
                 + (1.0 - least(abs(char_len / CAST(n_words AS DOUBLE) - 4.0) / 4.0, 1.0)) * 0.2,
                 6) AS quality_score
         FROM f ORDER BY doc_id""",
    "tx_token_count" ->
      """SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS re_tokens
         FROM documents ORDER BY doc_id""",
    "tx_sample_hash" ->
      s"""WITH b AS (SELECT doc_id, lang,
             ${PortableHash.hash64Sql("'sample:' || CAST(doc_id AS VARCHAR)")} % 1000 AS bucket,
             CASE WHEN lang = 'en' THEN 500
                  WHEN lang IN ('fr', 'es') THEN 250
                  ELSE 100 END::BIGINT AS rate_permille
           FROM documents)
         SELECT doc_id, lang, bucket, rate_permille,
           bucket < rate_permille AS sampled
         FROM b ORDER BY doc_id""",
    "tx_pack_budget" ->
      """WITH t AS (SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents)
         SELECT doc_id, lang, n_tokens,
           COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
           COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2000 AS shard_id
         FROM t ORDER BY doc_id""",
    "tx_fingerprint" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         sh AS (SELECT doc_id,
             list_transform(generate_series(1, greatest(len(words) - 4, 1)),
               i -> array_to_string(words[i:i+4], ' ')) AS shingles
           FROM w)
         SELECT doc_id,
           list_min(list_transform(shingles, s -> ${PortableHash.hash64Sql("s")})) AS fingerprint
         FROM sh ORDER BY doc_id"""
  )
}
