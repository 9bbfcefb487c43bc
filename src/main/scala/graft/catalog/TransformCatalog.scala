package graft.catalog

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.Tables
import graft.functions.PortableHash

/** Per-record transform operators (SURVEY.md §2.8) and mutation operators
  * (§2.9), each demonstrated on the driver's test tables with a DuckDB
  * oracle. The record-domain implementations with reference-golden semantics
  * live in graft.transform / graft.operators; these catalog entries exercise
  * the same Spark primitives (higher-order functions, when-chains, coalesce
  * precedence, canonical checksums, merge-on-write upserts) on
  * oracle-checkable data.
  *
  * Everything here is a narrow projection/expression pipeline: no UDFs, all
  * codegen-friendly built-ins, so the operators stay inside whole-stage
  * codegen and scale linearly with input splits.
  */
object TransformCatalog extends Catalog {

  def queries: Map[String, QFn] = Map(

    // ── T2: split/rename extractor ('1-URGENT' → (1, 'URGENT')) ──
    "t2_split_rename" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          substring(col("o_orderpriority"), 1, 1).cast("long").as("urgency"),
          substring(col("o_orderpriority"), 3, 100).as("urgency_label"))
        .orderBy(col("o_orderkey"))
    }),

    // ── T3: hierarchical facet generator ["0/a","1/a/b","2/a/b/c"] ──
    "t3_hier_facet" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), slice(split(col("text"), " "), 1, 3).as("parts"))
        .select(col("doc_id"),
          array_join(transform(sequence(lit(1), size(col("parts"))),
            i => concat((i - 1).cast("string"), lit("/"),
              array_join(slice(col("parts"), lit(1), i), "/"))), "#").as("facet_hier"))
        .orderBy(col("doc_id"))
    }),

    // ── T4: prefix/contains rule type mapper (SIMBAD-style when-chain) ──
    "t4_type_mapper_rules" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          when(col("event_type").startsWith("c"), "Interaction")
            .when(col("event_type").startsWith("v"), "Interaction")
            .when(col("event_type").contains("purch"), "Transaction")
            .when(col("event_type").endsWith("up"), "Lifecycle")
            .otherwise("Other").as("mapped_type"))
        .orderBy(col("event_id"))
    }),

    // ── T5: lookup-table type mapper (NED-style map literal) ──
    "t5_type_mapper_lookup" -> ((s, d) => {
      val m = typedLit(Map("R" -> "Returned", "A" -> "Accepted", "N" -> "NoFlag"))
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") <= 500)
        .select(col("l_orderkey"), col("l_linenumber"),
          coalesce(element_at(m, col("l_returnflag")), lit("Other")).as("flag_class"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ── T6/T7/T8: projection extractors — select/rename/drop fields ──
    "t6_projection_rename" -> ((s, d) => {
      Tables.customer(s, d)
        .select(col("c_custkey").as("id"),
          col("c_name").as("verified_name"),
          col("c_mktsegment").as("segment"))
        .orderBy(col("id"))
    }),

    // ── T9: precedence coalesce (aff_raw else aff else existing doc value) ──
    "t9_precedence_coalesce" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          coalesce(
            when(col("value") > 200.0, col("props")),
            when(col("event_type") === "click", lit("clicked")),
            lit("none")).as("aff"))
        .orderBy(col("event_id"))
    }),

    // ── T11: JSON boost extraction with default-1 for missing fields ──
    "t11_boost_defaults" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          coalesce(get_json_object(col("props"), "$.k").cast("double"), lit(1.0)).as("k_boost"),
          coalesce(get_json_object(col("props"), "$.missing_boost").cast("double"), lit(1.0)).as("missing_boost"))
        .orderBy(col("event_id"))
    }),

    // ── T12: solr mtime formatting (ISO micro + Z) and max-timestamp rollup (A4) ──
    "t12_mtime_format" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as("bib_data_mtime"),
          date_format(greatest(col("ts"), lit("2024-01-20 00:00:00").cast("timestamp")),
            "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as("update_timestamp"))
        .orderBy(col("event_id"))
    }),

    // ── T13: precedence override with JSON fallback parse ──
    "t13_links_precedence" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          when(col("event_type") === "purchase",
            concat(lit("direct:"), col("user_id").cast("string")))
            .otherwise(concat(lit("parsed:"),
              coalesce(get_json_object(col("props"), "$.k"), lit("0")))).as("links_source"))
        .orderBy(col("event_id"))
    }),

    // ── T15: `has`-field computation — fields present with ≥1 alphanumeric ──
    "t15_has_fields" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          array_join(filter(array(
            when(col("lang").rlike("[0-9A-Za-z]"), lit("lang")),
            when(col("source").rlike("[0-9A-Za-z]"), lit("source")),
            when(col("text").rlike("[0-9A-Za-z]"), lit("text"))),
            x => x.isNotNull), "|").as("has"))
        .orderBy(col("doc_id"))
    }),

    // ── T16: identifier completeness — ensure canonical id ∈ identifier[] ──
    "t16_identifier_completeness" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          array_join(array_sort(array_union(
            array_distinct(slice(split(col("text"), " "), 1, 3)),
            array(col("source")))), "|").as("identifier"))
        .orderBy(col("doc_id"))
    }),

    // ── T17: canonical checksum — sorted-key serialization, volatile keys
    // dropped (n_chars plays the mtime role), then a 60-bit hash. Partition-
    // invariant: pure row-wise expression.
    "t17_canonical_checksum" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          PortableHash.hash64(concat(
            lit("lang="), col("lang"),
            lit("|source="), col("source"),
            lit("|text="), substring(col("text"), 1, 64))).as("checksum"))
        .orderBy(col("doc_id"))
    }),

    // ── T18: deterministic scix-id generation 'scix:XXXX-XXXX-XXXX' ──
    "t18_scix_id" -> ((s, d) => {
      val h = upper(md5(concat(col("source"), lit(":"), col("text"))))
      Tables.documents(s, d)
        .select(col("doc_id"),
          concat(lit("scix:"), substring(h, 1, 4), lit("-"),
            substring(h, 5, 4), lit("-"), substring(h, 9, 4)).as("scix_id"))
        .orderBy(col("doc_id"))
    }),

    // ── T19: XML url-entry rendering with &-escaping ──
    "t19_xml_render" -> ((s, d) => {
      val rawLoc = concat(lit("https://host/abs?id="), col("doc_id").cast("string"),
        lit("&src="), col("source"))
      val esc = regexp_replace(rawLoc, "&", "&amp;")
      Tables.documents(s, d)
        .select(col("doc_id"),
          concat(lit("  <url>\n    <loc>"), esc, lit("</loc>\n    <lastmod>"),
            lit("2026-08-12"), lit("</lastmod>\n  </url>\n")).as("url_entry"))
        .orderBy(col("doc_id"))
    }),

    // ── T20: date normalization — string → UTC timestamp round-trip ──
    "t20_date_normalize" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          to_timestamp(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
            "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("normalized_ts"))
        .orderBy(col("event_id"))
    }),

    // ── T21: record-to-JSON projection (deterministic field order) ──
    "t21_json_projection" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          concat(lit("{\"event_id\": "), col("event_id").cast("string"),
            lit(", \"event_type\": \""), col("event_type"),
            lit("\", \"user_id\": "), col("user_id").cast("string"),
            lit("}")).as("record_json"))
        .orderBy(col("event_id"))
    }),

    // ── M1: per-field typed upsert — latest update per (key, slot), pivot to
    // columns, full-outer-join master, newest-wins coalesce. This is the
    // batch shape of the reference's update_storage: one shuffle on the key
    // for the dedup window, one join keyed the same way.
    "m1_upsert_merge" -> ((s, d) => {
      // latest-per-slot via max_by over an (ts, event_id) ordering struct —
      // one hash aggregation with map-side combine instead of a ranking
      // window's shuffle + sort (same result as ROW_NUMBER()=1)
      val latest = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy(col("user_id"), col("event_type"))
        .agg(max_by(col("value"), struct(col("ts"), col("event_id"))).as("value"))
      val pivoted = latest.groupBy(col("user_id"))
        .agg(
          max(when(col("event_type") === "click", col("value"))).as("click_value"),
          max(when(col("event_type") === "purchase", col("value"))).as("purchase_value"))
      val master = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_acctbal"))
      master.join(pivoted, col("c_custkey") === col("user_id"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("user_id")).as("key"),
          col("click_value"), col("purchase_value"),
          coalesce(col("c_acctbal"), lit(0.0)).as("acctbal"),
          col("c_custkey").isNotNull.as("existed"))
        .orderBy(col("key"))
    }),

    // ── T22: collection-name URL rewrite — replace the collection path
    // segment of service URLs (run.py:235-255) ──
    "t22_collection_url_rewrite" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          concat(lit("http://solr/v2/collection1/update?src="), col("source")).as("url"))
        .select(col("doc_id"),
          regexp_replace(col("url"), "/collection1/", "/collection2/").as("rewritten"))
        .orderBy(col("doc_id"))
    }),

    // ── M5: bulk insert/update mappings — union of existing rows with an
    // incoming mapping batch, last-write-wins per key (the reference's
    // bulk_insert_mappings/bulk_update_mappings as one merge rewrite) ──
    "m5_bulk_upsert_mappings" -> ((s, d) => {
      val existing = Tables.customer(s, d)
        .select(col("c_custkey").as("key"), col("c_acctbal").as("val"),
          lit(0).as("gen"))
      val incoming = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("key"), col("o_totalprice").as("val"),
          lit(1).as("gen"))
      existing.unionByName(incoming)
        .groupBy(col("key"))
        .agg(max_by(col("val"), struct(col("gen"), col("val"))).as("val"),
          max(col("gen")).as("gen"))
        .orderBy(col("key"))
    }),

    // ── M3: rename with alias-graph maintenance (MergeEngine.renameBibcode)
    // — repoint the chain at the new key, add old→new, rewrite the master
    // key, then resolve the REPOINTED graph to fixpoint. The semi-join of
    // chain roots against the renamed master ties both outputs together:
    // if the master rewrite were skipped, every chain that now roots at
    // the new key would drop from the result. Rename itself is a map-side
    // column rewrite + one tiny union; the closure is the same pointer-
    // doubling loop as J7 (log-depth rounds, edge-partitioned joins). ──
    "m3_rename_alias" -> ((s, d) => {
      import s.implicits._
      val aliases = Tables.nation(s, d)
        .select(col("n_nationkey").cast("long").cast("string").as("key"),
          when(col("n_nationkey") % 5 === 0, col("n_nationkey"))
            .otherwise(col("n_nationkey") - 1).cast("long").cast("string").as("target"))
        .map(r => graft.records.IdentifierAlias(r.getString(0), r.getString(1)))
      val master = Tables.nation(s, d)
        .select(col("n_nationkey").cast("long").cast("string").as("bibcode"))
      val res = graft.operators.MergeEngine.renameBibcode(master, aliases, "0", "999")
      val roots = graft.operators.MergeEngine
        .resolveAliases(res.aliases.as[graft.records.IdentifierAlias])
        .select(col("key").cast("long").as("key"),
          col("target").cast("long").as("root"))
      roots.join(res.master.select(col("bibcode").cast("long").as("root")),
          Seq("root"), "left_semi")
        .select(col("key"), col("root"))
        .orderBy(col("key"))
    }),

    // ── M2: cascading delete — anti-join rewrite + affected-group recount ──
    "m2_delete_cascade" -> ((s, d) => {
      val doomed = Tables.documents(s, d).filter(col("lang") === "zh")
        .select(col("doc_id"))
      Tables.documents(s, d)
        .join(doomed, Seq("doc_id"), "left_anti")
        .groupBy(col("source")).agg(count(lit(1)).as("n_after"))
        .orderBy(col("source"))
    }),

    // ── M4: mark-processed bulk update — join-update on a key list ──
    "m4_mark_processed" -> ((s, d) => {
      val done = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("done_key"))
      Tables.orders(s, d)
        .join(done, col("o_orderkey") === col("done_key"), "left_outer")
        .select(col("o_orderkey"),
          when(col("done_key").isNotNull, "success").otherwise(col("o_orderstatus")).as("status"))
        .orderBy(col("o_orderkey"))
    }),

    // ── S5: bibcode-list file source — ids written to a newline file, read
    // back via spark.read (schema-on-read), then semi-joined to the master
    // table; mirrors run.py's file-driven reindex selection.
    "s5_file_source" -> ((s, d) => {
      import java.nio.file.{Files, Paths}
      val docs = Tables.documents(s, d)
      val ids = docs.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id")).collect().map(_.getLong(0))
      val listFile = Files.createTempDirectory("graft_bibcodes")
      Files.write(listFile.resolve("ids.txt"),
        ids.map(_.toString).mkString("\n").getBytes)
      val fromFile = s.read
        .schema(StructType(Seq(StructField("doc_id_str", StringType))))
        .csv(listFile.toString)
        .select(col("doc_id_str").cast("long").as("doc_id"))
      docs.join(fromFile, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    })
  )

  def oracle: Map[String, String] = Map(
    "t2_split_rename" ->
      """SELECT o_orderkey, CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS urgency,
           substr(o_orderpriority, 3, 100) AS urgency_label
         FROM orders ORDER BY o_orderkey""",
    "t3_hier_facet" ->
      """SELECT doc_id,
           array_to_string(
             list_transform(generate_series(1, len(string_split(text,' ')[1:3])),
               i -> CAST(i - 1 AS VARCHAR) || '/' ||
                    array_to_string(string_split(text,' ')[1:3][1:i], '/')), '#') AS facet_hier
         FROM documents ORDER BY doc_id""",
    "t4_type_mapper_rules" ->
      """SELECT event_id,
           CASE WHEN event_type LIKE 'c%' THEN 'Interaction'
                WHEN event_type LIKE 'v%' THEN 'Interaction'
                WHEN event_type LIKE '%purch%' THEN 'Transaction'
                WHEN event_type LIKE '%up' THEN 'Lifecycle'
                ELSE 'Other' END AS mapped_type
         FROM events ORDER BY event_id""",
    "t5_type_mapper_lookup" ->
      """SELECT l_orderkey, l_linenumber,
           CASE l_returnflag WHEN 'R' THEN 'Returned' WHEN 'A' THEN 'Accepted'
                WHEN 'N' THEN 'NoFlag' ELSE 'Other' END AS flag_class
         FROM lineitem WHERE l_orderkey <= 500
         ORDER BY l_orderkey, l_linenumber""",
    "t6_projection_rename" ->
      """SELECT c_custkey AS id, c_name AS verified_name, c_mktsegment AS segment
         FROM customer ORDER BY id""",
    "t9_precedence_coalesce" ->
      """SELECT event_id,
           COALESCE(CASE WHEN value > 200.0 THEN props END,
                    CASE WHEN event_type = 'click' THEN 'clicked' END,
                    'none') AS aff
         FROM events ORDER BY event_id""",
    "t11_boost_defaults" ->
      """SELECT event_id,
           COALESCE(CAST(json_extract(props, '$.k') AS DOUBLE), 1.0) AS k_boost,
           COALESCE(CAST(json_extract(props, '$.missing_boost') AS DOUBLE), 1.0) AS missing_boost
         FROM events ORDER BY event_id""",
    "t12_mtime_format" ->
      """SELECT event_id,
           strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ') AS bib_data_mtime,
           strftime(greatest(ts, TIMESTAMP '2024-01-20'), '%Y-%m-%dT%H:%M:%S.%fZ') AS update_timestamp
         FROM events ORDER BY event_id""",
    "t13_links_precedence" ->
      """SELECT event_id,
           CASE WHEN event_type = 'purchase' THEN 'direct:' || CAST(user_id AS VARCHAR)
                ELSE 'parsed:' || COALESCE(json_extract_string(props, '$.k'), '0') END AS links_source
         FROM events ORDER BY event_id""",
    "t15_has_fields" ->
      """SELECT doc_id,
           array_to_string(
             list_filter([CASE WHEN regexp_matches(lang, '[0-9A-Za-z]') THEN 'lang' END,
                          CASE WHEN regexp_matches(source, '[0-9A-Za-z]') THEN 'source' END,
                          CASE WHEN regexp_matches(text, '[0-9A-Za-z]') THEN 'text' END],
                         x -> x IS NOT NULL), '|') AS has
         FROM documents ORDER BY doc_id""",
    "t16_identifier_completeness" ->
      """SELECT doc_id,
           array_to_string(list_sort(list_distinct(list_concat(
             list_distinct(string_split(text,' ')[1:3]), [source]))), '|') AS identifier
         FROM documents ORDER BY doc_id""",
    "t17_canonical_checksum" ->
      ("""SELECT doc_id, """ + PortableHash.hash64Sql(
        "'lang=' || lang || '|source=' || source || '|text=' || substr(text, 1, 64)") +
        """ AS checksum FROM documents ORDER BY doc_id"""),
    "t18_scix_id" ->
      """SELECT doc_id,
           'scix:' || substr(upper(md5(source || ':' || text)), 1, 4) || '-' ||
           substr(upper(md5(source || ':' || text)), 5, 4) || '-' ||
           substr(upper(md5(source || ':' || text)), 9, 4) AS scix_id
         FROM documents ORDER BY doc_id""",
    "t19_xml_render" ->
      """SELECT doc_id,
           '  <url>' || chr(10) || '    <loc>' ||
           replace('https://host/abs?id=' || CAST(doc_id AS VARCHAR) || '&src=' || source, '&', '&amp;') ||
           '</loc>' || chr(10) || '    <lastmod>2026-08-12</lastmod>' || chr(10) || '  </url>' || chr(10) AS url_entry
         FROM documents ORDER BY doc_id""",
    "t20_date_normalize" ->
      """SELECT event_id,
           strptime(strftime(ts, '%Y-%m-%dT%H:%M:%S.%f'), '%Y-%m-%dT%H:%M:%S.%f') AS normalized_ts
         FROM events ORDER BY event_id""",
    "t21_json_projection" ->
      """SELECT event_id,
           '{"event_id": ' || CAST(event_id AS VARCHAR) ||
           ', "event_type": "' || event_type ||
           '", "user_id": ' || CAST(user_id AS VARCHAR) || '}' AS record_json
         FROM events ORDER BY event_id""",
    "m1_upsert_merge" ->
      """WITH latest AS (
           SELECT user_id, event_type, value FROM (
             SELECT user_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
             FROM events WHERE event_type IN ('click','purchase')) t WHERE rn = 1),
         pivoted AS (
           SELECT user_id,
             MAX(CASE WHEN event_type = 'click' THEN value END) AS click_value,
             MAX(CASE WHEN event_type = 'purchase' THEN value END) AS purchase_value
           FROM latest GROUP BY user_id)
         SELECT COALESCE(c.c_custkey, p.user_id) AS key,
           p.click_value, p.purchase_value,
           COALESCE(c.c_acctbal, 0.0) AS acctbal,
           (c.c_custkey IS NOT NULL) AS existed
         FROM (SELECT c_custkey, c_acctbal FROM customer) c
         FULL OUTER JOIN pivoted p ON c.c_custkey = p.user_id
         ORDER BY key""",
    "t22_collection_url_rewrite" ->
      """SELECT doc_id,
           replace('http://solr/v2/collection1/update?src=' || source,
             '/collection1/', '/collection2/') AS rewritten
         FROM documents ORDER BY doc_id""",
    "m5_bulk_upsert_mappings" ->
      """WITH u AS (
           SELECT c_custkey AS key, c_acctbal AS val, 0 AS gen FROM customer
           UNION ALL
           SELECT o_custkey, o_totalprice, 1 FROM orders WHERE o_orderpriority = '1-URGENT')
         SELECT key,
           CASE WHEN max(gen) = 1 THEN max(CASE WHEN gen = 1 THEN val END)
                ELSE max(val) END AS val,
           max(gen) AS gen
         FROM u GROUP BY key ORDER BY key""",
    "m3_rename_alias" ->
      """WITH RECURSIVE mapping AS (
           SELECT CAST(n_nationkey AS BIGINT) AS key,
                  CAST(CASE WHEN n_nationkey % 5 = 0 THEN n_nationkey
                       ELSE n_nationkey - 1 END AS BIGINT) AS target
           FROM nation),
         renamed AS (
           SELECT key, CASE WHEN target = 0 THEN 999 ELSE target END AS target
           FROM mapping
           UNION SELECT 0, 999),
         walk(key, target) AS (
           SELECT key, target FROM renamed
           UNION ALL
           SELECT w.key, m.target FROM walk w JOIN renamed m ON w.target = m.key
           WHERE w.target <> m.target),
         roots AS (
           SELECT w.key, MIN(w.target) AS root FROM walk w
           WHERE NOT EXISTS (SELECT 1 FROM renamed r
             WHERE r.key = w.target AND r.target <> w.target)
           GROUP BY w.key),
         master AS (
           SELECT CAST(CASE WHEN n_nationkey = 0 THEN 999
                       ELSE n_nationkey END AS BIGINT) AS bibcode
           FROM nation)
         SELECT r.key, r.root FROM roots r
         WHERE EXISTS (SELECT 1 FROM master m WHERE m.bibcode = r.root)
         ORDER BY r.key""",
    "m2_delete_cascade" ->
      """SELECT source, COUNT(*) AS n_after FROM documents
         WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE lang = 'zh')
         GROUP BY source ORDER BY source""",
    "m4_mark_processed" ->
      """SELECT o_orderkey,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 'success' ELSE o_orderstatus END AS status
         FROM orders ORDER BY o_orderkey""",
    "s5_file_source" ->
      """SELECT doc_id, source FROM documents WHERE doc_id % 7 = 0 ORDER BY doc_id"""
  )
}
