package graft.catalog

import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.Tables
import graft.records._
import graft.operators.{IndexJob, MergeEngine, Sitemap}
import graft.streaming.IngestStream

/** Record-domain pipeline operators surfaced to the driver's gate.
  *
  * Two kinds of entries:
  *  - oracle-checked: the real `Sitemap` implementation (distributed
  *    global ordinal, XML render) run over the driver's test tables with
  *    equivalent DuckDB SQL;
  *  - rows-only: the fixture-shaped flagship pipeline (T1 transform, M1
  *    record upsert, ST2 gate, full index job) whose semantics DuckDB SQL
  *    cannot express — these are golden-tested in ScalaTest instead
  *    (SolrTransformSpec/MergeEngineSpec/IndexJobSpec/IngestStreamSpec).
  */
object RecordCatalog extends Catalog {

  private def ts(s: String): Timestamp = Timestamp.from(java.time.Instant.parse(s))

  /** Deterministic fixture batch of update messages shaped like the
    * reference test corpus (FIXTURES.md §2). */
  private def fixtureUpdates(n: Int): Seq[UpdateMessage] =
    (1 to n).flatMap { i =>
      val bib = f"2024Fixt.$i%03d..001X"
      val t0 = ts("2024-01-01T00:00:00Z").getTime
      Seq(
        UpdateMessage(bib, "metadata",
          s"""{"bibcode": "$bib", "title": ["Fixture $i"], "database": ["astronomy"],
              "author_norm": ["Author, A$i"], "doctype": "article",
              "identifier": ["alt.$i"], "aff": ["-"]}""",
          new Timestamp(t0 + i * 1000)),
        UpdateMessage(bib, "nonbib_data",
          s"""{"boost": 0.${i % 10}, "data": ["MAST:$i", "SIMBAD:1"],
              "simbad_objects": ["$i sim*"], "grants": ["NASA $i"],
              "citation_count": $i}""",
          new Timestamp(t0 + i * 1000 + 100)),
        UpdateMessage(bib, "orcid_claims",
          s"""{"verified": ["0000-000$i"]}""", new Timestamp(t0 + i * 1000 + 200)),
        UpdateMessage(bib, "metrics",
          s"""{"reads": [$i, ${i * 2}], "citations": ["c$i"]}""",
          new Timestamp(t0 + i * 1000 + 300))) ++
        (if (i % 2 == 0) Seq(UpdateMessage(bib, "fulltext",
          s"""{"body": "body $i", "acknowledgements": "ack"}""",
          new Timestamp(t0 + i * 1000 + 400)))
        else Nil)
    }

  def queries: Map[String, QFn] = Map(

    // ── W1 on real data: the distributed global-ordinal bucketing, checked
    // against DuckDB's ROW_NUMBER (proves the offset arithmetic is exactly
    // a sequential fill even though no global sort happens) ──
    "w1_distributed_bucketing" -> ((s, d) => {
      Sitemap.assignFilenames(
        Tables.documents(s, d).select(col("doc_id").as("id"), col("source")),
        maxPerFile = 64, baseCount = 25)
        .select(col("id").as("doc_id"), col("sitemap_filename"))
        .orderBy(col("doc_id"))
    }),

    // ── S9/T19 on real data: whole-file XML render (group + ordered join) ──
    "s9_sitemap_render" -> ((s, d) => {
      val recs = Tables.documents(s, d)
        .select(col("doc_id").as("id"),
          concat(col("source"), lit("."), col("doc_id")).as("bibcode"),
          lit("2026-08-12").as("lastmod"))
      val assigned = Sitemap.assignFilenames(recs, maxPerFile = 100)
      Sitemap.renderFiles(assigned, Sitemap.Sites("ads"))
        .orderBy(col("sitemap_filename"))
    }),

    // ── T1 flagship transform on fixture records (rows-only; golden-tested
    // in SolrTransformSpec) ──
    "t1_solr_transform" -> ((s, _) => {
      import s.implicits._
      val master = MergeEngine.upsert(MergeEngine.emptyMaster(s),
        s.createDataset(fixtureUpdates(64))).master
      val selected = master.as[MasterRecord].filter(IndexJob.eligible(None, force = false))
      selected.map { r =>
        val (json, cks) = graft.transform.SolrTransform.render(
          graft.transform.SolrTransform.transform(r))
        (r.bibcode, json, cks)
      }.toDF("bibcode", "solr_json", "solr_checksum").orderBy("bibcode")
    }),

    // ── M1 record-shaped upsert incl. scix assignment (rows-only;
    // semantics in MergeEngineSpec) ──
    "m1_record_upsert" -> ((s, _) => {
      import s.implicits._
      val r1 = MergeEngine.upsert(MergeEngine.emptyMaster(s),
        s.createDataset(fixtureUpdates(32)))
      // second batch replays + updates half the records
      val second = fixtureUpdates(16).map(m =>
        m.copy(payload = m.payload.replace("Fixture", "Updated"),
          ts = new Timestamp(m.ts.getTime + 86400000L)))
      val r2 = MergeEngine.upsert(r1.master, s.createDataset(second))
      r2.master.select(col("bibcode"), col("scix_id"), col("bib_data"),
        col("updated")).orderBy("bibcode")
    }),

    // ── full index job: gate → transform → checksum suppression (rows-only;
    // semantics in IndexJobSpec) ──
    "idx_index_job" -> ((s, _) => {
      import s.implicits._
      val master = MergeEngine.upsert(MergeEngine.emptyMaster(s),
        s.createDataset(fixtureUpdates(48))).master
      val batch = IndexJob.run(master.as[MasterRecord]
        .filter(IndexJob.eligible(None, force = false)))
      batch.solr.orderBy("bibcode")
    }),

    // ── ST2 completeness gate run in batch mode over the same state
    // machine the stream uses (rows-only; semantics in IngestStreamSpec) ──
    "st2_completeness_gate" -> ((s, _) => {
      import s.implicits._
      val partial = fixtureUpdates(24).filterNot(m =>
        m.mtype == "orcid_claims" && m.bibcode.contains("Fixt.00"))
      IngestStream.completenessGate(s.createDataset(partial))
        .map(r => (r.bibcode, r.bib_data.isDefined, r.fulltext.isDefined))
        .toDF("bibcode", "has_bib", "has_fulltext").orderBy("bibcode")
    }))

  def oracle: Map[String, String] = Map(
    "w1_distributed_bucketing" ->
      """SELECT doc_id,
           'sitemap_bib_' || CAST(CAST(floor((ROW_NUMBER() OVER (ORDER BY doc_id) - 1 + 25) / 64) AS BIGINT) + 1 AS VARCHAR) || '.xml' AS sitemap_filename
         FROM documents ORDER BY doc_id""",
    "s9_sitemap_render" ->
      """WITH assigned AS (
           SELECT doc_id, source || '.' || CAST(doc_id AS VARCHAR) AS bibcode,
             'sitemap_bib_' || CAST(CAST(floor((ROW_NUMBER() OVER (ORDER BY doc_id) - 1) / 100) AS BIGINT) + 1 AS VARCHAR) || '.xml' AS sitemap_filename
           FROM documents),
         entries AS (
           SELECT sitemap_filename,
             string_agg(chr(10) || '<url><loc>https://ui.adsabs.harvard.edu/abs/' || bibcode ||
               '/abstract</loc><lastmod>2026-08-12</lastmod></url>', '' ORDER BY doc_id) AS url_entries
           FROM assigned GROUP BY sitemap_filename)
         SELECT sitemap_filename,
           '<?xml version="1.0" encoding="UTF-8"?>' || chr(10) ||
           '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">' || chr(10) ||
           url_entries || chr(10) || '</urlset>' AS content
         FROM entries ORDER BY sitemap_filename""")
}
