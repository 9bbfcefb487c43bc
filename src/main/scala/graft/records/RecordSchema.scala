package graft.records

import java.sql.Timestamp

/** The master-record data model (reference: adsmp/models.py:47-124).
  *
  * One row per bibcode. The eight payload slots are semi-structured JSON
  * documents stored as strings (schema-on-read, like the reference's
  * Postgres Text columns); each has a companion `*_updated` arrival
  * timestamp. Sink bookkeeping (`*_processed`, `*_checksum`, `status`)
  * drives checksum-based change suppression and failure re-drives.
  *
  * As a Spark `Dataset[MasterRecord]` this maps to a fixed-width columnar
  * schema: Catalyst prunes unused payload columns at the parquet scan
  * (e.g. a metrics-only index pass never reads `fulltext`), which is the
  * engine's substitute for the reference's `load_only` field lists
  * (adsmp/tasks.py:349-357). At cluster scale the master table is stored
  * partitioned (bucketed by bibcode hash) so merge joins co-locate.
  */
case class MasterRecord(
    id: Long,
    bibcode: String,
    scix_id: Option[String],
    // payload slots (JSON documents as strings)
    bib_data: Option[String],
    nonbib_data: Option[String],
    orcid_claims: Option[String],
    fulltext: Option[String],
    metrics: Option[String],
    augments: Option[String],
    classifications: Option[String], // JSON array of collection names
    boost_factors: Option[String],
    // per-slot arrival timestamps
    bib_data_updated: Option[Timestamp],
    nonbib_data_updated: Option[Timestamp],
    orcid_claims_updated: Option[Timestamp],
    fulltext_updated: Option[Timestamp],
    metrics_updated: Option[Timestamp],
    augments_updated: Option[Timestamp],
    classifications_updated: Option[Timestamp],
    boost_factors_updated: Option[Timestamp],
    // record-level bookkeeping
    created: Option[Timestamp],
    updated: Option[Timestamp],
    processed: Option[Timestamp],
    solr_processed: Option[Timestamp],
    metrics_processed: Option[Timestamp],
    datalinks_processed: Option[Timestamp],
    solr_checksum: Option[String],
    metrics_checksum: Option[String],
    datalinks_checksum: Option[String],
    status: Option[String])

object MasterRecord {
  /** Empty record for a fresh bibcode (get-or-create arm of the upsert). */
  def empty(bibcode: String, id: Long = 0L): MasterRecord =
    MasterRecord(id, bibcode, None, None, None, None, None, None, None, None,
      None, None, None, None, None, None, None, None, None, None, None, None,
      None, None, None, None, None, None, None)

  /** Payload slot names in reference column order (models.py:53-63). */
  val slots: Seq[String] = Seq(
    "bib_data", "nonbib_data", "orcid_claims", "fulltext",
    "metrics", "augments", "classifications", "boost_factors")

  /** Message-type → slot mapping (adsmp/app.py:134-172). */
  val typeToSlot: Map[String, String] = Map(
    "metadata" -> "bib_data", "bib_data" -> "bib_data",
    "nonbib_data" -> "nonbib_data", "orcid_claims" -> "orcid_claims",
    "fulltext" -> "fulltext", "metrics" -> "metrics",
    "augment" -> "augments", "classify" -> "classifications",
    "boost" -> "boost_factors")
}

/** One ingest message: the reference's protobuf queue payload reduced to
  * its information content (adsmp/app.py:335-379). `mtype` is one of the
  * keys of [[MasterRecord.typeToSlot]]; `payload` is the JSON document.
  * `status = Some("deleted")` marks the protobufs' deletion flag
  * (adsmp/tasks.py:60-77): on a slot-typed message it clears that slot;
  * on a `metadata` message it deletes the whole record (the reference
  * routes it to task_delete_documents). */
case class UpdateMessage(bibcode: String, mtype: String, payload: String,
    ts: Timestamp, status: Option[String] = None)

/** Append-only audit log row (reference: adsmp/models.py:127-141). */
case class ChangeLogEntry(key: String, ctype: String, oldvalue: Option[String], permanent: Boolean = false)

/** Identifier alias edge: key → most-recent canonical bibcode
  * (reference: adsmp/models.py:144-152). */
case class IdentifierAlias(key: String, target: String)

/** Sitemap assignment row (reference: adsmp/models.py:154-191). */
case class SitemapEntry(
    record_id: Long,
    bibcode: String,
    sitemap_filename: String,
    bib_data_updated: Option[Timestamp],
    filename_lastmoddate: Option[Timestamp],
    update_flag: Boolean)
