package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.json4s._
import java.sql.Timestamp

import graft.records.MasterRecord
import graft.transform.SolrTransform
import graft.functions.CanonicalJson

/** The §3.2 index job: select changed+complete records, build the three
  * sink payloads (SOLR doc, metrics row, resolver links), suppress
  * unchanged ones by checksum, and stamp the master table
  * (reference: run.py:103-232 + adsmp/tasks.py:317-460).
  *
  * Spark shape: the eligibility predicates (P1-P3) are Column expressions
  * that Catalyst pushes into the parquet scan of the master table; the
  * per-record transform runs in `Dataset.map` (no shuffle); checksum
  * change-suppression (P4) is a row-local comparison against the stored
  * checksum column. The reference's queue fan-out disappears — the three
  * payload builds share one scan.
  */
object IndexJob {

  /** generate_links_for_resolver (T14, adsmp/app.py:876-920): prefer
    * nonbib data_links_rows; else synthesize the two ESOURCE rows from the
    * bib links_data URL with the /abs/ → /pdf/ rewrite. */
  def linksForResolver(rec: MasterRecord): Option[JObject] = {
    val nonbib = rec.nonbib_data.map(SolrTransform.parse).getOrElse(JNothing)
    val rows = nonbib \ "data_links_rows"
    if (SolrTransform.truthy(rows))
      Some(JObject(List("bibcode" -> JString(rec.bibcode), "data_links_rows" -> rows)))
    else {
      val bib = rec.bib_data.map(SolrTransform.parse).getOrElse(JNothing)
      bib \ "links_data" match {
        case JArray(JString(first) :: _) =>
          (try Some(SolrTransform.parse(first)) catch { case _: Throwable => None })
            .flatMap { ld =>
              ld \ "url" match {
                case JString(url) if url.nonEmpty =>
                  val pdf = url.replace("/abs/", "/pdf/")
                  def row(u: String, sub: String): JObject = JObject(List(
                    "url" -> JArray(List(JString(u))), "title" -> JArray(List(JString(""))),
                    "item_count" -> JInt(0), "link_type" -> JString("ESOURCE"),
                    "link_sub_type" -> JString(sub)))
                  Some(JObject(List("bibcode" -> JString(rec.bibcode),
                    "data_links_rows" -> JArray(List(row(url, "EPRINT_HTML"), row(pdf, "EPRINT_PDF"))))))
                case _ => None
              }
            }
        case _ => None
      }
    }
  }

  /** Boost-pipeline request message (adsmp/app.py:774-801): a projection
    * of the record for the external boost scorer. */
  def boostRequest(rec: MasterRecord): JObject = JObject(List(
    "bibcode" -> JString(rec.bibcode),
    "scix_id" -> JString(rec.scix_id.getOrElse("")),
    "status" -> JString("updated"),
    "bib_data" -> JString(rec.bib_data.getOrElse("")),
    "metrics" -> JString(rec.metrics.getOrElse("")),
    "classifications" -> rec.classifications.map(SolrTransform.parse)
      .filter(SolrTransform.truthy).getOrElse(JArray(Nil)),
    "collections" -> JArray(Nil),
    "run_id" -> JInt(0),
    "output_path" -> JString("")))

  /** Affiliation-augment request (adsmp/app.py:628-653): sent only when
    * the bib data carries a non-empty aff list. */
  def affAugmentRequest(rec: MasterRecord): Option[JObject] = {
    val bib = rec.bib_data.map(SolrTransform.parse).getOrElse(JNothing)
    val aff = bib \ "aff"
    if (!SolrTransform.truthy(aff)) None
    else Some(JObject(List(
      "bibcode" -> JString(rec.bibcode),
      "aff" -> aff,
      "author" -> (bib \ "author" match { case JNothing => JString(""); case v => v }))))
  }

  /** Classifier-pipeline request (adsmp/app.py:655-727 prepare_bibcode +
    * request_classify): sent only when the bib data carries a non-empty
    * title; the title flattens to its first element like the reference's
    * protobuf build. `operationStep` is classify or classify_verify. */
  def classifyRequest(rec: MasterRecord, operationStep: String,
      outputPath: Option[String] = None): Option[JObject] = {
    val bib = rec.bib_data.map(SolrTransform.parse).getOrElse(JNothing)
    val title = bib \ "title" match {
      case JArray(JString(t) :: _) => t
      case JString(t) => t
      case _ => ""
    }
    if (title.isEmpty) None
    else Some(classifyEntry(rec.bibcode, title, bib \ "abstract" match {
      case JString(a) => a; case _ => "" }, operationStep, outputPath,
      scixId = Some(rec.scix_id.getOrElse(""))))
  }

  /** One classify_requests entry (app.py:711-719 auto, :746-755 manual —
    * the manual batch path also stamps `output_path`, the input file's
    * basename, so the classifier writes verdicts next to the request). */
  def classifyEntry(bibcode: String, title: String, abstractText: String,
      operationStep: String, outputPath: Option[String] = None,
      scixId: Option[String] = None): JObject =
    JObject(List(
      "bibcode" -> JString(bibcode)) ++
      scixId.map(s => "scix_id" -> JString(s): (String, JValue)).toList ++
      List(
        "title" -> (JString(title): JValue),
        "abstract" -> (JString(abstractText): JValue),
        "operation_step" -> (JString(operationStep): JValue)) ++
      outputPath.map(p => "output_path" -> JString(p): (String, JValue)).toList)

  /** Manual-mode classify entry resolution (app.py:735-755): a CSV row
    * carrying its own title or abstract is used as-is; otherwise the
    * store's bib_data is consulted (prepare_bibcode). Rows resolving to
    * no title are skipped, and every entry is stamped with `output_path`
    * (the input file's name sans extension, app.py:755) so the classifier
    * writes verdicts next to the request. */
  def manualClassifyEntry(bibcode: String, csvTitle: Option[String],
      csvAbstract: Option[String], bibData: Option[String],
      operationStep: String, outputPath: String): Option[JObject] = {
    val (title, abstr) =
      if (csvTitle.exists(_.nonEmpty) || csvAbstract.exists(_.nonEmpty))
        (csvTitle.getOrElse(""), csvAbstract.getOrElse(""))
      else {
        val bib = bibData.map(SolrTransform.parse).getOrElse(JNothing)
        (bib \ "title" match {
          case JArray(JString(t) :: _) => t
          case JString(t)              => t
          case _                       => ""
        }, bib \ "abstract" match { case JString(a) => a; case _ => "" })
      }
    if (title.isEmpty) None
    else Some(classifyEntry(bibcode, title, abstr, operationStep, Some(outputPath)))
  }

  /** One sink payload: bibcode, rendered JSON, its checksum, and whether
    * the checksum differs from the stored one (i.e. a write is due). */
  case class SinkPayload(bibcode: String, payload: String, checksum: String, changed: Boolean)

  case class IndexBatch(solr: DataFrame, metrics: DataFrame, links: DataFrame)

  private val Epoch1972 = Timestamp.valueOf("1972-01-01 00:00:00")

  /** Eligibility: P1 incremental + P2 completeness + P3 already-processed
    * suppression (run.py:147-159; adsmp/tasks.py:374-389). Pure column
    * expressions — pushed to the scan. */
  def eligible(since: Option[Timestamp], force: Boolean) = {
    val p1 = since.map(s => col("updated") >= lit(s)).getOrElse(lit(true))
    // run.py:153-159's outer skip: anything processed since its last
    // arrival is done, regardless of which OPTIONAL slots exist. Without
    // it a record that never received the optional augments slot can
    // never satisfy the four-slot alreadyDone check below and would be
    // re-transformed on every unbounded sweep — at the reference's 28.8M
    // rows that is a near-full reprocess per run
    val p0 =
      if (force) lit(true)
      else !(coalesce(col("processed"), lit(Epoch1972)) >
        coalesce(col("updated"), lit(Epoch1972)))
    val complete = col("bib_data_updated").isNotNull &&
      col("orcid_claims_updated").isNotNull && col("nonbib_data_updated").isNotNull
    val p2 = if (force) col("bib_data_updated").isNotNull else complete
    val processedOr1972 = coalesce(col("processed"), lit(Epoch1972))
    val alreadyDone =
      col("augments_updated").isNotNull && (col("augments_updated") < processedOr1972) &&
      col("bib_data_updated").isNotNull && (col("bib_data_updated") < processedOr1972) &&
      col("nonbib_data_updated").isNotNull && (col("nonbib_data_updated") < processedOr1972) &&
      col("orcid_claims_updated").isNotNull && (col("orcid_claims_updated") < processedOr1972)
    val p3 = if (force) lit(true) else !alreadyDone
    p0 && p1 && p2 && p3
  }

  /** Build the requested payload streams for one selection of master
    * records. `ignoreChecksums` mirrors --force_indexing (ST4 idempotence:
    * replaying a batch yields changed=false everywhere). `modes` mirrors
    * the reference's P9 per-mode `load_only` lists (adsmp/tasks.py:349-357):
    * a metrics-only run never references the other payload columns, so
    * Catalyst prunes them out of the parquet scan entirely. */
  def run(selected: Dataset[MasterRecord], ignoreChecksums: Boolean = false,
      modes: Set[String] = Set("solr", "metrics", "links")): IndexBatch = {
    val spark = selected.sparkSession
    import spark.implicits._

    def empty = spark.emptyDataset[SinkPayload].toDF()

    val solr = if (!modes("solr")) empty else selected.map { rec =>
      val doc = SolrTransform.transform(rec)
      // identifier completeness (T16, adsmp/tasks.py:398-402)
      val m = doc.obj.toMap
      val ids = m.get("identifier") match {
        case Some(JArray(xs)) => xs
        case _                => Nil
      }
      val withId =
        if (ids.contains(JString(rec.bibcode))) doc
        else JObject(doc.obj.filterNot(_._1 == "identifier") :+
          ("identifier" -> (JArray(ids :+ JString(rec.bibcode)): JValue)))
      val cks = CanonicalJson.checksumOf(withId)
      SinkPayload(rec.bibcode, CanonicalJson.serialize(withId), cks,
        !rec.solr_checksum.contains(cks))
    }.toDF()

    val metrics = if (!modes("metrics")) empty else selected.flatMap { rec =>
      rec.metrics.map { m =>
        val parsed = SolrTransform.parse(m)
        val cks = CanonicalJson.checksumOf(parsed)
        val withBib = parsed match {
          case JObject(fs) => JObject(fs.filterNot(_._1 == "bibcode") :+
            ("bibcode" -> (JString(rec.bibcode): JValue)))
          case other => other
        }
        SinkPayload(rec.bibcode, CanonicalJson.serialize(withBib), cks,
          !rec.metrics_checksum.contains(cks))
      }
    }.toDF()

    val links = if (!modes("links")) empty else selected.flatMap { rec =>
      linksForResolver(rec).map { payload =>
        val cks = CanonicalJson.checksumOf(payload)
        SinkPayload(rec.bibcode, CanonicalJson.serialize(payload), cks,
          !rec.datalinks_checksum.contains(cks))
      }
    }.toDF()

    def due(df: DataFrame): DataFrame =
      if (ignoreChecksums) df else df.filter(col("changed"))

    IndexBatch(due(solr), due(metrics), due(links))
  }
}
