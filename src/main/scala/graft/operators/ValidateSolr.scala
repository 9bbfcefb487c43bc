package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._

import graft.functions.SequenceRatio

/** Port of the reference's SOLR-vs-SOLR output validator
  * (adsmp/validate.py:11-233, run.py:864-889 `-c/--validate_solr`): compare
  * the same bibcodes across an old and a new search core, field by field,
  * with the reference's per-field tolerance rules.
  *
  * Two surfaces:
  *   - [[compareBibcodes]]: the CLI shape — a bounded bibcode list fetched
  *     from two pluggable per-document fetchers (the reference does two HTTP
  *     queries per bibcode), distributed over partitions so a million-line
  *     bibcode file still fans out.
  *   - [[compareDocs]]: the engine shape — two whole-core document dumps as
  *     DataFrames `(bibcode, doc-json)`, full-outer-joined on bibcode and
  *     compared row-wise. This is the 100 TB path: one shuffle on the join
  *     key, no driver loop, no per-doc HTTP.
  */
object ValidateSolr {

  /** run.py:865-879: the full field list the validator walks. */
  val Fields: Seq[String] = Seq(
    "abstract", "ack", "aff", "alternate_bibcode", "alternate_title",
    "arxiv_class", "author", "author_count", "author_facet",
    "author_facet_hier", "author_norm", "bibgroup", "bibgroup_facet",
    "bibstem", "bibstem_facet", "body", "citation", "citation_count",
    "cite_read_boost", "classic_factor", "comment", "copyright", "data",
    "data_count", "data_facet", "database", "date", "doctype",
    "doctype_facet_hier", "doi", "eid", "editor", "email", "entry_date",
    "esources", "facility", "first_author", "first_author_facet_hier",
    "first_author_norm", "fulltext_mtime", "grant", "grant_facet_hier", "id",
    "identifier", "indexstamp", "ISBN", "ISSN", "issue", "keyword",
    "keyword_facet", "keyword_norm", "keyword_schema", "lang", "links_data",
    "metadata_mtime", "metrics_mtime", "nedid", "nedtype",
    "ned_object_facet_hier", "nonbib_mtime", "origin", "orcid_mtime", "orcid",
    "orcid_pub", "orcid_user", "orcid_other", "page", "page_range",
    "page_count", "property", "pub", "pub_raw", "pubdate", "pubnote",
    "read_count", "reader", "recid", "reference",
    "simbad_object_facet_hier", "simbid", "simbtype", "title",
    "update_timestamp", "vizier", "vizier_facet", "volume", "year")

  /** run.py:881-882: volatile fields never compared. */
  val IgnoreFields: Set[String] = Set(
    "id", "indexstamp", "fulltext_mtime", "links_data", "metadata_mtime",
    "metrics_mtime", "nonbib_mtime", "orcid_mtime", "recid",
    "update_timestamp")

  /** run.py:884-885: fields the new pipeline must populate. */
  val NewFields: Set[String] = Set(
    "data_count", "editor", "entry_date", "esources", "nedid", "nedtype",
    "ned_object_facet_hier", "origin", "page_count", "page_range")

  /** validate.py fields_match return values, as a closed enum. */
  sealed trait FieldResult extends Serializable
  case object Matched extends FieldResult
  case object Mismatched extends FieldResult
  /** required new field absent from both docs */
  case object MissingRequiredNew extends FieldResult
  /** absent from both docs, not a required-new field */
  case object NotInEither extends FieldResult
  case object NotInOld extends FieldResult
  case object NotInNew extends FieldResult

  /** Per-bibcode outcome (validate.py pipeline_mismatch counters plus the
    * doc-presence classification from compare_solr:58-69). */
  case class Report(
      bibcode: String,
      status: String, // ok | mismatch | missing-old | missing-new | missing-both
      mismatched: Seq[String], // field names that hard-mismatched
      missingRequired: Int, // required new fields in neither doc
      missing: Int, // fields in neither doc (includes the required ones)
      notInOld: Int,
      notInNew: Int)

  private def num(v: JValue): Option[Double] = v match {
    case JInt(i) => Some(i.toDouble)
    case JLong(l) => Some(l.toDouble)
    case JDouble(d) => Some(d)
    case JDecimal(d) => Some(d.toDouble)
    case JBool(b) => Some(if (b) 1d else 0d) // Python bool is an int
    case _ => None
  }

  private def str(v: JValue): Option[String] =
    v match { case JString(s) => Some(s); case _ => None }

  private def strList(v: JValue): Option[Seq[String]] = v match {
    case JArray(xs) =>
      val ss = xs.collect { case JString(s) => s }
      if (ss.length == xs.length) Some(ss) else None
    case _ => None
  }

  /** Python `==` over parsed JSON: numbers compare by value (3 == 3.0),
    * containers element-wise. */
  private def pyEq(a: JValue, b: JValue): Boolean = (a, b) match {
    case (JArray(xs), JArray(ys)) =>
      xs.length == ys.length && xs.lazyZip(ys).forall(pyEq)
    case (JObject(xs), JObject(ys)) =>
      val (mx, my) = (xs.toMap, ys.toMap)
      mx.keySet == my.keySet && mx.forall { case (k, v) => pyEq(v, my(k)) }
    case _ =>
      (num(a), num(b)) match {
        case (Some(x), Some(y)) => x == y
        case _ => a == b
      }
  }

  /** validate.py:125-233 fields_match: presence classification, then the
    * per-field tolerance rules, then generic equality with a fuzzy-string
    * escape hatch (SequenceMatcher ratio ≥ 0.8 counts as a match). */
  def fieldsMatch(field: String, oldDoc: Map[String, JValue],
      newDoc: Map[String, JValue]): FieldResult = {
    (oldDoc.get(field), newDoc.get(field)) match {
      case (None, None) =>
        if (NewFields(field)) MissingRequiredNew else NotInEither
      case (None, Some(_)) => NotInOld
      case (Some(_), None) => NotInNew
      case (Some(f1), Some(f2)) =>
        field match {
          // citations: order-insensitive (validate.py:145-151)
          case "citation" =>
            (strList(f1), strList(f2)) match {
              case (Some(a), Some(b)) =>
                if (a.sorted == b.sorted) Matched else Mismatched
              case _ => generic(field, f1, f2)
            }
          // citation_count may drift by up to 3 (validate.py:153-160)
          case "citation_count" =>
            (num(f1), num(f2)) match {
              case (Some(a), Some(b)) =>
                if (math.abs(a - b) > 3) Mismatched else Matched
              case _ => generic(field, f1, f2)
            }
          // cite_read_boost: both-zero ok, one-zero mismatch, else ±10%
          // relative to the old value (validate.py:162-176)
          case "cite_read_boost" =>
            (num(f1), num(f2)) match {
              case (Some(a), Some(b)) =>
                if (a == 0d && b == 0d) Matched
                else if (a == 0d || b == 0d) Mismatched
                else if (math.abs(a - b) / a > 0.1) Mismatched
                else Matched
              case _ => generic(field, f1, f2)
            }
          // data: CDS renamed to SIMBAD between pipelines; drop one of each
          // then compare order-insensitively (validate.py:178-188)
          case "data" =>
            (strList(f1), strList(f2)) match {
              case (Some(a), Some(b)) =>
                val (a2, b2) =
                  if (a.contains("CDS") && b.contains("SIMBAD"))
                    (removeFirst(a, "CDS"), removeFirst(b, "SIMBAD"))
                  else (a, b)
                if (a2.sorted == b2.sorted) Matched else Mismatched
              case _ => generic(field, f1, f2)
            }
          // doctype: intechreport was renamed techreport (validate.py:190-192)
          case "doctype" if f1 == JString("intechreport") &&
              f2 == JString("techreport") => Matched
          // identifier: order changed between pipelines (validate.py:194-200)
          case "identifier" =>
            (strList(f1), strList(f2)) match {
              case (Some(a), Some(b)) =>
                if (a.sorted == b.sorted) Matched else Mismatched
              case _ => generic(field, f1, f2)
            }
          // reference: count-only, ordering confuses the diff
          // (validate.py:202-210)
          case "reference" =>
            (f1, f2) match {
              case (JArray(a), JArray(b)) =>
                if (a.length == b.length) Matched else Mismatched
              case _ => generic(field, f1, f2)
            }
          case _ => generic(field, f1, f2)
        }
    }
  }

  /** validate.py:212-233: exact equality, except nearly-identical strings
    * (ratio ≥ 0.8) pass as "slightly different". */
  private def generic(field: String, f1: JValue, f2: JValue): FieldResult =
    if (pyEq(f1, f2)) Matched
    else (str(f1), str(f2)) match {
      case (Some(a), Some(b)) =>
        if (SequenceRatio.ratio(a, b) < 0.8) Mismatched else Matched
      case _ => Mismatched
    }

  private def removeFirst(xs: Seq[String], x: String): Seq[String] = {
    val i = xs.indexOf(x)
    if (i < 0) xs else xs.patch(i, Nil, 1)
  }

  private def toMap(doc: JValue): Map[String, JValue] = doc match {
    case JObject(fields) => fields.toMap
    case _ => Map.empty
  }

  /** validate.py pipeline_mismatch over one bibcode's doc pair. */
  def compare(bibcode: String, oldDoc: JValue, newDoc: JValue): Report = {
    val (m1, m2) = (toMap(oldDoc), toMap(newDoc))
    var mismatched = List.empty[String]
    var missingRequired = 0
    var missing = 0
    var notInOld = 0
    var notInNew = 0
    for (f <- Fields if !IgnoreFields(f)) fieldsMatch(f, m1, m2) match {
      case Mismatched => mismatched ::= f
      case MissingRequiredNew => missingRequired += 1; missing += 1
      case NotInEither => missing += 1
      case NotInOld => notInOld += 1
      case NotInNew => notInNew += 1
      case Matched => ()
    }
    Report(bibcode, if (mismatched.isEmpty) "ok" else "mismatch",
      mismatched.reverse, missingRequired, missing, notInOld, notInNew)
  }

  /** One document's JSON by bibcode, or None when the core doesn't have it
    * (the reference's per-bibcode `query_solr` call, validate.py:74-91). */
  trait DocFetcher extends Serializable {
    def fetch(bibcode: String): Option[String]
  }

  /** CLI path (`-c`): distribute the bibcode list, fetch both docs per
    * bibcode partition-locally, classify presence, compare. */
  def compareBibcodes(spark: SparkSession, bibcodes: Seq[String],
      oldCore: DocFetcher, newCore: DocFetcher): Dataset[Report] = {
    import spark.implicits._
    spark.createDataset(bibcodes).map { bib =>
      reportFor(bib, oldCore.fetch(bib), newCore.fetch(bib))
    }
  }

  /** Engine path: two whole-core dumps `(bibcode, doc)` joined on bibcode.
    * Equi-join shuffle only; comparison is map-side after the join. */
  def compareDocs(oldDocs: DataFrame, newDocs: DataFrame): Dataset[Report] = {
    val spark = oldDocs.sparkSession
    import spark.implicits._
    oldDocs.select(col("bibcode"), col("doc").as("old_doc"))
      .join(newDocs.select(col("bibcode"), col("doc").as("new_doc")),
        Seq("bibcode"), "full_outer")
      .select(col("bibcode"), col("old_doc"), col("new_doc"))
      .as[(String, Option[String], Option[String])]
      .map { case (bib, o, n) => reportFor(bib, o, n) }
  }

  private def reportFor(bib: String, oldJson: Option[String],
      newJson: Option[String]): Report = (oldJson, newJson) match {
    case (None, None) => Report(bib, "missing-both", Nil, 0, 0, 0, 0)
    case (None, Some(_)) => Report(bib, "missing-old", Nil, 0, 0, 0, 0)
    case (Some(_), None) => Report(bib, "missing-new", Nil, 0, 0, 0, 0)
    case (Some(o), Some(n)) =>
      compare(bib, graft.transform.SolrTransform.parse(o),
        graft.transform.SolrTransform.parse(n))
  }
}
