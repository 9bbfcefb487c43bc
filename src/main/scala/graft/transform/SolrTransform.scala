package graft.transform

import org.json4s._
import org.json4s.jackson.JsonMethods
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset
import scala.collection.mutable

import graft.records.MasterRecord
import graft.functions.CanonicalJson

/** The flagship T1 operator: build one search document per master record by
  * folding the payload slots in arrival-timestamp order, newest last
  * (reference: adsmp/solr_updater.py:328-369,435-570).
  *
  * Slot semantics (solr_updater.py DB_COLUMN_DESTINATIONS):
  *   - `bib_data` splats its whole document into the output;
  *   - extractor slots contribute a computed sub-document that `update`s
  *     the output (later = newer slots overwrite earlier keys);
  *   - `id` copies the master row id;
  *   - `#timestamps` renders the five `*_mtime` stamps + `update_timestamp`.
  * Four explicit post-hoc override blocks then re-order priority for
  * links_data, bibgroup(_facet), bib-only open-access properties, boost
  * defaults and classifications (solr_updater.py:475-541), followed by
  * scix_id propagation and the `has` field scan (solr_updater.py:546-568).
  *
  * This is a pure per-row function — no shuffle, no state — so the engine
  * runs it inside `Dataset.map` with the payload JSON parsed once per row.
  * The Catalyst-visible pieces (facet hierarchies, type maps, coalesce
  * precedence) also exist as columnar catalog entries (TransformCatalog);
  * this typed path is the fidelity reference for the golden tests.
  */
object SolrTransform {

  val ExposeCollections: Seq[String] = Seq("astrophysics", "heliophysics", "planetary")

  val HasFields: Seq[String] = Seq(
    "abstract", "ack", "aff", "aff_id", "author", "bibgroup", "body",
    "citation", "comment", "credit", "data", "database", "doctype", "doi",
    "first_author", "grant", "identifier", "institution", "issue", "keyword",
    "mention", "orcid_other", "orcid_pub", "orcid_user", "origin", "property",
    "pub", "pub_raw", "publisher", "reference", "title", "uat", "volume")

  val BoostColumns: Seq[String] = Seq(
    "doctype_boost", "recency_boost", "boost_factor", "astronomy_final_boost",
    "physics_final_boost", "earth_science_final_boost",
    "planetary_science_final_boost", "heliophysics_final_boost",
    "general_final_boost")

  private val SolrStamp = DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").withZone(ZoneOffset.UTC)

  def solrStamp(ts: java.sql.Timestamp): String = SolrStamp.format(ts.toInstant)

  def parse(s: String): JValue =
    try JsonMethods.parse(s) catch { case _: Throwable => JNothing }

  def truthy(v: JValue): Boolean = v match {
    case JNothing | JNull => false
    case JString(s)       => s.nonEmpty
    case JArray(a)        => a.nonEmpty
    case JObject(f)       => f.nonEmpty
    case JBool(b)         => b
    case JInt(i)          => i != 0
    case JLong(l)         => l != 0
    case JDouble(d)       => d != 0.0
    case JDecimal(d)      => d.signum != 0
    case JSet(s)          => s.nonEmpty
  }

  /** generate_hier_facet(a,b,c) -> ["0/a", "1/a/b", "2/a/b/c"]
    * (solr_updater.py:231-241). */
  def hierFacet(levels: Seq[String]): Seq[String] =
    levels.indices.map(i => s"$i/" + levels.take(i + 1).mkString("/"))

  /** SIMBAD object-type → basic class (solr_updater.py:255-278). */
  def mapSimbadType(o: String): String =
    if (o.startsWith("G") || o.endsWith("G")) "Galaxy"
    else if (o == "Star" || o.contains("*")) "Star"
    else if (o == "Neb" || o.startsWith("PN") || o.startsWith("SNR")) "Nebula"
    else if (o == "HII") "HII Region"
    else if (o == "X") "X-ray"
    else if (o.startsWith("Radio") || o == "Maser" || o == "HI") "Radio"
    else if (o == "IR" || o.startsWith("Red")) "Infrared"
    else if (o == "UV") "UV"
    else "Other"

  private val NedLookup: Map[String, String] =
    Seq("G", "GClstr", "GGroup", "GPair", "GTrpl", "G_Lens", "PofG").map(_ -> "Galaxy").toMap ++
    Seq("Neb", "PN", "RfN").map(_ -> "Nebula") ++
    Map("HII" -> "HII Region", "X" -> "X-ray") ++
    Seq("Maser", "HI").map(_ -> "Radio") ++
    Map("IrS" -> "Infrared") ++
    Seq("Blue*", "C*", "exG*", "Flare*", "Nova", "Psr", "Red*", "SN", "SNR",
      "V*", "VisS", "WD*", "WR*").map(_ -> "Star")

  /** NED object-type → basic class (solr_updater.py:311-325). */
  def mapNedType(o: String): String =
    if (o.startsWith("!")) "Galactic Object"
    else if (o.startsWith("*")) "Star"
    else if (o.startsWith("Uv")) "UV"
    else if (o.startsWith("Radio")) "Radio"
    else NedLookup.getOrElse(o, "Other")

  // ── extractors ──────────────────────────────────────────────────────────

  private def strs(v: JValue): Seq[String] = v match {
    case JArray(items) => items.collect { case JString(s) => s }
    case _             => Nil
  }

  /** extract_data_pipeline (solr_updater.py:25-147): the nonbib splitter. */
  def extractDataPipeline(data: JValue): List[(String, JValue)] = {
    val reader = data \ "readers" match { case a: JArray => a; case _ => JArray(Nil) }
    val reference = data \ "reference" match { case a: JArray => a; case _ => JArray(Nil) }
    val credit = data \ "credit" match { case a: JArray => a; case _ => JArray(Nil) }
    val mention = data \ "mention" match { case a: JArray => a; case _ => JArray(Nil) }

    // malformed entries (no separator) are skipped rather than thrown:
    // in the reference a ValueError kills only that record's Celery task;
    // in a Dataset.map it would abort the whole 28.8M-row job
    val grants = strs(data \ "grants").map(_.split(" ", 2)).filter(_.length == 2)
    val grant = grants.flatMap { case Array(agency, no) => Seq(agency, no) }
    val grantHier = grants.flatMap { case Array(agency, no) => hierFacet(Seq(agency, no)) }

    val pf = strs(data \ "planetary_feature").map(_.split("/", 4)).filter(_.length == 4)
    val uatRaw = strs(data \ "uat").map(_.split("/").toSeq)

    def splitObj(x: String): (String, String) = x.split(" ", 2) match {
      case Array(id, t) => (id, t)
      case Array(id)    => (id, "")
    }
    val simb = strs(data \ "simbad_objects").map(splitObj)
    val ned = strs(data \ "ned_objects").map(splitObj)

    def jarr(xs: Seq[String]): JValue = JArray(xs.map(JString(_)).toList)

    val base = List[(String, JValue)](
      "reader" -> reader,
      "read_count" -> JInt(reader.arr.length),
      "cite_read_boost" -> (data \ "boost" match { case JNothing | JNull => JDouble(0.0); case v => v }),
      "classic_factor" -> (data \ "norm_cites" match { case JNothing | JNull => JDouble(0.0); case v => v }),
      "reference" -> reference,
      "reference_count" -> (data \ "reference_count" match { case JNothing | JNull => JInt(reference.arr.length); case v => v }),
      "data" -> (data \ "data" match { case a: JArray => a; case _ => JArray(Nil) }),
      "data_facet" -> jarr(strs(data \ "data").map(_.split(":")(0))),
      "esources" -> (data \ "esource" match { case a: JArray => a; case _ => JArray(Nil) }),
      "property" -> (data \ "property" match { case a: JArray => a; case _ => JArray(Nil) }),
      "planetary_feature" -> jarr(pf.map(p => p.take(3).mkString("/"))),
      "planetary_feature_id" -> jarr(pf.map(p => p(3))),
      "planetary_feature_facet_hier_3level" -> jarr(pf.flatMap(p => hierFacet(p.take(3).toSeq))),
      "uat" -> jarr(uatRaw.map(_.dropRight(1).mkString("/"))),
      "uat_id" -> jarr(uatRaw.map(_.last)),
      "grant" -> jarr(grant),
      "grant_facet_hier" -> jarr(grantHier),
      "simbid" -> jarr(simb.map(_._1)),
      "simbtype" -> jarr(simb.map(x => mapSimbadType(x._2))),
      "simbad_object_facet_hier" -> jarr(simb.flatMap(x => hierFacet(Seq(mapSimbadType(x._2), x._1)))),
      "nedid" -> jarr(ned.map(_._1)),
      "nedtype" -> jarr(ned.map(x => mapNedType(x._2))),
      "ned_object_facet_hier" -> jarr(ned.flatMap(x => hierFacet(Seq(mapNedType(x._2), x._1)))),
      "citation_count" -> (data \ "citation_count" match { case JNothing | JNull => JInt(0); case v => v }),
      "citation_count_norm" -> (data \ "citation_count_norm" match { case JNothing | JNull => JInt(0); case v => v }),
      "credit" -> credit,
      "credit_count" -> (data \ "credit_count" match { case JNothing | JNull => JInt(credit.arr.length); case v => v }),
      "mention" -> mention,
      "mention_count" -> (data \ "mention_count" match { case JNothing | JNull => JInt(mention.arr.length); case v => v }))
    val links = data \ "links_data"
    if (truthy(links)) base :+ ("links_data" -> links) else base
  }

  /** get_orcid_claims (solr_updater.py:244-251). */
  def extractOrcid(data: JValue): List[(String, JValue)] = {
    val out = mutable.ListBuffer.empty[(String, JValue)]
    data \ "verified" match { case JNothing => (); case v => out += ("orcid_user" -> v) }
    data \ "unverified" match { case JNothing => (); case v => out += ("orcid_other" -> v) }
    out.toList
  }

  /** extract_fulltext (solr_updater.py:219-228): body/ack/facility only. */
  def extractFulltext(data: JValue): List[(String, JValue)] =
    List("body" -> "body", "acknowledgements" -> "ack", "facility" -> "facility")
      .flatMap { case (src, dst) =>
        data \ src match { case JNothing => None; case v => Some(dst -> v) }
      }

  /** extract_metrics_pipeline (solr_updater.py:19-22). */
  def extractMetrics(data: JValue): List[(String, JValue)] =
    List("citation" -> (data \ "citations" match { case JNothing | JNull => JArray(Nil); case v => v }))

  /** extract_augments_pipeline (solr_updater.py:150-168): aff precedence
    * aff_raw > aff > existing doc aff; copies the aff_* family verbatim. */
  def extractAugments(aug: JValue, doc: mutable.Map[String, JValue]): List[(String, JValue)] = {
    if (!truthy(aug)) Nil
    else {
      def get(k: String): JValue = aug \ k match { case JNothing => JNull; case v => v }
      val aff = aug \ "aff_raw" match {
        case JNothing => aug \ "aff" match {
          case JNothing => doc.getOrElse("aff", JNull)
          case v        => v
        }
        case v => v
      }
      List("aff" -> aff, "aff_abbrev" -> get("aff_abbrev"),
        "aff_canonical" -> get("aff_canonical"), "aff_facet" -> get("aff_facet"),
        "aff_facet_hier" -> get("aff_facet_hier"), "aff_id" -> get("aff_id"),
        "institution" -> get("institution"))
    }
  }

  /** extract_classifications_pipeline (solr_updater.py:170-181): whitelist
    * filter, union with the doc's database (sorted for determinism — the
    * reference materializes an unordered Python set). */
  def extractClassifications(cls: JValue, doc: mutable.Map[String, JValue]): List[(String, JValue)] = {
    val filtered = strs(cls).filter(ExposeCollections.contains)
    if (filtered.isEmpty)
      List("database" -> doc.getOrElse("database", JNull))
    else {
      val existing = doc.get("database").map(strs).getOrElse(Nil)
      List("database" -> JArray((filtered ++ existing).distinct.sorted.map(JString(_)).toList))
    }
  }

  /** extract_boost_pipeline (solr_updater.py:184-216). */
  def extractBoost(bf: JValue): List[(String, JValue)] = {
    val parsed = bf match {
      case JString(s) => parse(s)
      case v          => v
    }
    parsed match {
      case o: JObject if truthy(o) =>
        val base = List("doctype_boost", "refereed_boost", "recency_boost", "boost_factor")
          .map(k => k -> (o \ k match { case JNothing => JNull; case v => v }))
        val disciplines = List("astronomy", "physics", "earth_science",
          "planetary_science", "heliophysics", "general")
          .flatMap { d =>
            o \ s"${d}_final_boost" match {
              case JNothing => None
              case v        => Some(s"${d}_final_boost" -> v)
            }
          }
        base ++ disciplines
      case _ => Nil
    }
  }

  // ── the T1 fold ─────────────────────────────────────────────────────────

  /** Produce the search document for one master record. */
  def transform(rec: MasterRecord): JObject = {
    val doc = mutable.LinkedHashMap[String, JValue]("bibcode" -> JString(rec.bibcode))

    val bib = rec.bib_data.map(parse).getOrElse(JNothing)
    val nonbib = rec.nonbib_data.map(parse).getOrElse(JNothing)
    val orcid = rec.orcid_claims.map(parse).getOrElse(JNothing)
    val fulltext = rec.fulltext.map(parse).getOrElse(JNothing)
    val metrics = rec.metrics.map(parse).getOrElse(JNothing)
    val augments = rec.augments.map(parse).getOrElse(JNothing)
    val classifications = rec.classifications.map(parse).getOrElse(JNothing)
    val boosts = rec.boost_factors.map(parse).getOrElse(JNothing)

    // slot table in DB_COLUMN_DESTINATIONS order (solr_updater.py:358-369);
    // ordering key = epoch seconds of the slot's *_updated, absent → MaxValue
    // (so const slots run last, in declaration order — Python stable sort).
    def secs(t: Option[java.sql.Timestamp]): Long =
      t.map(_.getTime / 1000).getOrElse(Long.MaxValue)
    case class Slot(name: String, ts: Long, apply: () => Unit)

    def update(kvs: List[(String, JValue)]): Unit = kvs.foreach { case (k, v) => doc(k) = v }

    val slots = Seq(
      Slot("bib_data", secs(rec.bib_data_updated), () =>
        if (truthy(bib)) bib match { case JObject(fs) => update(fs); case _ => () }),
      Slot("orcid_claims", secs(rec.orcid_claims_updated), () =>
        if (truthy(orcid)) update(extractOrcid(orcid))),
      Slot("nonbib_data", secs(rec.nonbib_data_updated), () =>
        if (truthy(nonbib)) update(extractDataPipeline(nonbib))),
      Slot("metrics", secs(rec.metrics_updated), () =>
        if (truthy(metrics)) update(extractMetrics(metrics))),
      Slot("id", Long.MaxValue, () =>
        if (rec.id != 0) doc("id") = JLong(rec.id)),
      Slot("fulltext", secs(rec.fulltext_updated), () =>
        if (truthy(fulltext)) update(extractFulltext(fulltext))),
      Slot("#timestamps", Long.MaxValue, () => update(timestampFields(rec))),
      Slot("augments", secs(rec.augments_updated), () =>
        if (truthy(augments)) update(extractAugments(augments, doc))),
      Slot("classifications", secs(rec.classifications_updated), () =>
        if (truthy(classifications)) update(extractClassifications(classifications, doc))),
      Slot("boost_factors", secs(rec.boost_factors_updated), () =>
        if (truthy(boosts)) update(extractBoost(boosts))))

    slots.sortBy(_.ts).foreach(_.apply())

    // override 1: nonbib links_data beats bib even if older (py:476-484)
    val bibLinks = bib \ "links_data"
    val nonbibLinks = nonbib \ "links_data"
    if (truthy(bib) && truthy(nonbib) && truthy(bibLinks) && truthy(nonbibLinks))
      doc("links_data") = nonbibLinks

    // override 2: bibgroup / bibgroup_facet prefer nonbib (py:486-494)
    if (truthy(nonbib) && truthy(nonbib \ "bibgroup"))
      doc("bibgroup") = nonbib \ "bibgroup"
    if (truthy(nonbib) && truthy(nonbib \ "bibgroup_facet"))
      doc("bibgroup_facet") = nonbib \ "bibgroup_facet"

    // override 3: bib-only fallback — open-access property expansion (py:496-523)
    if (rec.nonbib_data.isEmpty && truthy(bib) && truthy(bibLinks)) {
      val first = bibLinks match {
        case JArray(x :: _) => x
        case JString(s) if s.nonEmpty => JString(s.substring(0, 1))
        case _ => JNothing
      }
      first match {
        case JString(s) =>
          val parsed = try Some(JsonMethods.parse(s)) catch { case _: Throwable => None }
          parsed.foreach { ld =>
            if (!doc.contains("property")) doc("property") = JArray(Nil)
            if (ld \ "access" == JString("open")) {
              doc("property") = JArray(strs(doc("property")).map(JString(_)).toList ++
                List("ESOURCE", "ARTICLE", "NOT REFEREED", "EPRINT_OPENACCESS", "OPENACCESS").map(JString(_)))
              val es = doc.getOrElse("esources", JArray(Nil))
              doc("esources") = JArray(strs(es).map(JString(_)).toList ++
                List("EPRINT_HTML", "EPRINT_PDF").map(JString(_)))
            }
          }
        case _ => ()
      }
    }

    // override 4: boost defaults — absent boost columns default to int 1 (py:524-529)
    BoostColumns.foreach { c => if (!doc.contains(c)) doc(c) = JInt(1) }

    // override 5: classifications supersede bib database (py:531-539); the
    // reference unions the *raw* classifications list here (no whitelist)
    if (truthy(bib) && truthy(classifications) && truthy(bib \ "database")) {
      val merged = (strs(classifications) ++ strs(bib \ "database")).distinct.sorted
      doc("database") = JArray(merged.map(JString(_)).toList)
    }

    // scix_id propagation (py:542-544)
    doc("scix_id") = rec.scix_id.filter(_.nonEmpty).map(JString(_)).getOrElse(JNull)

    // `has` field (py:546-568): sorted field list, truthy value with >=1
    // alphanumeric char across joined elements
    val has = HasFields.sorted.filter { f =>
      doc.get(f).filter(truthy).exists { v =>
        val text = v match {
          case JString(s) => s
          case JArray(items) => items.map {
            case JString(s) => s
            case other      => CanonicalJson.serialize(other)
          }.mkString("")
          case other => CanonicalJson.serialize(other)
        }
        text.exists(_.isLetterOrDigit)
      }
    }
    doc("has") = JArray(has.map(JString(_)).toList)

    JObject(doc.toList)
  }

  /** get_timestamps (solr_updater.py:335-355): five *_mtime stamps plus
    * update_timestamp = max. */
  def timestampFields(rec: MasterRecord): List[(String, JValue)] = {
    val fmap = List(
      "metadata_mtime" -> rec.bib_data_updated,
      "nonbib_mtime" -> rec.nonbib_data_updated,
      "fulltext_mtime" -> rec.fulltext_updated,
      "orcid_mtime" -> rec.orcid_claims_updated,
      "metrics_mtime" -> rec.metrics_updated)
    val present = fmap.collect { case (k, Some(t)) => k -> t }
    if (present.isEmpty) Nil
    else present.map { case (k, t) => k -> (JString(solrStamp(t)): JValue) } :+
      ("update_timestamp" -> (JString(solrStamp(present.map(_._2).maxBy(_.getTime))): JValue))
  }

  /** Canonical JSON + checksum of the doc, volatile keys excluded from the
    * checksum exactly like app.checksum (P4 change suppression). */
  def render(doc: JObject): (String, String) =
    (CanonicalJson.serialize(doc), CanonicalJson.checksumOf(doc))
}
