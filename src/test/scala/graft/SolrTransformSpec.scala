package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import java.sql.Timestamp

import graft.records.MasterRecord
import graft.transform.SolrTransform
import graft.transform.SolrTransform._
import graft.functions.ScixId

/** Golden tests for the flagship T1 transform, porting the reference
  * fixtures and expected values from adsmp/tests/test_solr_updater.py
  * (fixture payloads :52-331, expected doc :409-543, has-lists :345-371
  * and :587-613, timestamp propagation :545-573, links precedence
  * :616-700, extractor edge cases :702-815). */
class SolrTransformSpec extends AnyFunSuite {

  def ts(s: String): Timestamp = Timestamp.from(java.time.Instant.parse(s))

  val bibData: String =
    """{
      "abstract": "abstract text",
      "aff": ["-", "-", "-", "-"],
      "alternate_bibcode": ["2003adass..12..283B"],
      "author": ["Blecksmith, E.", "Paltani, S.", "Rots, A.", "Winkelman, S."],
      "author_count": 4,
      "author_facet": ["Blecksmith, E", "Paltani, S", "Rots, A", "Winkelman, S"],
      "author_facet_hier": ["0/Blecksmith, E", "1/Blecksmith, E/Blecksmith, E.",
        "0/Paltani, S", "1/Paltani, S/Paltani, S.", "0/Rots, A", "1/Rots, A/Rots, A.",
        "0/Winkelman, S", "1/Winkelman, S/Winkelman, S."],
      "author_norm": ["Blecksmith, E", "Paltani, S", "Rots, A", "Winkelman, S"],
      "bibcode": "2003ASPC..295..283B",
      "bibgroup": ["bibCXC", "CfA"],
      "bibgroup_facet": ["bibCXC", "CfA"],
      "bibstem": ["ASPC", "ASPC..295"],
      "bibstem_facet": "ASPC",
      "database": ["astronomy"],
      "date": "2003-01-01T00:00:00.000000Z",
      "doctype": "inproceedings",
      "doctype_facet_hier": ["0/Article", "1/Article/Proceedings Article"],
      "editor": ["Testeditor, Z."],
      "email": ["-", "-", "-", "-"],
      "first_author": "Blecksmith, E.",
      "first_author_facet_hier": ["0/Blecksmith, E", "1/Blecksmith, E/Blecksmith, E."],
      "first_author_norm": "Blecksmith, E",
      "id": "1401492",
      "identifier": ["2003adass..12..283B"],
      "links_data": "",
      "orcid_pub": ["-", "-", "-", "-"],
      "page": ["283"],
      "pub": "Astronomical Data Analysis Software and Systems XII",
      "pub_abbrev": "ADASS XII",
      "pub_raw": "Astronomical Data Analysis Software and Systems XII ASP Conference Series, Vol. 295, 2003 H. E. Payne, R. I. Jedrzejewski, and R. N. Hook, eds., p.283",
      "pubdate": "2003-00-00",
      "title": ["Chandra Data Archive Download and Usage Database"],
      "volume": "295",
      "year": "2003"
    }"""

  val boostData: String =
    """{"bibcode": "bibcode", "scix_id": "scix_id", "status": "updated",
       "doctype_boost": 0.8571428571428572, "recency_boost": 1.0,
       "boost_factor": 0.5142857142857143,
       "astronomy_final_boost": 0.5142857142857143,
       "physics_final_boost": 0.5142857142857143}"""

  val fulltextData: String =
    """{"body": "texttext", "acknowledgements": "aaa",
       "dataset": ["a", "b", "c"], "facility": ["fac1", "fac2", "fac3"]}"""

  // second metrics update replaces the first slot value entirely (M1 semantics)
  val metricsData: String =
    """{"citation_num": 6, "citations": ["2007ApPhL..91g1118P", "2010ApPhA..99..805K",
       "2011TSF...520..610L", "2012NatCo...3E1175B", "2014IPTL...26..305A",
       "2016ITED...63..197G"]}"""

  val orcidData: String =
    """{"authors": ["Blecksmith, E.", "Paltani, S.", "Rots, A.", "Winkelman, S."],
       "bibcode": "2003ASPC..295..283B",
       "unverified": ["-", "-", "0000-0003-2377-2356", "-"]}"""

  val nonbibData: String =
    """{
      "authors": ["Zaus, E", "Tedde, S", "Fuerst, J", "Henseler, D", "Doehler, G"],
      "bibcode": "2007JAP...101d4501Z",
      "bibgroup": ["CXC", "CfA"],
      "bibgroup_facet": ["CXC", "CfA"],
      "boost": 0.1899999976158142,
      "data": ["MAST:3", "SIMBAD:1"],
      "property": ["OPENACCESS", "ADS_OPENACCESS", "ARTICLE", "NOT REFEREED"],
      "downloads": [0,0,0,0,0,0,0,0,0,0,0,0,0,1,0,0,0,0,0,0,0,0],
      "id": 7862455,
      "norm_cites": 4225,
      "reads": [0,0,0,0,0,0,0,0,0,0,0,4,6,2,1,0,0,1,0,1,0,0],
      "refereed": true,
      "reference": ["1977JAP....48.4729M", "1981psd..book.....S", "1981wi...book.....S",
        "1986PhRvB..33.5545M", "1987ApPhL..51..913T", "1992Sci...258.1474S",
        "1994IJMPB...8..237S", "1995Natur.376..498H", "1995Sci...270.1789Y",
        "1998TSF...331...76O", "1999Natur.397..121F", "2000JaJAP..39...94P",
        "2002ApPhL..81.3885S", "2004ApPhL..85.3890C", "2004TSF...451..105S",
        "2005PhRvB..72s5208M", "2006ApPhL..89l3505L"],
      "simbad_objects": ["2419335 sim", "3111723 sim*"],
      "ned_objects": ["2419335 HII", "3111723 ned*"],
      "grants": ["2419335 g", "3111723 g*"],
      "citation_count": 6,
      "citation_count_norm": 0.2,
      "reference_count": 17,
      "mention": ["1977JAP....48.4729M"],
      "mention_count": 1,
      "credit": ["1981psd..book.....S"],
      "credit_count": 1
    }"""

  val augmentData: String =
    """{"aff": ["augment pipeline aff", "-", "-", "-"],
       "aff_abbrev": ["-", "-", "-", "-"], "aff_canonical": ["-", "-", "-", "-"],
       "aff_facet": ["-", "-", "-", "-"], "aff_facet_hier": ["-", "-", "-", "-"],
       "aff_id": ["-", "-", "-", "-"], "institution": ["-", "-", "-", "-"]}"""

  /** Record state after the fixture's update_storage sequence (arrival
    * order: metadata, boost, fulltext, metrics, orcid, metrics2, nonbib). */
  def baseRecord(withAugment: Boolean): MasterRecord = {
    val scix = ScixId.generate(SolrTransform.parse(bibData))
    MasterRecord.empty("2003ASPC..295..283B", id = 1).copy(
      scix_id = scix,
      bib_data = Some(bibData), bib_data_updated = Some(ts("2023-01-01T00:00:01Z")),
      boost_factors = Some(boostData), boost_factors_updated = Some(ts("2023-01-01T00:00:02Z")),
      fulltext = Some(fulltextData), fulltext_updated = Some(ts("2023-01-01T00:00:03Z")),
      metrics = Some(metricsData), metrics_updated = Some(ts("2023-01-01T00:00:06Z")),
      orcid_claims = Some(orcidData), orcid_claims_updated = Some(ts("2023-01-01T00:00:05Z")),
      nonbib_data = Some(nonbibData), nonbib_data_updated = Some(ts("2023-01-01T00:00:07Z")),
      augments = if (withAugment) Some(augmentData) else None,
      augments_updated = if (withAugment) Some(ts("2023-01-01T00:00:08Z")) else None)
  }

  def field(doc: JObject, k: String): JValue =
    doc.obj.toMap.getOrElse(k, JNothing)

  def strsOf(v: JValue): Seq[String] = v match {
    case JArray(items) => items.collect { case JString(s) => s }
    case _ => Nil
  }

  test("golden: pre-augment doc (test_solr_transformer, test_solr_updater.py:332-372)") {
    val doc = transform(baseRecord(withAugment = false))
    assert(strsOf(field(doc, "aff")) == Seq("-", "-", "-", "-"),
      "aff comes from bib data when augment absent")
    assert(field(doc, "aff_abbrev") == JNothing, "no augment fields without augment")
    assert(strsOf(field(doc, "has")) == Seq(
      "abstract", "ack", "author", "bibgroup", "body", "citation", "credit",
      "data", "database", "doctype", "first_author", "grant", "identifier",
      "mention", "orcid_other", "property", "pub", "pub_raw", "reference",
      "title", "volume"))
    val JString(scix) = field(doc, "scix_id")
    assert(scix.matches("scix:[0-9A-HJKMNP-TV-Z]{4}-[0-9A-HJKMNP-TV-Z]{4}-[0-9A-HJKMNP-TV-Z]{4}"))
    val JDouble(db) = field(doc, "doctype_boost")
    assert(math.abs(db - 0.857) < 0.001)
  }

  test("golden: post-augment doc subset (test_solr_updater.py:409-543)") {
    val doc = transform(baseRecord(withAugment = true))
    val m = doc.obj.toMap

    assert(m("abstract") == JString("abstract text"))
    assert(m("ack") == JString("aaa"))
    assert(strsOf(m("aff")) == Seq("augment pipeline aff", "-", "-", "-"))
    assert(strsOf(m("aff_abbrev")) == Seq("-", "-", "-", "-"))
    assert(strsOf(m("alternate_bibcode")) == Seq("2003adass..12..283B"))
    assert(strsOf(m("author_facet_hier")) == Seq(
      "0/Blecksmith, E", "1/Blecksmith, E/Blecksmith, E.",
      "0/Paltani, S", "1/Paltani, S/Paltani, S.",
      "0/Rots, A", "1/Rots, A/Rots, A.",
      "0/Winkelman, S", "1/Winkelman, S/Winkelman, S."))
    assert(m("bibcode") == JString("2003ASPC..295..283B"))
    // nonbib override beats bib's ["bibCXC", "CfA"]
    assert(strsOf(m("bibgroup")) == Seq("CXC", "CfA"))
    assert(strsOf(m("bibgroup_facet")) == Seq("CXC", "CfA"))
    assert(m("body") == JString("texttext"))
    assert(strsOf(m("citation")).length == 6)
    assert(m("citation_count") == JInt(6))
    assert(m("citation_count_norm") == JDouble(0.2))
    assert(m("cite_read_boost") == JDouble(0.1899999976158142))
    assert(m("classic_factor") == JInt(4225))
    assert(strsOf(m("credit")) == Seq("1981psd..book.....S"))
    assert(m("credit_count") == JInt(1))
    assert(strsOf(m("data")) == Seq("MAST:3", "SIMBAD:1"))
    assert(strsOf(m("data_facet")) == Seq("MAST", "SIMBAD"))
    assert(strsOf(m("database")) == Seq("astronomy"))
    assert(!m.contains("dataset"), "fulltext dataset must not propagate")
    assert(m("doctype") == JString("inproceedings"))
    assert(strsOf(m("facility")) == Seq("fac1", "fac2", "fac3"))
    assert(m("id") == JLong(1), "master row id wins over bib id string")
    assert(strsOf(m("identifier")) == Seq("2003adass..12..283B"))
    assert(m("links_data") == JString(""))
    assert(strsOf(m("orcid_other")) == Seq("-", "-", "0000-0003-2377-2356", "-"))
    assert(strsOf(m("mention")) == Seq("1977JAP....48.4729M"))
    assert(m("mention_count") == JInt(1))
    assert(strsOf(m("nedid")) == Seq("2419335", "3111723"))
    assert(strsOf(m("nedtype")) == Seq("HII Region", "Other"))
    assert(strsOf(m("ned_object_facet_hier")) == Seq(
      "0/HII Region", "1/HII Region/2419335", "0/Other", "1/Other/3111723"))
    assert(strsOf(m("property")) == Seq("OPENACCESS", "ADS_OPENACCESS", "ARTICLE", "NOT REFEREED"))
    assert(m("read_count") == JInt(0))
    assert(strsOf(m("reference")).length == 17)
    assert(m("reference_count") == JInt(17))
    assert(strsOf(m("simbid")) == Seq("2419335", "3111723"))
    assert(strsOf(m("simbtype")) == Seq("Other", "Star"))
    assert(strsOf(m("simbad_object_facet_hier")) == Seq(
      "0/Other", "1/Other/2419335", "0/Star", "1/Star/3111723"))
    assert(strsOf(m("title")) == Seq("Chandra Data Archive Download and Usage Database"))
    assert(m("volume") == JString("295"))
    assert(m("year") == JString("2003"))
    // boost columns present from payload; absent disciplines default to 1
    val JDouble(ab) = m("astronomy_final_boost")
    assert(math.abs(ab - 0.514) < 0.001)
    assert(m("earth_science_final_boost") == JInt(1))
    assert(m("general_final_boost") == JInt(1))
    // post-augment has list includes aff (test_solr_updater.py:587-613)
    assert(strsOf(m("has")) == Seq(
      "abstract", "ack", "aff", "author", "bibgroup", "body", "citation",
      "credit", "data", "database", "doctype", "first_author", "grant",
      "identifier", "mention", "orcid_other", "property", "pub", "pub_raw",
      "reference", "title", "volume"))
  }

  test("timestamp propagation (test_solr_updater.py:545-573)") {
    val t = ts("2017-09-19T21:17:12.026474Z")
    val rec = baseRecord(withAugment = true).copy(
      bib_data_updated = Some(t), nonbib_data_updated = Some(t),
      orcid_claims_updated = Some(t), fulltext_updated = Some(t),
      metrics_updated = Some(t), augments_updated = Some(t),
      boost_factors_updated = Some(t))
    val doc = transform(rec).obj.toMap
    Seq("metadata_mtime", "fulltext_mtime", "orcid_mtime", "nonbib_mtime",
      "metrics_mtime", "update_timestamp").foreach { f =>
      assert(doc(f) == JString("2017-09-19T21:17:12.026474Z"), f)
    }
    val bumped = rec.copy(orcid_claims_updated = Some(ts("2017-09-20T21:17:12.026474Z")))
    val doc2 = transform(bumped).obj.toMap
    Seq("metadata_mtime", "fulltext_mtime", "nonbib_mtime", "metrics_mtime").foreach { f =>
      assert(doc2(f) == JString("2017-09-19T21:17:12.026474Z"), f)
    }
    Seq("orcid_mtime", "update_timestamp").foreach { f =>
      assert(doc2(f) == JString("2017-09-20T21:17:12.026474Z"), f)
    }
  }

  test("links_data precedence matrix (test_links_data_merge)") {
    val now = ts("2024-06-01T00:00:00Z")
    val dayBefore = ts("2024-05-31T00:00:00Z")

    // bib only
    val bibOnly = MasterRecord.empty("foo").copy(
      bib_data = Some("""{"links_data": ["{\"url\": \"http://asdf\"}"]}"""),
      bib_data_updated = Some(now))
    val d1 = transform(bibOnly).obj.toMap
    assert(strsOf(d1("links_data")) == Seq("""{"url": "http://asdf"}"""))
    assert(d1("scix_id") == JNull)

    // nonbib only
    val nonbibOnly = MasterRecord.empty("foo").copy(
      nonbib_data = Some("""{"links_data": "asdf"}"""),
      nonbib_data_updated = Some(now))
    assert(transform(nonbibOnly).obj.toMap.apply("links_data") == JString("asdf"))

    // both, nonbib older — nonbib still wins
    val both1 = MasterRecord.empty("foo").copy(
      bib_data = Some("""{"links_data": "asdf"}"""), bib_data_updated = Some(now),
      nonbib_data = Some("""{"links_data": "jkl"}"""), nonbib_data_updated = Some(dayBefore))
    val db1 = transform(both1).obj.toMap
    assert(db1("links_data") == JString("jkl"))
    assert(strsOf(db1("has")).isEmpty)

    // both, nonbib newer
    val both2 = MasterRecord.empty("foo").copy(
      bib_data = Some("""{"links_data": "asdf"}"""), bib_data_updated = Some(dayBefore),
      nonbib_data = Some("""{"links_data": "jkl"}"""), nonbib_data_updated = Some(now))
    assert(transform(both2).obj.toMap.apply("links_data") == JString("jkl"))

    // open access expansion
    val open = MasterRecord.empty("foo").copy(
      bib_data = Some("""{"links_data": ["{\"url\": \"http://foo\", \"access\": \"open\"}"]}"""),
      bib_data_updated = Some(now))
    val dOpen = transform(open).obj.toMap
    val props = strsOf(dOpen("property"))
    Seq("ESOURCE", "ARTICLE", "NOT REFEREED", "EPRINT_OPENACCESS", "OPENACCESS")
      .foreach(p => assert(props.contains(p), p))
    val esrc = strsOf(dOpen("esources"))
    assert(esrc.contains("EPRINT_HTML") && esrc.contains("EPRINT_PDF"))

    // closed access: property created but not extended
    val closed = MasterRecord.empty("foo").copy(
      bib_data = Some("""{"links_data": ["{\"url\": \"http://foo\", \"access\": \"closed\"}"]}"""),
      bib_data_updated = Some(now))
    assert(!strsOf(transform(closed).obj.toMap.apply("property")).contains("ESOURCE"))

    // empty bib_data: no property key at all
    val emptyBib = MasterRecord.empty("foo").copy(
      bib_data = Some("{}"), bib_data_updated = Some(now))
    assert(!transform(emptyBib).obj.toMap.contains("property"))
  }

  test("extract_data_pipeline edge cases (test_extract_data_pipeline)") {
    // simbad object without space → id with empty type
    val d1 = extractDataPipeline(parse(
      """{"simbad_objects": ["947046 "], "ned_objects": ["MESSIER_031 G", "SN_1885A "]}""")).toMap
    assert(strsOf(d1("simbid")) == Seq("947046"))
    assert(strsOf(d1("simbtype")) == Seq("Other"))
    assert(strsOf(d1("simbad_object_facet_hier")) == Seq("0/Other", "1/Other/947046"))
    assert(strsOf(d1("nedid")) == Seq("MESSIER_031", "SN_1885A"))
    assert(strsOf(d1("nedtype")) == Seq("Galaxy", "Other"))
    assert(strsOf(d1("ned_object_facet_hier")) ==
      Seq("0/Galaxy", "1/Galaxy/MESSIER_031", "0/Other", "1/Other/SN_1885A"))

    val d2 = extractDataPipeline(parse(
      """{"simbad_objects": ["947046"], "ned_objects": ["MESSIER_031 G", "SN_1885A"]}""")).toMap
    assert(strsOf(d2("simbid")) == Seq("947046"))
    assert(strsOf(d2("nedtype")) == Seq("Galaxy", "Other"))

    // planetary features
    val d3 = extractDataPipeline(parse(
      """{"planetary_feature": ["Moon/Crater/Langrenus/3273"]}""")).toMap
    assert(strsOf(d3("planetary_feature")) == Seq("Moon/Crater/Langrenus"))
    assert(strsOf(d3("planetary_feature_id")) == Seq("3273"))
    assert(strsOf(d3("planetary_feature_facet_hier_3level")) ==
      Seq("0/Moon", "1/Moon/Crater", "2/Moon/Crater/Langrenus"))

    val d4 = extractDataPipeline(parse(
      """{"planetary_feature": ["Mars/Terra/Terra Cimmeria/5930"]}""")).toMap
    assert(strsOf(d4("planetary_feature")) == Seq("Mars/Terra/Terra Cimmeria"))
    assert(strsOf(d4("planetary_feature_id")) == Seq("5930"))

    val d5 = extractDataPipeline(parse(
      """{"planetary_feature": ["Moon/Mare/Mare Imbrium/3678", "Moon/Crater/Alder/171",
          "Moon/Crater/Finsen/1959", "Moon/Crater/Leibnitz/3335"]}""")).toMap
    assert(strsOf(d5("planetary_feature_id")) == Seq("3678", "171", "1959", "3335"))
    assert(strsOf(d5("planetary_feature_facet_hier_3level")).length == 12)

    // uat: keep-all-but-last joined, last = id
    val d6 = extractDataPipeline(parse(
      """{"uat": [
        "cosmology/origin of the universe/early universe/recombination (cosmology)/cosmic background radiation/cosmic microwave background radiation/322",
        "cosmology/astronomical radiation sources/radio sources/radio continuum emission/5",
        "stellar astronomy/stellar types/stellar evolutionary types/evolved stars/subgiant stars/1646"]}""")).toMap
    assert(strsOf(d6("uat")) == Seq(
      "cosmology/origin of the universe/early universe/recombination (cosmology)/cosmic background radiation/cosmic microwave background radiation",
      "cosmology/astronomical radiation sources/radio sources/radio continuum emission",
      "stellar astronomy/stellar types/stellar evolutionary types/evolved stars/subgiant stars"))
    assert(strsOf(d6("uat_id")) == Seq("322", "5", "1646"))
  }

  test("scix id is deterministic and collision-shaped") {
    val bib = SolrTransform.parse(bibData)
    val a = ScixId.generate(bib)
    val b = ScixId.generate(bib)
    assert(a == b && a.isDefined)
    assert(ScixId.generate(JObject(Nil)) == None)
    // different payload → different id (overwhelmingly likely)
    val other = ScixId.generate(SolrTransform.parse("""{"title": ["x"]}"""))
    assert(other != a)
  }

  test("transform output and checksum are pure functions of the record (property)") {
    // same record state → identical doc and checksum, independent of how
    // the record was assembled; bumping any slot timestamp may only change
    // mtime fields (and fields that slot writes), never unrelated ones
    val base = baseRecord(withAugment = true)
    val (j1, c1) = SolrTransform.render(transform(base))
    val (j2, c2) = SolrTransform.render(transform(base.copy()))
    assert(j1 == j2 && c1 == c2)

    val rnd = new scala.util.Random(3)
    (1 to 10).foreach { _ =>
      // permute which arrival second each slot got, keeping relative order
      // of bib < nonbib (so the links/bibgroup overrides stay exercised)
      val offs = rnd.shuffle((1 to 8).toList)
      def t(i: Int) = ts(f"2023-05-01T00:00:0${offs(i) - 1}%dZ")
      val permuted = base.copy(
        bib_data_updated = Some(t(0)), boost_factors_updated = Some(t(1)),
        fulltext_updated = Some(t(2)), metrics_updated = Some(t(3)),
        orcid_claims_updated = Some(t(4)), nonbib_data_updated = Some(t(5)),
        augments_updated = Some(t(6)))
      val doc = transform(permuted).obj.toMap
      // invariants that hold under any slot arrival order for this corpus
      // (writers of these fields are unique or post-hoc overridden):
      assert(strsOf(doc("bibgroup")) == Seq("CXC", "CfA"), "override beats arrival order")
      assert(doc("citation_count") == JInt(6))
      assert(doc("body") == JString("texttext"))
      assert(strsOf(doc("database")) == Seq("astronomy"))
      val JString(scix) = doc("scix_id")
      assert(scix.startsWith("scix:"))
    }
  }

  test("transform runs distributed via Dataset.map") {
    val s = SparkSpec.spark
    import s.implicits._
    val recs = Seq(baseRecord(withAugment = true),
      MasterRecord.empty("foo").copy(bib_data = Some("""{"title": ["t"]}"""),
        bib_data_updated = Some(ts("2024-01-01T00:00:00Z"))))
    val out = s.createDataset(recs)
      .map { r =>
        val (json, cks) = SolrTransform.render(SolrTransform.transform(r))
        (r.bibcode, json, cks)
      }.toDF("bibcode", "solr_json", "solr_checksum")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out.size == 2)
    assert(out("2003ASPC..295..283B")._1.contains("\"simbtype\": [\"Other\", \"Star\"]"))
    // checksum stable across independent evaluation
    val (_, cksAgain) = SolrTransform.render(SolrTransform.transform(baseRecord(withAugment = true)))
    assert(out("2003ASPC..295..283B")._2 == cksAgain)
  }
}
