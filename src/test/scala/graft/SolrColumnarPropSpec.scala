package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.json4s._
import org.json4s.jackson.JsonMethods
import java.sql.Timestamp

import graft.records.MasterRecord
import graft.transform.{SolrColumnar, SolrTransform}

/** The SURVEY §7.1(4) (a)≡(b) property: the typed per-row fold
  * (SolrTransform.transform, the open-schema fidelity reference) and the
  * columnar Catalyst path (SolrColumnar.withDoc) agree FIELD BY FIELD on
  * the pinned fixture space — payload shapes from FIXTURES.md §2 (the
  * test_solr_updater.py-derived schemas), arbitrary slot-timestamp
  * interleavings, malformed payloads, absent slots, and the full override
  * matrix (links precedence, bibgroup, bib-only open access, boost
  * defaults, classification unions, aff precedence at every relative slot
  * age).
  *
  * Comparison is semantic: numbers numerically (the typed path keeps
  * JInt/JDouble as received; the columnar path types them), JNull and
  * key-absent both normalize to None (SOLR treats them alike). The pinned
  * space excludes the open-schema divergences the SolrColumnar scaladoc
  * documents (unknown bib keys, present-but-empty arrays, string-typed
  * links_data).
  *
  * Determinism: fixed ScalaCheck seeds, whole batches evaluated in ONE
  * Spark job each (per-sample jobs would make the property pay session
  * overhead 200×). */
class SolrColumnarPropSpec extends AnyFunSuite with SparkSpec {

  // ── generators (FIXTURES.md §2 shapes) ────────────────────────────────

  private val word: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar)).map(_.mkString)
  private val texty: Gen[String] =
    Gen.frequency(6 -> word, 1 -> Gen.const("--!?"), 1 -> Gen.const("  "))
  private def words(max: Int = 3): Gen[List[String]] =
    Gen.choose(1, max).flatMap(Gen.listOfN(_, word))
  private def opt[T](g: Gen[T]): Gen[Option[T]] =
    Gen.frequency(1 -> Gen.const(None), 2 -> g.map(Some(_): Option[T]))

  private def jarr(xs: Seq[String]): JValue = JArray(xs.map(JString(_)).toList)

  private val tsPool: Gen[Timestamp] = Gen.oneOf(
    "2024-01-01 00:00:00", "2024-02-01 10:30:00", "2024-03-05 06:07:08.123",
    "2024-03-05 06:07:08.123", "2024-07-15 23:59:59"
  ).map(Timestamp.valueOf)

  private val linkEntry: Gen[String] = Gen.oneOf(
    """{"access": "open", "url": "http://x"}""",
    """{"access": "closed", "url": "http://y"}""",
    """{"title": "z"}""",
    "notjson{{")

  private val genBib: Gen[JObject] = for {
    abs <- opt(texty)
    aff <- opt(words())
    author <- opt(words())
    authorCount <- opt(Gen.choose(1, 9))
    bibgroup <- opt(words(2))
    bibgroupFacet <- opt(words(2))
    database <- opt(Gen.atLeastOne("astronomy", "physics").map(_.toList))
    doctype <- opt(word)
    firstAuthor <- opt(word)
    identifier <- opt(words())
    links <- opt(Gen.choose(1, 2).flatMap(Gen.listOfN(_, linkEntry)))
    pub <- opt(texty)
    title <- opt(words())
    volume <- opt(word)
    year <- opt(Gen.choose(1990, 2026).map(_.toString))
  } yield JObject(List(
    abs.map(v => "abstract" -> (JString(v): JValue)),
    aff.map(v => "aff" -> jarr(v)),
    author.map(v => "author" -> jarr(v)),
    authorCount.map(v => "author_count" -> (JInt(v): JValue)),
    bibgroup.map(v => "bibgroup" -> jarr(v)),
    bibgroupFacet.map(v => "bibgroup_facet" -> jarr(v)),
    database.map(v => "database" -> jarr(v)),
    doctype.map(v => "doctype" -> (JString(v): JValue)),
    firstAuthor.map(v => "first_author" -> (JString(v): JValue)),
    identifier.map(v => "identifier" -> jarr(v)),
    links.map(v => "links_data" -> jarr(v)),
    pub.map(v => "pub" -> (JString(v): JValue)),
    title.map(v => "title" -> jarr(v)),
    volume.map(v => "volume" -> (JString(v): JValue)),
    year.map(v => "year" -> (JString(v): JValue))).flatten)

  private val simbadType: Gen[String] = Gen.oneOf("G", "xG", "Star", "A*",
    "Neb", "PNx", "SNR2", "HII", "X", "RadioX", "Maser", "HI", "IR",
    "RedThing", "UV", "weird")
  private val nedType: Gen[String] = Gen.oneOf("!Gal", "*St", "UvS", "RadioQ",
    "G", "GClstr", "PofG", "Neb", "PN", "HII", "X", "Maser", "HI", "IrS",
    "Nova", "WD*", "strange")

  private val genNonbib: Gen[JObject] = for {
    boost <- opt(Gen.choose(0, 200).map(_ / 100.0))
    normCites <- opt(Gen.choose(0, 100).map(_ / 10.0))
    readers <- opt(words())
    reference <- opt(words())
    refCount <- opt(Gen.choose(0, 50))
    data <- opt(Gen.atLeastOne("SIMBAD:33", "NED:1", "plain").map(_.toList))
    property <- opt(words(2))
    esource <- opt(words(2))
    bibgroup <- opt(words(2))
    simbad <- opt(Gen.choose(1, 3).flatMap(n => Gen.listOfN(n,
      for { id <- Gen.choose(1, 999999); t <- simbadType } yield s"$id $t")))
    ned <- opt(Gen.choose(1, 2).flatMap(n => Gen.listOfN(n,
      for { id <- word; t <- nedType } yield s"$id $t")))
    grants <- opt(Gen.atLeastOne("NASA 123", "NSF ABC-9", "noseparator").map(_.toList))
    pf <- opt(Gen.atLeastOne("Mars/Crater/Big/111", "bad/two", "a/b/c/d/e").map(_.toList))
    uat <- opt(Gen.atLeastOne("astro/stars/123", "solo", "a/b").map(_.toList))
    citCount <- opt(Gen.choose(0, 100))
    citNorm <- opt(Gen.choose(0, 100).map(_ / 7.0))
    credit <- opt(words(2))
    mention <- opt(words(2))
    links <- opt(Gen.choose(1, 2).flatMap(Gen.listOfN(_, linkEntry)))
  } yield JObject(List(
    boost.map(v => "boost" -> (JDouble(v): JValue)),
    normCites.map(v => "norm_cites" -> (JDouble(v): JValue)),
    readers.map(v => "readers" -> jarr(v)),
    reference.map(v => "reference" -> jarr(v)),
    refCount.map(v => "reference_count" -> (JInt(v): JValue)),
    data.map(v => "data" -> jarr(v)),
    property.map(v => "property" -> jarr(v)),
    esource.map(v => "esource" -> jarr(v)),
    bibgroup.map(v => "bibgroup" -> jarr(v)),
    bibgroup.map(v => "bibgroup_facet" -> jarr(v.map(_ + "F"))),
    simbad.map(v => "simbad_objects" -> jarr(v)),
    ned.map(v => "ned_objects" -> jarr(v)),
    grants.map(v => "grants" -> jarr(v)),
    pf.map(v => "planetary_feature" -> jarr(v)),
    uat.map(v => "uat" -> jarr(v)),
    citCount.map(v => "citation_count" -> (JInt(v): JValue)),
    citNorm.map(v => "citation_count_norm" -> (JDouble(v): JValue)),
    credit.map(v => "credit" -> jarr(v)),
    mention.map(v => "mention" -> jarr(v)),
    links.map(v => "links_data" -> jarr(v))).flatten)

  private val genOrcid: Gen[JObject] = for {
    ver0 <- opt(words())
    unver <- opt(words())
  } yield {
    // at least one key (an empty object is "untruthy slot", excluded)
    val ver = if (ver0.isEmpty && unver.isEmpty) Some(List("0000-0002-1")) else ver0
    JObject(List(
      ver.map(v => "verified" -> jarr(v)),
      unver.map(v => "unverified" -> jarr(v))).flatten)
  }

  private val genFulltext: Gen[JObject] = for {
    body0 <- opt(texty)
    ack <- opt(texty)
    fac <- opt(words(2))
  } yield {
    val body = if (body0.isEmpty && ack.isEmpty && fac.isEmpty) Some("fallback body") else body0
    JObject(List(
      body.map(v => "body" -> (JString(v): JValue)),
      ack.map(v => "acknowledgements" -> (JString(v): JValue)),
      fac.map(v => "facility" -> jarr(v))).flatten)
  }

  private val genMetrics: Gen[JObject] = opt(words()).map(cites =>
    JObject(cites.map(v => "citations" -> jarr(v)).toList :+
      ("author_num" -> (JInt(3): JValue))))

  private val genAugments: Gen[JObject] = for {
    affRaw0 <- opt(words())
    aff <- opt(words())
    abbrev <- opt(words(2))
    affId <- opt(words(2))
    inst <- opt(words(2))
  } yield {
    val affRaw = if (List(affRaw0, aff, abbrev, affId, inst).forall(_.isEmpty))
      Some(List("Inst A")) else affRaw0
    JObject(List(
    affRaw.map(v => "aff_raw" -> jarr(v)),
    aff.map(v => "aff" -> jarr(v)),
    abbrev.map(v => "aff_abbrev" -> jarr(v)),
    affId.map(v => "aff_id" -> jarr(v)),
    inst.map(v => "institution" -> jarr(v))).flatten)
  }

  private val genClassifications: Gen[JValue] =
    Gen.atLeastOne("astrophysics", "heliophysics", "planetary", "biology", "chem")
      .map(v => jarr(v.toList))

  private val genBoost: Gen[JObject] = for {
    dt0 <- opt(Gen.choose(0, 300).map(_ / 100.0))
    rf <- opt(Gen.choose(0, 300).map(_ / 100.0))
    rc <- opt(Gen.choose(0, 300).map(_ / 100.0))
    bf <- opt(Gen.choose(0, 300).map(_ / 100.0))
    astro <- opt(Gen.choose(0, 300).map(_ / 100.0))
    gen <- opt(Gen.choose(0, 300).map(_ / 100.0))
  } yield {
    val dt = if (List(dt0, rf, rc, bf, astro, gen).forall(_.isEmpty)) Some(1.25) else dt0
    JObject(List(
    dt.map(v => "doctype_boost" -> (JDouble(v): JValue)),
    rf.map(v => "refereed_boost" -> (JDouble(v): JValue)),
    rc.map(v => "recency_boost" -> (JDouble(v): JValue)),
    bf.map(v => "boost_factor" -> (JDouble(v): JValue)),
    astro.map(v => "astronomy_final_boost" -> (JDouble(v): JValue)),
    gen.map(v => "general_final_boost" -> (JDouble(v): JValue))).flatten)
  }

  /** A payload slot: absent, garbage (strict mode only — the validated
    * fast path trusts ingest-quarantined storage), or a document. */
  private def slot(g: Gen[JValue], garbage: Boolean): Gen[Option[String]] = Gen.frequency(
    2 -> Gen.const(None),
    (if (garbage) 1 else 0) -> Gen.const(Some("garbage {")),
    6 -> g.map(j => Some(JsonMethods.compact(JsonMethods.render(j)))))

  private def genRecord(i: Int, garbage: Boolean = true): Gen[MasterRecord] = for {
    bib <- slot(genBib, garbage)
    nonbib <- slot(genNonbib, garbage)
    orcid <- slot(genOrcid, garbage)
    fulltext <- slot(genFulltext, garbage)
    metrics <- slot(genMetrics, garbage)
    augments <- slot(genAugments, garbage)
    cls <- slot(genClassifications, garbage)
    boosts <- slot(genBoost, garbage)
    tsB <- tsPool; tsN <- tsPool; tsO <- tsPool; tsF <- tsPool
    tsM <- tsPool; tsA <- tsPool; tsC <- tsPool; tsX <- tsPool
    id <- Gen.choose(1L, 1000000L)
    scix <- opt(word)
  } yield MasterRecord(
    id = id, bibcode = f"2024Prop.....$i%05d", scix_id = scix,
    bib_data = bib, nonbib_data = nonbib, orcid_claims = orcid,
    fulltext = fulltext, metrics = metrics, augments = augments,
    classifications = cls, boost_factors = boosts,
    bib_data_updated = bib.map(_ => tsB),
    nonbib_data_updated = nonbib.map(_ => tsN),
    orcid_claims_updated = orcid.map(_ => tsO),
    fulltext_updated = fulltext.map(_ => tsF),
    metrics_updated = metrics.map(_ => tsM),
    augments_updated = augments.map(_ => tsA),
    classifications_updated = cls.map(_ => tsC),
    boost_factors_updated = boosts.map(_ => tsX),
    created = None, updated = None, processed = None,
    solr_processed = None, metrics_processed = None,
    datalinks_processed = None, solr_checksum = None,
    metrics_checksum = None, datalinks_checksum = None, status = None)

  // ── semantic normalization ───────────────────────────────────────────

  private def normTyped(v: JValue): Any = v match {
    case JNothing | JNull => null
    case JString(s)       => s
    case JBool(b)         => b
    case JInt(i)          => BigDecimal(i)
    case JLong(l)         => BigDecimal(l)
    case JDouble(d)       => BigDecimal(d)
    case JDecimal(d)      => d
    case JArray(a)        => a.map(normTyped)
    case other            => sys.error(s"unexpected typed value $other")
  }

  private def normSql(v: Any): Any = v match {
    case null                => null
    case s: String           => s
    case b: Boolean          => b
    case i: Int              => BigDecimal(i)
    case l: Long             => BigDecimal(l)
    case f: Float            => BigDecimal(f.toDouble)
    case d: Double           => BigDecimal(d)
    case d: java.math.BigDecimal => BigDecimal(d)
    case seq: scala.collection.Seq[_] => seq.map(normSql).toList
    case other               => sys.error(s"unexpected sql value $other")
  }

  private def checkBatch(records: List[MasterRecord],
      validated: Boolean = false): Unit = {
    import spark.implicits._
    val df = records.toDS().toDF()
    val out = SolrColumnar.withDoc(df, validated = validated)
      .select(org.apache.spark.sql.functions.col("bibcode").as("_k"),
        org.apache.spark.sql.functions.col("doc"))
    val docSchema = out.schema("doc").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val rows = out.collect()
      .map(r => r.getString(0) -> r.getStruct(1)).toMap
    val pinned = docSchema.fieldNames.toSet

    for (rec <- records) {
      val typed = SolrTransform.transform(rec).obj.toMap
      val row = rows(rec.bibcode)
      // every typed key must be compared — an open-schema key leaking
      // into the generated space would silently dodge the property
      val stray = typed.keySet -- pinned
      assert(stray.isEmpty, s"typed doc keys outside the pinned space: $stray " +
        s"(record ${rec.bibcode})")
      for (f <- docSchema.fieldNames) {
        val t = typed.get(f).map(normTyped).orNull
        val c = normSql(row.get(row.fieldIndex(f)))
        assert(t == c,
          s"field $f diverges for ${rec.bibcode}:\n  typed=$t\n  columnar=$c\n" +
            s"  record=$rec")
      }
    }
  }

  test("T1 columnar twin ≡ typed fold over the FIXTURES.md §2 generator " +
    "(4 seeds × 50 records, every field, every slot-age interleaving)") {
    for (seedVal <- Seq(11L, 22L, 33L, 44L)) {
      val gen = Gen.sequence[List[MasterRecord], MasterRecord](
        (0 until 50).map(genRecord(_)))
      val records = gen.pureApply(Gen.Parameters.default, Seed(seedVal))
      checkBatch(records)
    }
  }

  test("optimizer visibility: a one-field doc projection prunes BOTH the " +
    "parquet ReadSchema (only the payload column that feeds it) and the " +
    "from_json parse schema — the thing the per-row AST parse cannot do") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_colprune").toString
    val gen = Gen.sequence[List[MasterRecord], MasterRecord]((0 until 8).map(genRecord(_)))
    gen.pureApply(Gen.Parameters.default, Seed(7L)).toDS().toDF()
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val pruned = SolrColumnar.withDoc(df)
      .select(org.apache.spark.sql.functions.col("doc.citation_count"))
    val plan = pruned.queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(fail(s"no scan in plan:\n$plan"))
    // exactly one payload column survives to the scan ("bib_data" is a
    // substring of "nonbib_data" — compare the full schema string)
    assert(readSchema.contains("ReadSchema: struct<nonbib_data:string>"),
      s"scan must read ONLY the feeding payload column: $readSchema")
    // the from_json parse schema is pruned to the accessed field
    assert(plan.contains("citation_count"))
    assert(!plan.contains("simbad_objects"),
      "from_json schema should not retain unaccessed payload fields")
  }

  test("validated fast mode ≡ typed fold on parseable-payload space (the " +
    "ingest-quarantine contract): 2 seeds × 50 records, garbage excluded") {
    for (seedVal <- Seq(55L, 66L)) {
      val gen = Gen.sequence[List[MasterRecord], MasterRecord](
        (0 until 50).map(genRecord(_, garbage = false)))
      val records = gen.pureApply(Gen.Parameters.default, Seed(seedVal))
      checkBatch(records, validated = true)
    }
  }

  test("override matrix corner pins: nonbib links beat newer bib links; " +
    "bib-only open access expands property+esources; classification " +
    "union supersedes whitelist when bib database is truthy") {
    def rec(bib: Option[String], nonbib: Option[String], cls: Option[String],
        bibTs: String, nbTs: String): MasterRecord =
      genRecord(0).pureApply(Gen.Parameters.default, Seed(1L)).copy(
        bib_data = bib, nonbib_data = nonbib, classifications = cls,
        orcid_claims = None, fulltext = None, metrics = None, augments = None,
        boost_factors = None,
        bib_data_updated = bib.map(_ => Timestamp.valueOf(bibTs)),
        nonbib_data_updated = nonbib.map(_ => Timestamp.valueOf(nbTs)),
        orcid_claims_updated = None, fulltext_updated = None,
        metrics_updated = None, augments_updated = None,
        classifications_updated = cls.map(_ => Timestamp.valueOf("2024-06-01 00:00:00")),
        boost_factors_updated = None)
    val cases = List(
      // both links truthy, bib NEWER: override 1 still hands it to nonbib
      rec(Some("""{"links_data": ["bibL"], "database": ["astronomy"]}"""),
        Some("""{"links_data": ["nbL"]}"""), None,
        "2024-09-01 00:00:00", "2024-01-01 00:00:00"),
      // bib-only open access: property + esources expand
      rec(Some("""{"links_data": ["{\"access\": \"open\"}"]}"""), None, None,
        "2024-01-01 00:00:00", "2024-01-01 00:00:00"),
      // bib-only NON-open: property becomes [] and esources stays absent
      rec(Some("""{"links_data": ["{\"access\": \"x\"}"]}"""), None, None,
        "2024-01-01 00:00:00", "2024-01-01 00:00:00"),
      // classification union over truthy bib database (raw, unwhitelisted)
      rec(Some("""{"database": ["astronomy"]}"""), None,
        Some("""["biology", "astrophysics"]"""),
        "2024-01-01 00:00:00", "2024-01-01 00:00:00"),
      // whitelist-only path when bib database absent
      rec(Some("""{"title": ["t"]}"""), None,
        Some("""["biology", "astrophysics"]"""),
        "2024-01-01 00:00:00", "2024-01-01 00:00:00"))
        .zipWithIndex.map { case (r, i) => r.copy(bibcode = s"2024Pin......$i") }
    checkBatch(cases)
    // value-level pin of the open-access expansion (both paths compared
    // above; assert the typed path's actual content too)
    val open = SolrTransform.transform(cases(1)).obj.toMap
    assert(normTyped(open("property")) ==
      List("ESOURCE", "ARTICLE", "NOT REFEREED", "EPRINT_OPENACCESS", "OPENACCESS"))
    assert(normTyped(open("esources")) == List("EPRINT_HTML", "EPRINT_PDF"))
    val union = SolrTransform.transform(cases(3)).obj.toMap
    assert(normTyped(union("database")) == List("astronomy", "astrophysics", "biology"))
  }
}
