package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The T1 flagship transform's COLUMNAR twin (SURVEY.md §7.1(4)): the same
  * search-document fold as [[SolrTransform.transform]], expressed as pure
  * Catalyst expressions over `from_json` with the pinned payload
  * StructTypes (FIXTURES.md §2) — no UDFs, no per-row AST, fully
  * codegen'd and optimizer-visible.
  *
  * Why both paths exist: the typed `Dataset.map` (SolrTransform) is the
  * open-schema fidelity reference — `bib_data` splats WHATEVER keys it
  * carries, which no pinned schema can express, so goldens and the
  * checksum authority live there. This columnar path pins the FIXTURES.md
  * §2 payload schemas and is the plan a 28.8M-row (or 100 TB) index job
  * wants on the hot loop:
  *   - `from_json` + struct field access lets Catalyst's
  *     OptimizeJsonExprs PRUNE the parse schema to the fields a query
  *     actually reads — a job that only needs `citation_count` parses a
  *     one-field schema and never materializes fulltext bytes, where the
  *     typed map must AST-parse every payload column in full;
  *   - every override is a `when`/`coalesce` chain (the T13 matrix
  *     style), so the whole document is one WholeStageCodegen span.
  *
  * Equivalence: `SolrColumnarPropSpec` property-checks field-level
  * agreement of the two paths over a `test_solr_updater.py`-shaped
  * generator (payload shapes of FIXTURES.md §2, arbitrary slot-timestamp
  * interleavings — the precedence chains below encode the typed path's
  * arrival-order semantics, including the four post-hoc override blocks,
  * reference adsmp/solr_updater.py:328-473,475-541).
  *
  * Pinned-space caveats (where the open-schema path can diverge, all
  * excluded from the generator and documented here rather than silently
  * wallpapered): bib keys outside the FIXTURES schema (splat would carry
  * them; the struct can't), present-but-empty arrays (`{"database":[]}`
  * is "present untruthy" to the typed fold — indistinguishable from
  * absent after `from_json`), and string-typed `links_data` (the typed
  * path's JString branch; the production shape is array-of-JSON-strings).
  */
object SolrColumnar {

  import SolrTransform.{ExposeCollections, HasFields}

  // ── pinned payload schemas (FIXTURES.md §2) ──────────────────────────

  private def arr = ArrayType(StringType)

  val BibSchema: StructType = StructType(Seq(
    "abstract" -> StringType, "aff" -> arr, "alternate_bibcode" -> arr,
    "author" -> arr, "author_count" -> IntegerType, "author_facet" -> arr,
    "author_facet_hier" -> arr, "author_norm" -> arr, "bibcode" -> StringType,
    "bibgroup" -> arr, "bibgroup_facet" -> arr, "bibstem" -> arr,
    "bibstem_facet" -> StringType, "database" -> arr, "date" -> StringType,
    "doctype" -> StringType, "doctype_facet_hier" -> arr, "editor" -> arr,
    "email" -> arr, "first_author" -> StringType,
    "first_author_facet_hier" -> arr, "first_author_norm" -> StringType,
    "identifier" -> arr, "links_data" -> arr, "orcid_pub" -> arr,
    "page" -> arr, "pub" -> StringType, "pub_abbrev" -> StringType,
    "pub_raw" -> StringType, "pubdate" -> StringType, "title" -> arr,
    "volume" -> StringType, "year" -> StringType
  ).map { case (n, t) => StructField(n, t) })

  val NonbibSchema: StructType = StructType(Seq(
    "authors" -> arr, "bibgroup" -> arr, "bibgroup_facet" -> arr,
    "boost" -> DoubleType, "norm_cites" -> DoubleType, "data" -> arr,
    "property" -> arr, "esource" -> arr, "reference" -> arr,
    "reference_count" -> IntegerType, "simbad_objects" -> arr,
    "ned_objects" -> arr, "grants" -> arr, "planetary_feature" -> arr,
    "uat" -> arr, "citation_count" -> IntegerType,
    "citation_count_norm" -> DoubleType, "mention" -> arr,
    "mention_count" -> IntegerType, "credit" -> arr,
    "credit_count" -> IntegerType, "readers" -> arr, "links_data" -> arr
  ).map { case (n, t) => StructField(n, t) })

  val OrcidSchema: StructType = StructType(Seq(
    StructField("verified", arr), StructField("unverified", arr)))

  val FulltextSchema: StructType = StructType(Seq(
    StructField("body", StringType), StructField("acknowledgements", StringType),
    StructField("facility", arr)))

  val MetricsSchema: StructType = StructType(Seq(
    StructField("citations", arr)))

  val AugmentsSchema: StructType = StructType(Seq(
    "aff_raw" -> arr, "aff" -> arr, "aff_abbrev" -> arr,
    "aff_canonical" -> arr, "aff_facet" -> arr, "aff_facet_hier" -> arr,
    "aff_id" -> arr, "institution" -> arr
  ).map { case (n, t) => StructField(n, t) })

  val BoostSchema: StructType = StructType(Seq(
    "doctype_boost" -> DoubleType, "refereed_boost" -> DoubleType,
    "recency_boost" -> DoubleType, "boost_factor" -> DoubleType,
    "astronomy_final_boost" -> DoubleType, "physics_final_boost" -> DoubleType,
    "earth_science_final_boost" -> DoubleType,
    "planetary_science_final_boost" -> DoubleType,
    "heliophysics_final_boost" -> DoubleType, "general_final_boost" -> DoubleType
  ).map { case (n, t) => StructField(n, t) })

  /** `{"access": "open"}` probe for the bib-only open-access override. */
  private val LinkSchema: StructType =
    StructType(Seq(StructField("access", StringType)))

  // ── expression helpers ────────────────────────────────────────────────

  /** generate_hier_facet for a fixed prefix depth (solr_updater.py:231-241)
    * over an array column: ["0/a", "1/a/b", …]. */
  private def hierFacet2(a: Column, b: Column): Column =
    array(concat(lit("0/"), a), concat(lit("1/"), a, lit("/"), b))

  private def hierFacet3(a: Column, b: Column, c: Column): Column =
    array(concat(lit("0/"), a), concat(lit("1/"), a, lit("/"), b),
      concat(lit("2/"), a, lit("/"), b, lit("/"), c))

  /** SIMBAD object-type → basic class (solr_updater.py:255-278), the
    * [[SolrTransform.mapSimbadType]] decision chain as expressions. */
  def simbadTypeCol(o: Column): Column =
    when(o.startsWith("G") || o.endsWith("G"), "Galaxy")
      .when(o === "Star" || o.contains("*"), "Star")
      .when(o === "Neb" || o.startsWith("PN") || o.startsWith("SNR"), "Nebula")
      .when(o === "HII", "HII Region")
      .when(o === "X", "X-ray")
      .when(o.startsWith("Radio") || o === "Maser" || o === "HI", "Radio")
      .when(o === "IR" || o.startsWith("Red"), "Infrared")
      .when(o === "UV", "UV")
      .otherwise("Other")

  /** NED object-type → basic class (solr_updater.py:311-325). */
  def nedTypeCol(o: Column): Column =
    when(o.startsWith("!"), "Galactic Object")
      .when(o.startsWith("*"), "Star")
      .when(o.startsWith("Uv"), "UV")
      .when(o.startsWith("Radio"), "Radio")
      .when(o.isin("G", "GClstr", "GGroup", "GPair", "GTrpl", "G_Lens", "PofG"), "Galaxy")
      .when(o.isin("Neb", "PN", "RfN"), "Nebula")
      .when(o === "HII", "HII Region")
      .when(o === "X", "X-ray")
      .when(o.isin("Maser", "HI"), "Radio")
      .when(o === "IrS", "Infrared")
      .when(o.isin("Blue*", "C*", "exG*", "Flare*", "Nova", "Psr", "Red*",
        "SN", "SNR", "V*", "VisS", "WD*", "WR*"), "Star")
      .otherwise("Other")

  private def nonEmptyArr(c: Column): Column =
    c.isNotNull && size(c) > 0

  private val SolrStampFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"

  /** Epoch-seconds slot-ordering key: absent slots sort last
    * (solr_updater.py's stable sort over get_timestamps). */
  private def slotTs(c: Column): Column =
    coalesce(c.cast("long"), lit(Long.MaxValue))

  // ── the document ──────────────────────────────────────────────────────

  /** Append a `doc` struct column holding the Catalyst-visible search
    * document for each master row. Input: a master-schema DataFrame
    * (MergeEngine.masterColumns). */
  /** PERMISSIVE `from_json` returns an ALL-NULL struct for malformed
    * input, not a null — indistinguishable from a valid `{}`. The typed
    * path SKIPS unparseable slots (a garbage payload contributes
    * nothing, and the boost defaults then apply). A corrupt-record
    * column would detect this but DISABLES Catalyst's from_json schema
    * pruning (corrupt semantics depend on the full parse), which is half
    * the point of this path — so validity rides a separate cheap probe:
    * `get_json_object(c, "$")` is null exactly when the payload doesn't
    * tokenize, which is also precisely the typed path's json4s
    * parse-failure condition (type mismatches do NOT corrupt either
    * side). */
  private def wellFormed(c: Column): Column =
    get_json_object(c, "$").isNotNull

  /** @param validated trust the payloads to be parseable JSON (the ingest
    *   front door already quarantines malformed messages — QueueDecode —
    *   so stored slots are parseable by construction): slot gates become
    *   plain raw-column presence and the per-payload well-formedness
    *   probe (a second full JSON tokenize per slot per row) is skipped —
    *   roughly half the full-document cost. With `validated = false` the
    *   probes make GARBAGE payloads contribute nothing, byte-for-byte the
    *   typed path's swallowed parse failure (the equivalence property
    *   runs this mode over generator-injected garbage). */
  /** slot parse expressions, keyed by the working-column name the doc
    * fold references them under */
  private val ParsedSlots: Seq[(String, () => Column)] = Seq(
    "_bib" -> (() => from_json(col("bib_data"), BibSchema)),
    "_nb" -> (() => from_json(col("nonbib_data"), NonbibSchema)),
    "_orc" -> (() => from_json(col("orcid_claims"), OrcidSchema)),
    "_ft" -> (() => from_json(col("fulltext"), FulltextSchema)),
    "_met" -> (() => from_json(col("metrics"), MetricsSchema)),
    "_aug" -> (() => from_json(col("augments"), AugmentsSchema)),
    "_cls" -> (() => from_json(col("classifications"), arr)),
    "_bf" -> (() => from_json(col("boost_factors"), BoostSchema)))

  def withDoc(master: DataFrame, docCol: String = "doc",
      validated: Boolean = false): DataFrame = {
    val out = ParsedSlots.foldLeft(master) { case (d, (n, c)) =>
      d.withColumn(n, c())
    }
    out.withColumn(docCol,
        struct(docFields(n => col(n), validated)
          .map { case (n, c) => c.as(n) }: _*))
      .drop(ParsedSlots.map(_._1): _*)
  }

  /** Names a projection may request — the doc struct's fields. */
  lazy val DocFieldNames: Seq[String] =
    docFields(n => lit(null), validated = true).map(_._1)

  /** The PROJECTION path: the requested doc fields as top-level columns
    * beside the record key, with each field's slot parse INLINED into
    * that field's expression instead of shared through a `_bib`-style
    * working column. Sharing is exactly what blocks pruning: a struct
    * (or a parse column) referenced by two consumers is non-cheap, so
    * CollapseProject refuses to inline it, OptimizeJsonExprs never sees
    * a from_json under the extraction, and the scan reads every payload
    * column. Inlined, each field's `from_json` parses a schema pruned to
    * the fields THAT expression touches and the parquet ReadSchema
    * shrinks to the feeding payload columns (pinned in PlanAuditSpec).
    * Two fields of one slot parse twice — but each parse is a pruned
    * one-field schema, so the total tokenize work matches the shared
    * two-field parse while staying optimizer-transparent. */
  def project(master: DataFrame, fields: Seq[String],
      validated: Boolean = false, keyCol: String = "bibcode"): DataFrame = {
    val parses = ParsedSlots.toMap
    val byName = docFields(n => parses(n)(), validated).toMap
    // duplicates collapse (the parquet writer rejects same-named
    // columns), requested order is preserved. When the key field is
    // itself requested, its DOC expression serves as the key column
    // (the doc bibcode falls back to the master key for records without
    // bib_data, so it is never weaker than the raw key) — substituting
    // the raw key would silently diverge this path from the typed
    // rendering it mirrors when a payload carries a re-keyed bibcode.
    val wanted = fields.distinct
    val cols =
      if (wanted.contains(keyCol)) wanted.map(f => byName(f).as(f))
      else col(keyCol) +: wanted.map(f => byName(f).as(f))
    master.select(cols.toIndexedSeq: _*)
  }

  /** Every doc field as (name, expression), the order of the reference's
    * fold; `parsed` resolves a slot working-column name to its parsed
    * struct (an attribute for the struct path, an inline from_json for
    * the projection path). */
  private def docFields(parsed: String => Column,
      validated: Boolean): Seq[(String, Column)] = {
    def bib(f: String): Column = parsed("_bib").getField(f)
    def nb(f: String): Column = parsed("_nb").getField(f)
    def aug(f: String): Column = parsed("_aug").getField(f)
    def bf(f: String): Column = parsed("_bf").getField(f)

    // Slot gates reference the RAW column's well-formedness, NOT the
    // parsed struct: `struct.isNotNull && struct.getField(...)` would
    // reference the from_json twice, which stops CollapseProject from
    // merging it into the consumer and thereby blocks Catalyst's
    // from_json schema pruning — the optimization this path exists for.
    // It is also the more faithful gate: the typed extractors run on ANY
    // parseable payload (a JSON array/scalar yields their defaults, same
    // as the null struct fields do here). The one slot that genuinely
    // needs object-ness is boost_factors (a non-object payload
    // contributes nothing and the =1 defaults apply), so only bfOk pays
    // the double reference — its schema is 10 doubles, nothing to prune.
    def ok(raw: String): Column =
      if (validated) col(raw).isNotNull else wellFormed(col(raw))
    val bibOk = ok("bib_data")
    val nbOk = ok("nonbib_data")
    val orcOk = ok("orcid_claims")
    val ftOk = ok("fulltext")
    val metOk = ok("metrics")
    val augOk = ok("augments")
    val clsOk = nonEmptyArr(parsed("_cls"))
    val bfOk = parsed("_bf").isNotNull && ok("boost_factors")

    val bibTs = slotTs(col("bib_data_updated"))
    val augTs = slotTs(col("augments_updated"))

    def gated(ok: Column, c: Column): Column = when(ok, c)

    // nonbib split (extract_data_pipeline, solr_updater.py:25-147)
    val readers = coalesce(nb("readers"), array())
    val referenceArr = coalesce(nb("reference"), array())
    val creditArr = coalesce(nb("credit"), array())
    val mentionArr = coalesce(nb("mention"), array())
    val dataArr = coalesce(nb("data"), array())

    val pf = filter(
      transform(coalesce(nb("planetary_feature"), array()),
        x => split(x, "/", 4)),
      a => size(a) === 4)
    val uatRaw = transform(coalesce(nb("uat"), array()), x => split(x, "/"))
    val grants = filter(
      transform(coalesce(nb("grants"), array()), x => split(x, " ", 2)),
      a => size(a) === 2)
    val simb = transform(coalesce(nb("simbad_objects"), array()),
      x => split(x, " ", 2))
    val ned = transform(coalesce(nb("ned_objects"), array()),
      x => split(x, " ", 2))
    def objId(p: Column): Column = element_at(p, 1)
    def objType(p: Column): Column = coalesce(element_at(p, 2), lit(""))

    // links_data precedence (override 1, solr_updater.py:476-484) + the
    // base arrival-order fold: nonbib contributes only when truthy; bib
    // contributes whenever the key is present; when both are truthy
    // nonbib wins regardless of age; an UNTRUTHY present bib key can
    // still shadow an older truthy nonbib value (the splat runs later)
    val bibLinks = bib("links_data")
    val nbLinks = nb("links_data")
    val bibLinksPresent = bibOk && bibLinks.isNotNull
    val bibLinksTruthy = bibOk && nonEmptyArr(bibLinks)
    val nbLinksTruthy = nbOk && nonEmptyArr(nbLinks)
    val nbTs = slotTs(col("nonbib_data_updated"))
    // tie-break: at equal timestamps the stable slot sort keeps
    // declaration order (bib_data before nonbib_data), so nonbib applies
    // LATER and wins — bib shadows only when strictly newer
    val linksData =
      when(nbLinksTruthy && bibLinksTruthy, nbLinks)
        .when(nbLinksTruthy && bibLinksPresent && bibTs > nbTs, bibLinks)
        .when(nbLinksTruthy, nbLinks)
        .when(bibLinksPresent, bibLinks)

    // bib-only open-access expansion (override 3, solr_updater.py:496-523);
    // an unparseable first link contributes NOTHING (the typed path's
    // swallowed parse failure), hence the well-formedness probe
    val firstLink = element_at(bibLinks, 1)
    val ld = from_json(firstLink, LinkSchema)
    val override3 = col("nonbib_data").isNull && bibLinksTruthy &&
      ld.isNotNull && wellFormed(firstLink)
    val open = override3 && ld.getField("access") === "open"
    val property =
      when(nbOk, coalesce(nb("property"), array()))
        .when(open, array(Seq("ESOURCE", "ARTICLE", "NOT REFEREED",
          "EPRINT_OPENACCESS", "OPENACCESS").map(lit): _*))
        .when(override3, array())
    val esources =
      when(nbOk, coalesce(nb("esource"), array()))
        .when(open, array(lit("EPRINT_HTML"), lit("EPRINT_PDF")))

    // aff precedence (extract_augments_pipeline, solr_updater.py:150-168):
    // aug.aff_raw > aug.aff > the doc's aff AT THE AUGMENTS SLOT'S TURN —
    // so a NEWER bib splat re-overwrites what an older augments slot chose
    val aff =
      when(!augOk, gated(bibOk, bib("aff")))
        .when(augTs < bibTs, coalesce(bib("aff"), aug("aff_raw"), aug("aff")))
        .otherwise(coalesce(aug("aff_raw"), aug("aff"), when(bibOk, bib("aff"))))

    // database (extract_classifications_pipeline + override 5,
    // solr_updater.py:170-181,531-539): the override unions the RAW list
    // with bib's; the slot-time path whitelists first
    val filteredCls = filter(parsed("_cls"),
      x => x.isInCollection(ExposeCollections))
    val database =
      when(bibOk && clsOk && nonEmptyArr(bib("database")),
        array_sort(array_distinct(concat(parsed("_cls"), bib("database")))))
        .when(clsOk && size(filteredCls) > 0,
          array_sort(array_distinct(filteredCls)))
        .when(clsOk, lit(null).cast(arr))
        .otherwise(gated(bibOk, bib("database")))

    // timestamps (get_timestamps, solr_updater.py:335-355)
    def stamp(c: Column): Column = date_format(c, SolrStampFmt)
    val updateTs = greatest(col("bib_data_updated"), col("nonbib_data_updated"),
      col("fulltext_updated"), col("orcid_claims_updated"), col("metrics_updated"))

    // boosts (extract_boost_pipeline + override 4 defaults,
    // solr_updater.py:184-216,524-529): a truthy boost payload contributes
    // its four base keys even as nulls (which then KEEP the null — the
    // default only fills absent keys); disciplines contribute only when
    // present
    def boostBase(k: String): Column =
      when(bfOk, bf(k)).otherwise(lit(1))
    def boostDiscipline(k: String): Column =
      when(bfOk && bf(k).isNotNull, bf(k)).otherwise(lit(1))

    val fields: Seq[(String, Column)] = Seq(
      // a bib payload carrying its own bibcode key splats OVER the seed
      // value (solr_updater.py's doc update order); empty scix_id → null
      "bibcode" -> coalesce(when(bibOk, bib("bibcode")), col("bibcode")),
      "id" -> col("id"),
      "scix_id" -> when(length(col("scix_id")) > 0, col("scix_id")),

      // bib splat (pinned schema)
      "abstract" -> gated(bibOk, bib("abstract")),
      "aff" -> aff,
      "alternate_bibcode" -> gated(bibOk, bib("alternate_bibcode")),
      "author" -> gated(bibOk, bib("author")),
      "author_count" -> gated(bibOk, bib("author_count")),
      "author_facet" -> gated(bibOk, bib("author_facet")),
      "author_facet_hier" -> gated(bibOk, bib("author_facet_hier")),
      "author_norm" -> gated(bibOk, bib("author_norm")),
      "bibgroup" -> when(nbOk && nonEmptyArr(nb("bibgroup")), nb("bibgroup"))
        .otherwise(gated(bibOk, bib("bibgroup"))),
      "bibgroup_facet" -> when(nbOk && nonEmptyArr(nb("bibgroup_facet")), nb("bibgroup_facet"))
        .otherwise(gated(bibOk, bib("bibgroup_facet"))),
      "bibstem" -> gated(bibOk, bib("bibstem")),
      "bibstem_facet" -> gated(bibOk, bib("bibstem_facet")),
      "database" -> database,
      "date" -> gated(bibOk, bib("date")),
      "doctype" -> gated(bibOk, bib("doctype")),
      "doctype_facet_hier" -> gated(bibOk, bib("doctype_facet_hier")),
      "editor" -> gated(bibOk, bib("editor")),
      "email" -> gated(bibOk, bib("email")),
      "first_author" -> gated(bibOk, bib("first_author")),
      "first_author_facet_hier" -> gated(bibOk, bib("first_author_facet_hier")),
      "first_author_norm" -> gated(bibOk, bib("first_author_norm")),
      "identifier" -> gated(bibOk, bib("identifier")),
      "links_data" -> linksData,
      "orcid_pub" -> gated(bibOk, bib("orcid_pub")),
      "page" -> gated(bibOk, bib("page")),
      "pub" -> gated(bibOk, bib("pub")),
      "pub_abbrev" -> gated(bibOk, bib("pub_abbrev")),
      "pub_raw" -> gated(bibOk, bib("pub_raw")),
      "pubdate" -> gated(bibOk, bib("pubdate")),
      "title" -> gated(bibOk, bib("title")),
      "volume" -> gated(bibOk, bib("volume")),
      "year" -> gated(bibOk, bib("year")),

      // orcid
      "orcid_user" -> gated(orcOk, parsed("_orc").getField("verified")),
      "orcid_other" -> gated(orcOk, parsed("_orc").getField("unverified")),

      // nonbib split
      "reader" -> gated(nbOk, readers),
      "read_count" -> gated(nbOk, size(readers)),
      "cite_read_boost" -> gated(nbOk, coalesce(nb("boost"), lit(0.0))),
      "classic_factor" -> gated(nbOk, coalesce(nb("norm_cites"), lit(0.0))),
      "reference" -> gated(nbOk, referenceArr),
      "reference_count" -> gated(nbOk,
        coalesce(nb("reference_count"), size(referenceArr))),
      "data" -> gated(nbOk, dataArr),
      "data_facet" -> gated(nbOk, transform(dataArr,
        x => element_at(split(x, ":"), 1))),
      "esources" -> esources,
      "property" -> property,
      "planetary_feature" -> gated(nbOk, transform(pf,
        a => concat_ws("/", slice(a, 1, 3)))),
      "planetary_feature_id" -> gated(nbOk, transform(pf, a => element_at(a, 4))),
      "planetary_feature_facet_hier_3level" -> gated(nbOk, flatten(transform(pf,
        a => hierFacet3(element_at(a, 1), element_at(a, 2), element_at(a, 3))))),
      "uat" -> gated(nbOk, transform(uatRaw,
        u => concat_ws("/", slice(u, lit(1), size(u) - 1)))),
      "uat_id" -> gated(nbOk, transform(uatRaw, u => element_at(u, -1))),
      "grant" -> gated(nbOk, flatten(transform(grants,
        a => array(element_at(a, 1), element_at(a, 2))))),
      "grant_facet_hier" -> gated(nbOk, flatten(transform(grants,
        a => hierFacet2(element_at(a, 1), element_at(a, 2))))),
      "simbid" -> gated(nbOk, transform(simb, objId(_))),
      "simbtype" -> gated(nbOk, transform(simb, p => simbadTypeCol(objType(p)))),
      "simbad_object_facet_hier" -> gated(nbOk, flatten(transform(simb,
        p => hierFacet2(simbadTypeCol(objType(p)), objId(p))))),
      "nedid" -> gated(nbOk, transform(ned, objId(_))),
      "nedtype" -> gated(nbOk, transform(ned, p => nedTypeCol(objType(p)))),
      "ned_object_facet_hier" -> gated(nbOk, flatten(transform(ned,
        p => hierFacet2(nedTypeCol(objType(p)), objId(p))))),
      "citation_count" -> gated(nbOk, coalesce(nb("citation_count"), lit(0))),
      "citation_count_norm" -> gated(nbOk,
        coalesce(nb("citation_count_norm"), lit(0))),
      "credit" -> gated(nbOk, creditArr),
      "credit_count" -> gated(nbOk,
        coalesce(nb("credit_count"), size(creditArr))),
      "mention" -> gated(nbOk, mentionArr),
      "mention_count" -> gated(nbOk,
        coalesce(nb("mention_count"), size(mentionArr))),

      // metrics
      "citation" -> gated(metOk, coalesce(parsed("_met").getField("citations"), array())),

      // fulltext
      "body" -> gated(ftOk, parsed("_ft").getField("body")),
      "ack" -> gated(ftOk, parsed("_ft").getField("acknowledgements")),
      "facility" -> gated(ftOk, parsed("_ft").getField("facility")),

      // augments (aff handled above)
      "aff_abbrev" -> gated(augOk, aug("aff_abbrev")),
      "aff_canonical" -> gated(augOk, aug("aff_canonical")),
      "aff_facet" -> gated(augOk, aug("aff_facet")),
      "aff_facet_hier" -> gated(augOk, aug("aff_facet_hier")),
      "aff_id" -> gated(augOk, aug("aff_id")),
      "institution" -> gated(augOk, aug("institution")),

      // boosts
      "doctype_boost" -> boostBase("doctype_boost"),
      "refereed_boost" -> when(bfOk, bf("refereed_boost")),
      "recency_boost" -> boostBase("recency_boost"),
      "boost_factor" -> boostBase("boost_factor"),
      "astronomy_final_boost" -> boostDiscipline("astronomy_final_boost"),
      "physics_final_boost" -> boostDiscipline("physics_final_boost"),
      "earth_science_final_boost" -> boostDiscipline("earth_science_final_boost"),
      "planetary_science_final_boost" -> boostDiscipline("planetary_science_final_boost"),
      "heliophysics_final_boost" -> boostDiscipline("heliophysics_final_boost"),
      "general_final_boost" -> boostDiscipline("general_final_boost"),

      // timestamps
      "metadata_mtime" -> when(updateTs.isNotNull, stamp(col("bib_data_updated"))),
      "nonbib_mtime" -> when(updateTs.isNotNull, stamp(col("nonbib_data_updated"))),
      "fulltext_mtime" -> when(updateTs.isNotNull, stamp(col("fulltext_updated"))),
      "orcid_mtime" -> when(updateTs.isNotNull, stamp(col("orcid_claims_updated"))),
      "metrics_mtime" -> when(updateTs.isNotNull, stamp(col("metrics_updated"))),
      "update_timestamp" -> stamp(updateTs)
    )
    val byName = fields.toMap

    // `has` (solr_updater.py:546-568): sorted field names whose value is
    // truthy with ≥1 letter-or-digit across joined elements; fields in
    // HasFields present in the pinned document, with their shape
    val hasExprs: Seq[(String, Column)] = HasFields.flatMap { f =>
      byName.get(f).map { c =>
        val text = f match {
          case "abstract" | "ack" | "body" | "doctype" | "first_author" |
               "pub" | "pub_raw" | "volume" => c
          case _ => concat_ws("", c) // array<string> fields
        }
        f -> (c.isNotNull && text.rlike("[\\p{L}\\p{Nd}]") &&
          // truthiness: empty string / empty array are falsy
          (f match {
            case "abstract" | "ack" | "body" | "doctype" | "first_author" |
                 "pub" | "pub_raw" | "volume" => length(c) > 0
            case _ => size(c) > 0
          }))
      }
    }
    val hasCol = array_sort(filter(
      array(hasExprs.map { case (f, flag) =>
        when(flag, lit(f)).otherwise(lit(null).cast("string"))
      }: _*),
      x => x.isNotNull))

    fields :+ ("has" -> hasCol)
  }
}
