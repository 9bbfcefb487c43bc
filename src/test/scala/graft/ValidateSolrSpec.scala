package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.functions.SequenceRatio
import graft.operators.ValidateSolr
import graft.operators.ValidateSolr._

/** Port of the reference's SOLR validator semantics (adsmp/validate.py):
  * the per-field tolerance matrix, the difflib ratio (goldens pinned against
  * CPython 3.11 `difflib.SequenceMatcher(None, a, b).ratio()`), and the
  * distributed whole-core diff. */
class ValidateSolrSpec extends AnyFunSuite with SparkSpec {

  private def doc(fields: (String, JValue)*): Map[String, JValue] = fields.toMap

  // ---- SequenceRatio vs CPython difflib goldens ----------------------------

  test("SequenceRatio matches CPython difflib goldens") {
    val goldens = Seq(
      ("intechreport", "techreport", 0.9090909090909091),
      ("The quick brown fox", "The quick brown fax", 0.9473684210526315),
      ("abcd", "abcd", 1.0),
      ("abcd", "efgh", 0.0),
      ("Astronomy and Astrophysics", "Astronomy & Astrophysics", 0.92),
      ("", "x", 0.0),
      ("", "", 1.0),
      ("aaa bbb ccc ddd", "ddd ccc bbb aaa", 0.3333333333333333),
      ("An abstract about stars.", "An abstract about stars", 0.9787234042553191))
    for ((a, b, want) <- goldens)
      assert(math.abs(SequenceRatio.ratio(a, b) - want) < 1e-12,
        s"ratio('$a','$b') = ${SequenceRatio.ratio(a, b)}, want $want")
  }

  test("SequenceRatio implements difflib autojunk on long strings") {
    // |b| >= 200 engages autojunk: popular chars stop seeding matches.
    // CPython: autojunk=True -> 0.449438202247191, False -> 0.745318...
    val a = ("the galaxy rotation curves were measured with high precision " * 5)
      .substring(0, 260)
    val b = a.substring(0, 120) + "INSERTED TEXT " + a.substring(120)
    assert(math.abs(SequenceRatio.ratio(a, b) - 0.449438202247191) < 1e-12)
  }

  // ---- fields_match rule matrix (validate.py:125-233) ----------------------

  test("citation and identifier compare order-insensitively") {
    val a = doc("citation" -> JArray(List(JString("b1"), JString("b2"))))
    val b = doc("citation" -> JArray(List(JString("b2"), JString("b1"))))
    assert(fieldsMatch("citation", a, b) == Matched)
    val c = doc("citation" -> JArray(List(JString("b1"))))
    assert(fieldsMatch("citation", a, c) == Mismatched,
      "different citation sets mismatch")
    val i1 = doc("identifier" -> JArray(List(JString("x"), JString("y"))))
    val i2 = doc("identifier" -> JArray(List(JString("y"), JString("x"))))
    assert(fieldsMatch("identifier", i1, i2) == Matched)
  }

  test("citation_count tolerates drift of up to 3") {
    def d(n: Int) = doc("citation_count" -> JInt(n))
    assert(fieldsMatch("citation_count", d(10), d(13)) == Matched)
    assert(fieldsMatch("citation_count", d(10), d(7)) == Matched)
    assert(fieldsMatch("citation_count", d(10), d(14)) == Mismatched)
  }

  test("cite_read_boost: zero rules and the 10% band relative to old") {
    def d(x: Double) = doc("cite_read_boost" -> JDouble(x))
    assert(fieldsMatch("cite_read_boost", d(0), d(0)) == Matched)
    assert(fieldsMatch("cite_read_boost", d(0), d(0.5)) == Mismatched)
    assert(fieldsMatch("cite_read_boost", d(0.5), d(0)) == Mismatched)
    assert(fieldsMatch("cite_read_boost", d(1.0), d(1.09)) == Matched)
    assert(fieldsMatch("cite_read_boost", d(1.0), d(1.11)) == Mismatched)
  }

  test("data: CDS->SIMBAD rename forgiven once, rest order-insensitive") {
    val a = doc("data" -> JArray(List(JString("CDS"), JString("NED:12"))))
    val b = doc("data" -> JArray(List(JString("NED:12"), JString("SIMBAD"))))
    assert(fieldsMatch("data", a, b) == Matched)
    val c = doc("data" -> JArray(List(JString("NED:12"), JString("Chandra"))))
    assert(fieldsMatch("data", a, c) == Mismatched)
  }

  test("doctype: intechreport->techreport forgiven, one-directional") {
    val a = doc("doctype" -> JString("intechreport"))
    val b = doc("doctype" -> JString("techreport"))
    assert(fieldsMatch("doctype", a, b) == Matched)
    // reverse direction falls to generic: ratio 0.909 >= 0.8 so it still
    // matches via the fuzzy-string path, exactly as the reference would
    assert(fieldsMatch("doctype", b, a) == Matched)
    assert(fieldsMatch("doctype", a, doc("doctype" -> JString("article")))
      == Mismatched)
  }

  test("reference: count-only comparison") {
    val a = doc("reference" -> JArray(List(JString("r1"), JString("r2"))))
    val b = doc("reference" -> JArray(List(JString("zz"), JString("yy"))))
    assert(fieldsMatch("reference", a, b) == Matched,
      "same count passes even with different entries")
    val c = doc("reference" -> JArray(List(JString("r1"))))
    assert(fieldsMatch("reference", a, c) == Mismatched)
  }

  test("generic: fuzzy strings pass at ratio >= 0.8, numbers by value") {
    val a = doc("pub" -> JString("Astronomy and Astrophysics"))
    val b = doc("pub" -> JString("Astronomy & Astrophysics")) // ratio 0.92
    assert(fieldsMatch("pub", a, b) == Matched)
    val c = doc("pub" -> JString("Nature"))
    assert(fieldsMatch("pub", a, c) == Mismatched)
    // ints and doubles compare like Python ==
    assert(fieldsMatch("year", doc("year" -> JInt(2024)),
      doc("year" -> JDouble(2024.0))) == Matched)
    assert(fieldsMatch("author", doc("author" -> JArray(List(JString("A")))),
      doc("author" -> JArray(List(JString("B"))))) == Mismatched,
      "non-special lists compare exactly")
  }

  test("presence classification: required-new vs plain missing vs one-sided") {
    val empty = doc()
    val has = doc("esources" -> JArray(Nil), "aff" -> JArray(Nil))
    assert(fieldsMatch("esources", empty, empty) == MissingRequiredNew,
      "esources is a required new field")
    assert(fieldsMatch("aff", empty, empty) == NotInEither)
    assert(fieldsMatch("aff", empty, has) == NotInOld)
    assert(fieldsMatch("aff", has, empty) == NotInNew)
  }

  test("compare aggregates pipeline_mismatch counters; ignored fields skipped") {
    val oldDoc = JsonMethods.parse(
      """{"bibcode": "b", "title": ["T"], "citation_count": 10,
         "recid": 1, "year": "2024"}""")
    val newDoc = JsonMethods.parse(
      """{"bibcode": "b", "title": ["T"], "citation_count": 20,
         "recid": 999, "year": "1999"}""")
    val r = ValidateSolr.compare("b", oldDoc, newDoc)
    assert(r.status == "mismatch")
    assert(r.mismatched == Seq("citation_count", "year"),
      "recid is in ignore_fields and must not count")
    assert(r.missingRequired == ValidateSolr.NewFields.size,
      "every required new field is absent from both")
    assert(r.notInOld == 0 && r.notInNew == 0)
  }

  // ---- distributed whole-core diff -----------------------------------------

  test("compareDocs full-outer-joins two core dumps and classifies presence") {
    import spark.implicits._
    val oldDocs = Seq(
      ("b1", """{"title": ["same"], "year": "2020"}"""),
      ("b2", """{"title": ["old only"]}"""),
      ("b4", """{"year": "2001"}""")).toDF("bibcode", "doc")
    val newDocs = Seq(
      ("b1", """{"title": ["same"], "year": "2020"}"""),
      ("b3", """{"title": ["new only"]}"""),
      ("b4", """{"year": "1901"}""")).toDF("bibcode", "doc")
    val rs = ValidateSolr.compareDocs(oldDocs, newDocs)
      .collect().map(r => r.bibcode -> r).toMap
    assert(rs("b1").status == "ok")
    assert(rs("b2").status == "missing-new")
    assert(rs("b3").status == "missing-old")
    assert(rs("b4").status == "mismatch" && rs("b4").mismatched == Seq("year"))
  }

  test("CLI -c validates named bibcodes through injected fetchers") {
    val docs = Map(
      "bA" -> ("""{"title": ["x"]}""", """{"title": ["x"]}"""),
      "bB" -> ("""{"year": "2000"}""", """{"year": "1900"}"""))
    val oldF = new DocFetcher {
      def fetch(b: String) = docs.get(b).map(_._1)
    }
    val newF = new DocFetcher {
      def fetch(b: String) = docs.get(b).map(_._2)
    }
    val log = collection.mutable.Buffer.empty[String]
    val root = java.nio.file.Files.createTempDirectory("graft_vs").toString
    // the validate path never touches the store, but --store is mandatory
    new graft.sources.MasterStore(s"$root/master")
    val t = new CliSpec.CountingTransport
    val d = Cli.Deps(t, t, out = log += _,
      validateFetchers = Some((oldF, newF)))
    assert(Cli.run(spark, Seq("--store", s"$root/master",
      "-c", "-b", "bA bB bC"), d) == 0)
    assert(log.exists(_.contains("bA: no mismatched fields")), s"got $log")
    assert(log.exists(l => l.contains("bB: 1 mismatches") && l.contains("year")),
      s"got $log")
    assert(log.exists(_.contains("bC: not in either core")), s"got $log")
    assert(log.exists(_.contains("validated 3 bibcodes: 1 clean, 2 flagged")),
      s"got $log")
    // no fetchers configured -> actionable error, like --rebuild-collection
    assert(Cli.run(spark, Seq("--store", s"$root/master", "-c", "-b", "bA"),
      Cli.Deps(t, t, out = log += _)) == 2)
  }
}
