package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.TextCatalog

/** r17 parity pin: the fused PII admission UDF (one invocation returning
  * (pii_total, clean_text)) must be value-identical to the r16 expression
  * form — three independent `regexp_extract_all` counts over the ORIGINAL
  * text plus the sequential email→ip→phone `regexp_replace` chain — on
  * every document, including adversarial overlaps where fusing the passes
  * naively would change the answer. */
class PiiParitySpec extends AnyFunSuite with SparkSpec {

  private def exprForm = struct(
    (TextCatalog.piiMatches(col("t"), TextCatalog.PiiEmailRe) +
      TextCatalog.piiMatches(col("t"), TextCatalog.PiiIpRe) +
      TextCatalog.piiMatches(col("t"), TextCatalog.PiiPhoneRe)).as("total"),
    TextCatalog.piiScrubbed(col("t")).as("clean"))

  private def udfForm = {
    val p = TextCatalog.piiAdmitUdf(col("t"))
    struct(p("_1").as("total"), p("_2").as("clean"))
  }

  private def assertParity(texts: Seq[String]): Unit = {
    import spark.implicits._
    val df = texts.toDF("t")
      .select(col("t"), exprForm.as("e"), udfForm.as("u"))
    val bad = df.filter(!(col("e") <=> col("u"))).collect()
    assert(bad.isEmpty, s"PII parity broke on: ${bad.take(3).mkString(" | ")}")
  }

  test("adversarial overlaps: counts stay on the original text, scrub " +
    "stays sequential") {
    assertParity(Seq(
      // phone inside an email's local part: email count 1, phone count 1,
      // but the scrub consumes the whole email first
      "reach me at a+15551234567b@mail.com now",
      // IP inside an email's domain
      "x@10.1.2.3.example.com logged",
      // bare IP and phone adjacent to an email
      "a@b.co 10.0.0.1 +12345678 a@b.co",
      // a replace must not create a new match across its boundary
      "+1234567@x.io",        // phone regex can start inside the email
      "10.1.1.1@host.net",    // ip prefix flows into an email match
      // repeated and back-to-back matches
      "a@b.io a@b.io a@b.io", "10.0.0.1 10.0.0.2",
      "+9999999 +88888888",
      // non-matches and boundaries
      "", "plain words only", "999.999.999.999.999", "+123456 too-short",
      "UPPER@CASE.COM is case-sensitive here"))
  }

  test("parity on the planted sf0.001 corpus (every planted variant)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(TextCatalog.piiPlanted.as("t"))
    val withBoth = docs.select(exprForm.as("e"), udfForm.as("u"))
    val bad = withBoth.filter(!(col("e") <=> col("u"))).count()
    assert(bad == 0L, s"$bad corpus rows diverge between PII forms")
  }

  test("the funnel's admission flags carry the fused values: pii_total " +
    "matches the three-regex sum on a planted sample") {
    import spark.implicits._
    val sample = Seq(
      (0L, "s", "en", "mail me a@b.co from 10.1.1.1 or +7654321 thanks"),
      (1L, "s", "fr", "rien a signaler"),
      (2L, "s", "de", "x@10.9.8.7.org und +123456789"))
      .toDF("doc_id", "source", "lang", "pii_text")
    val got = graft.catalog.PrepPipelineCatalog.admissionFlags(sample)
      .select(col("doc_id"), col("pii_total"), col("clean_text"))
    val want = sample.select(col("doc_id"),
      (TextCatalog.piiMatches(col("pii_text"), TextCatalog.PiiEmailRe) +
        TextCatalog.piiMatches(col("pii_text"), TextCatalog.PiiIpRe) +
        TextCatalog.piiMatches(col("pii_text"), TextCatalog.PiiPhoneRe))
        .as("pii_total"),
      TextCatalog.piiScrubbed(col("pii_text")).as("clean_text"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "admissionFlags diverges from the expression form")
  }
}
