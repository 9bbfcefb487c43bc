package graft.functions

import org.json4s._
import java.security.MessageDigest

/** Deterministic SciX identifier generation (reference: adsmp/app.py:197-202,
  * config.py:146-153). The reference delegates to the external
  * `SciXPipelineUtils.scix_id` library (not vendored in the reference repo);
  * its observable contract — pinned by test_solr_updater.py:371 — is a
  * stable id of shape `scix:XXXX-XXXX-XXXX` over a Crockford-base32-style
  * alphabet (no I/L/O/U), computed from the configured bib_data fields.
  *
  * We reproduce that contract: SHA-256 over the canonical serialization of
  * the configured fields, first 60 bits encoded as 12 Crockford-base32
  * chars grouped 4-4-4. Deterministic, collision-resistant, and pure — a
  * collision against an existing different bibcode is surfaced by the
  * merge engine as a self-join on scix_id (SURVEY.md T18).
  */
object ScixId {

  val GenerationFields: Seq[String] = Seq(
    "author_norm", "doi", "abstract", "title", "doctype", "pub_raw")

  private val Alphabet = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"

  /** Generate from a parsed bib_data document; None when bib_data carries
    * none of the generation fields (nothing stable to hash). */
  def generate(bibData: JValue, fields: Seq[String] = GenerationFields): Option[String] = {
    val parts = fields.map { f =>
      bibData \ f match {
        case JNothing | JNull => ""
        case JString(s)       => s
        case JArray(items)    => items.collect { case JString(s) => s }.mkString("\u0000")
        case other            => CanonicalJson.serialize(other)
      }
    }
    if (parts.forall(_.isEmpty)) None
    else {
      // NUL separator (written as an escape to keep this file text): a
      // printable joiner like space would make ("deep learning","survey")
      // and ("deep","learning survey") hash to the same id
      val digest = MessageDigest.getInstance("SHA-256")
        .digest(parts.mkString("\u0000").getBytes("UTF-8"))
      // take 60 bits = 12 base32 chars from the digest head
      val chars = (0 until 12).map { i =>
        val bitPos = i * 5
        val byteIdx = bitPos / 8
        val shift = bitPos % 8
        val word = ((digest(byteIdx) & 0xff) << 8) | (digest((byteIdx + 1) % digest.length) & 0xff)
        Alphabet((word >> (11 - shift)) & 31)
      }.mkString
      Some(s"scix:${chars.substring(0, 4)}-${chars.substring(4, 8)}-${chars.substring(8, 12)}")
    }
  }
}
