package graft.functions

import org.json4s._
import java.util.zip.CRC32

/** Canonical JSON serialization + CRC32 checksumming with the exact
  * semantics of the reference's change-suppression checksum
  * (adsmp/app.py:594-626): top-level keys whose name contains any
  * ignore-pattern are dropped, keys are sorted, the document is rendered
  * exactly like Python's `json.dumps(data, sort_keys=True)` (", " / ": "
  * separators, `ensure_ascii` \uXXXX escapes, shortest round-trip float
  * repr), and the checksum is `hex(zlib.crc32(bytes) & 0xffffffff)`.
  *
  * Bit-parity matters: the checksum gates sink writes (SURVEY.md P4/T17),
  * so a replayed record must re-serialize to the identical string or
  * change-suppression breaks. Pure function of the row — embarrassingly
  * parallel, no shuffle, safe inside `Dataset.map`.
  */
object CanonicalJson {

  val IgnoreKeys: Seq[String] = Seq("mtime", "ctime", "update_timestamp")

  /** Python `repr(float)` / `json.dumps` float formatting: shortest string
    * that round-trips, fixed notation for 1e-4 <= |x| < 1e16, else
    * scientific with `e[+-]NN` (two-plus exponent digits).
    */
  def pyFloatRepr(d: Double): String = {
    if (d == 0.0) return if (1 / d < 0) "-0.0" else "0.0"
    if (d.isNaN) return "NaN"
    if (d.isInfinite) return if (d > 0) "Infinity" else "-Infinity"
    // shortest mantissa: grow %.<p>e precision until it round-trips
    var p = 0
    var sci = ""
    while ({ sci = String.format("%." + p + "e", Double.box(d)); sci.toDouble != d && p < 17 }) p += 1
    // sci looks like "-1.90e-01"; split into sign/digits/exponent
    val neg = sci.startsWith("-")
    val body = if (neg) sci.substring(1) else sci
    val Array(mant, expStr) = body.split("e")
    val digits = mant.replace(".", "").reverse.dropWhile(_ == '0').reverse match {
      case "" => "0"
      case s  => s
    }
    val exp = expStr.toInt
    val sign = if (neg) "-" else ""
    if (exp >= 16 || exp < -4) {
      val m = if (digits.length == 1) digits else digits.head + "." + digits.tail
      val es = if (exp < 0) f"-${-exp}%02d" else f"+$exp%02d"
      s"$sign${m}e$es"
    } else if (exp >= digits.length - 1) {
      sign + digits + "0" * (exp - digits.length + 1) + ".0"
    } else if (exp >= 0) {
      sign + digits.substring(0, exp + 1) + "." + digits.substring(exp + 1)
    } else {
      sign + "0." + "0" * (-exp - 1) + digits
    }
  }

  /** Python json.dumps default (ensure_ascii=True) string escaping. */
  def escapeString(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    sb.append('"')
    s.foreach {
      case '"'           => sb.append("\\\"")
      case '\\'          => sb.append("\\\\")
      case '\n'          => sb.append("\\n")
      case '\r'          => sb.append("\\r")
      case '\t'          => sb.append("\\t")
      case '\b'          => sb.append("\\b")
      case '\f'          => sb.append("\\f")
      case c if c < 0x20 || c > 0x7e => sb.append(f"\\u${c.toInt}%04x")
      case c             => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }

  /** Serialize with sorted keys, matching json.dumps(x, sort_keys=True). */
  def serialize(v: JValue): String = v match {
    case JNull | JNothing => "null"
    case JBool(b)         => if (b) "true" else "false"
    case JInt(i)          => i.toString
    case JLong(l)         => l.toString
    case JDouble(d)       => pyFloatRepr(d)
    case JDecimal(d)      => d.toString
    case JString(s)       => escapeString(s)
    case JArray(items)    => items.map(serialize).mkString("[", ", ", "]")
    case JSet(items)      => items.toList.map(serialize).mkString("[", ", ", "]")
    case JObject(fields)  =>
      fields.sortBy(_._1).map { case (k, fv) => escapeString(k) + ": " + serialize(fv) }
        .mkString("{", ", ", "}")
  }

  private def crcHex(bytes: Array[Byte]): String = {
    val crc = new CRC32()
    crc.update(bytes)
    "0x" + java.lang.Long.toHexString(crc.getValue & 0xffffffffL)
  }

  /** Checksum of a raw string payload (app.py:607-613). */
  def checksum(data: String): String =
    crcHex(data.getBytes("UTF-8"))

  /** Checksum of a JSON document: drop volatile keys, sort, serialize, CRC
    * (app.py:614-626). Patterns match *anywhere* in the key name.
    */
  def checksumOf(data: JValue, ignoreKeys: Seq[String] = IgnoreKeys): String = data match {
    case JString(s) => checksum(s)
    case JObject(fields) =>
      val kept = fields.filterNot { case (k, _) => ignoreKeys.exists(k.contains) }
      crcHex(serialize(JObject(kept)).getBytes("UTF-8"))
    case other => crcHex(serialize(other).getBytes("UTF-8"))
  }
}
