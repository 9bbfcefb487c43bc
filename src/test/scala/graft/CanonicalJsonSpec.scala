package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.functions.CanonicalJson

/** Bit-parity tests for the canonical serializer + checksum against values
  * computed with CPython's json.dumps/zlib.crc32 (the reference's
  * app.checksum, adsmp/app.py:594-626). */
class CanonicalJsonSpec extends AnyFunSuite {

  test("python float repr parity") {
    val cases = Seq(
      1e16 -> "1e+16", 1e-5 -> "1e-05", -2.0 -> "-2.0", 0.2 -> "0.2",
      1234567890123456.7 -> "1234567890123456.8",
      1.5e16 -> "1.5e+16", 3.14e-7 -> "3.14e-07",
      123456789012345.67 -> "123456789012345.67",
      0.1899999976158142 -> "0.1899999976158142",
      0.0 -> "0.0", 1.0 -> "1.0", 0.5142857142857143 -> "0.5142857142857143")
    cases.foreach { case (d, expected) =>
      assert(CanonicalJson.pyFloatRepr(d) == expected, s"for $d")
    }
  }

  test("float repr round-trips (property)") {
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val d = rnd.nextInt(4) match {
        case 0 => rnd.nextDouble() * 2e18 - 1e18
        case 1 => rnd.nextDouble()
        case 2 => java.lang.Double.longBitsToDouble(rnd.nextLong()) match {
          case x if x.isNaN || x.isInfinite => 1.25
          case x => x
        }
        case _ => rnd.nextInt(1000000).toDouble
      }
      val s = CanonicalJson.pyFloatRepr(d)
      assert(s.toDouble == d, s"$d -> $s")
    }
  }

  test("sorted-key serialization matches json.dumps(sort_keys=True)") {
    val doc = JObject(List(
      "b" -> JInt(1),
      "a" -> JArray(List(JDouble(1.5), JDouble(0.2))),
      "x_mtime" -> JString("drop"),
      "update_timestamp" -> JString("x"),
      "text" -> JString("héllo\n"),
      "f" -> JDouble(0.1899999976158142),
      "big" -> JDouble(1e16),
      "small" -> JDouble(1e-5),
      "neg" -> JDouble(-2.0),
      "i" -> JInt(42),
      "t" -> JBool(true),
      "n" -> JNull))
    val kept = JObject(doc.obj.filterNot { case (k, _) =>
      CanonicalJson.IgnoreKeys.exists(k.contains) })
    assert(CanonicalJson.serialize(kept) ==
      "{\"a\": [1.5, 0.2], \"b\": 1, \"big\": 1e+16, \"f\": 0.1899999976158142, " +
      "\"i\": 42, \"n\": null, \"neg\": -2.0, \"small\": 1e-05, \"t\": true, " +
      "\"text\": \"h\\u00e9llo\\n\"}")
    // checksum computed with CPython: hex(zlib.crc32(...) & 0xffffffff)
    assert(CanonicalJson.checksumOf(doc) == "0x6b7e7c5c")
  }

  test("string checksum parity") {
    assert(CanonicalJson.checksum("foo") == "0x8c736521")
  }

  test("checksum is insensitive to volatile keys and key order (property)") {
    val rnd = new scala.util.Random(7)
    val vals: Seq[JValue] = Seq(JInt(1), JString("v"), JNull, JBool(false))
    (1 to 200).foreach { _ =>
      val m = (1 to rnd.nextInt(10)).map { _ =>
        rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString -> vals(rnd.nextInt(vals.length))
      }.toMap
      val base = JObject(m.toList)
      val shuffled = JObject(rnd.shuffle(m.toList))
      val withVolatile = JObject(m.toList :+ ("solr_mtime" -> (JString("2026"): JValue)) :+
        ("update_timestamp" -> (JString("now"): JValue)))
      assert(CanonicalJson.checksumOf(base) == CanonicalJson.checksumOf(shuffled))
      assert(CanonicalJson.checksumOf(base) == CanonicalJson.checksumOf(withVolatile))
    }
  }

  test("serialization round-trips through a JSON parser") {
    val doc = JObject(List("a" -> JArray(List(JString("x\"y\\z"), JInt(3))),
      "nested" -> JObject(List("k" -> JDouble(2.5)))))
    assert(JsonMethods.parse(CanonicalJson.serialize(doc)) == doc)
  }

  test("fuzz: checksum and serialize are total over arbitrary JSON values " +
    "and strings (every master payload passes through them each batch)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.json4s._
    val leaf: Gen[JValue] = Gen.oneOf(
      Gen.asciiPrintableStr.map(JString(_)),
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(JInt(_)),
      Gen.chooseNum(-1e300, 1e300).map(JDouble(_)),
      Gen.oneOf(JNull, JBool(true), JBool(false), JNothing))
    def tree(depth: Int): Gen[JValue] =
      if (depth == 0) leaf
      else Gen.oneOf(leaf,
        Gen.listOfN(3, tree(depth - 1)).map(JArray(_)),
        Gen.listOfN(3, Gen.zip(Gen.alphaNumStr.map(_.take(8)), tree(depth - 1)))
          .map(fs => JObject(fs.map { case (k, v) => JField(k, v) })))
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300),
      Prop.forAll(tree(3), Gen.asciiPrintableStr) { (v, s) =>
        val c1 = CanonicalJson.checksumOf(v)
        val c2 = CanonicalJson.checksum(s)
        val ser = CanonicalJson.serialize(v)
        c1.length > 0 && c2.startsWith("0x") && ser != null &&
          CanonicalJson.checksumOf(v) == c1  // deterministic
      })
    assert(r.passed, r.toString)
  }
}
