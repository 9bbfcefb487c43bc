package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MergeEngine
import graft.streaming.QueueDecode

/** S1 queue-envelope decode — ports the `task_update_record` family from
  * the reference (adsmp/tests/test_tasks.py:81-245): per-type storage,
  * list-envelope fan-out (NonBibRecordList/MetricsRecordList), unknown
  * types rejected (IgnorableException), deleted statuses passed through.
  */
class QueueDecodeSpec extends AnyFunSuite with SparkSpec {

  private val t0 = new Timestamp(1700000000000L)

  private def decode(lines: String*) = {
    import spark.implicits._
    QueueDecode.decode(spark.createDataset(lines), t0)
  }

  test("single fulltext envelope stores its body slot " +
    "(test_task_update_record_fulltext)") {
    import spark.implicits._
    val d = decode(
      """{"type":"fulltext","bibcode":"2015ApJ...815..133S","timestamp":1700000001000,"payload":{"body":"INTRODUCTION"}}""")
    val msgs = QueueDecode.messages(d).collect()
    assert(msgs.length == 1)
    assert(msgs.head.mtype == "fulltext")
    assert(msgs.head.payload == """{"body":"INTRODUCTION"}""")
    // through the store: the slot lands on the record like update_storage
    val merged = MergeEngine.upsert(MergeEngine.emptyMaster(spark),
      QueueDecode.messages(d)).master
    val row = merged.selectExpr("bibcode",
      "get_json_object(fulltext, '$.body')").as[(String, String)].collect()
    assert(row.toSeq == Seq(("2015ApJ...815..133S", "INTRODUCTION")))
  }

  test("nonbib and metrics list envelopes fan out per element " +
    "(test_task_update_record_nonbib_list, test_task_update_record_metrics_list, " +
    "test_task_update_record_metrics, test_task_update_record_augments_list)") {
    val d = decode(
      """{"type":"nonbib_records","timestamp":1700000002000,"records":[{"bibcode":"2003ASPC..295..361M","boost":3},{"bibcode":"3003ASPC..295..361Z","boost":4}]}""",
      """{"type":"metrics_records","timestamp":1700000003000,"records":[{"bibcode":"2015ApJ...815..133S"},{"bibcode":"3015ApJ...815..133Z"}]}""")
    val msgs = QueueDecode.messages(d).collect().sortBy(m => (m.mtype, m.bibcode))
    assert(msgs.map(_.mtype).toSeq ==
      Seq("metrics", "metrics", "nonbib_data", "nonbib_data"))
    assert(msgs.map(_.bibcode).toSeq == Seq(
      "2015ApJ...815..133S", "3015ApJ...815..133Z",
      "2003ASPC..295..361M", "3003ASPC..295..361Z"))
    // each element keeps its own JSON as the slot payload (tasks.py:72-80)
    assert(msgs.find(_.bibcode == "2003ASPC..295..361M").get.payload ==
      """{"bibcode":"2003ASPC..295..361M","boost":3}""")
    assert(QueueDecode.rejects(d).count() == 0)
  }

  test("unknown type and malformed envelopes are rejected with reasons (app.py:363)") {
    val d = decode(
      """{"type":"frobnicate","bibcode":"X","timestamp":1}""",
      """not json at all""",
      """{"bibcode":"X"}""",
      """{"type":"metadata"}""",
      """{"type":"nonbib_records","records":[]}""")
    assert(QueueDecode.messages(d).count() == 0)
    val reasons = QueueDecode.rejects(d).collect().map(_._2).toSet
    assert(reasons == Set("unknown type frobnicate", "not a JSON object",
      "missing type", "missing bibcode", "list envelope without records"))
  }

  test("augment envelope stores the whole payload in the augments slot " +
    "(test_tasks:166 test_task_update_record_augments)") {
    import spark.implicits._
    val d = decode(
      """{"type":"augment","bibcode":"B1","timestamp":1000,"payload":{"aff":["MIT"],"aff_canonical":["Massachusetts Institute of Technology"]}}""")
    val m = QueueDecode.messages(d).collect()
    assert(m.length == 1 && m.head.mtype == "augment")
    assert(m.head.payload.contains("aff_canonical"), "full payload retained")
    val master = MergeEngine.upsert(MergeEngine.emptyMaster(spark),
      QueueDecode.messages(d)).master
    assert(master.selectExpr("get_json_object(augments, '$.aff[0]')")
      .as[String].collect().toSeq == Seq("MIT"))
  }

  test("classify envelope stores ONLY its collections list " +
    "(tasks.py:90-95 payload['collections'] extraction)") {
    import spark.implicits._
    val d = decode(
      """{"type":"classify","bibcode":"B1","timestamp":1000,"payload":{"collections":["astrophysics","heliophysics"],"scores":[0.9,0.4]}}""")
    val m = QueueDecode.messages(d).collect()
    assert(m.length == 1 && m.head.mtype == "classify")
    assert(m.head.payload == """["astrophysics","heliophysics"]""",
      "the classifications slot holds the bare collections list")
    // a classify response without collections is an error, like the
    // reference's KeyError
    val bad = decode(
      """{"type":"classify","bibcode":"B2","timestamp":1000,"payload":{"scores":[1.0]}}""")
    val r = QueueDecode.rejects(bad).collect()
    assert(r.length == 1 && r.head._2 == "classify message without collections")
    // deleted-status classify messages clear the slot whether or not a
    // payload rides along — the reference checks status before the
    // collections extraction (tasks.py:60-77 vs :90-95), so neither form
    // may hit the missing-collections error
    val del = decode(
      """{"type":"classify","bibcode":"B1","timestamp":2000,"status":"deleted"}""",
      """{"type":"classify","bibcode":"B2","timestamp":2000,"status":"deleted","payload":{}}""")
    val dm = QueueDecode.messages(del).collect()
    assert(dm.length == 2 && dm.forall(_.status.contains("deleted")))
    assert(dm.forall(_.payload == null), "deleted messages carry no payload")
  }

  test("boost envelope lands in the boost_factors slot (test_tasks boost path)") {
    import spark.implicits._
    val d = decode(
      """{"type":"boost","bibcode":"B1","timestamp":1000,"payload":{"boost_basic":0.4,"boost_final":0.7}}""")
    val master = MergeEngine.upsert(MergeEngine.emptyMaster(spark),
      QueueDecode.messages(d)).master
    assert(master.selectExpr("get_json_object(boost_factors, '$.boost_final')")
      .as[String].collect().toSeq == Seq("0.7"))
  }

  test("deleted status passes through on both single and protobuf-int forms") {
    val d = decode(
      """{"type":"metadata","bibcode":"B1","timestamp":1,"status":"deleted"}""",
      """{"type":"fulltext","bibcode":"B2","timestamp":2,"status":1,"payload":{"body":"x"}}""",
      """{"type":"metadata","bibcode":"B3","timestamp":3,"status":"active","payload":{}}""")
    val byBib = QueueDecode.messages(d).collect().map(m => m.bibcode -> m.status).toMap
    assert(byBib == Map("B1" -> Some("deleted"), "B2" -> Some("deleted"), "B3" -> None))
  }

  test("missing timestamp falls back to the injected ingest time") {
    val d = decode("""{"type":"metadata","bibcode":"B1","payload":{}}""")
    assert(QueueDecode.messages(d).collect().head.ts == t0)
  }

  test("decoded stream drives the store: slot-deleted clears, record survives " +
    "(test_task_update_record_delete)") {
    import spark.implicits._
    val put = decode(
      """{"type":"fulltext","bibcode":"B1","timestamp":1000,"payload":{"foo":"bar"}}""",
      """{"type":"metadata","bibcode":"B1","timestamp":1001,"payload":{"bibcode":"B1"}}""")
    val m1 = MergeEngine.upsert(MergeEngine.emptyMaster(spark),
      QueueDecode.messages(put)).master
    assert(m1.selectExpr("get_json_object(fulltext, '$.foo')")
      .as[String].collect().toSeq == Seq("bar"))
    val del = decode(
      """{"type":"fulltext","bibcode":"B1","timestamp":2000,"status":"deleted"}""")
    val m2 = MergeEngine.upsert(m1, QueueDecode.messages(del)).master
    val row = m2.selectExpr("bibcode", "fulltext", "bib_data").collect()
    assert(row.length == 1 && row.head.getString(0) == "B1")
    assert(row.head.isNullAt(1), "deleted slot cleared")
    assert(!row.head.isNullAt(2), "record survives with its other slots")
  }

  test("fuzz: decodeOne is total — arbitrary strings and mutated JSON " +
    "always yield a decode or a reasoned reject, never a throw") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val ts = new Timestamp(0L)
    val jsonish = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.oneOf(
        """{"bibcode": null}""", """[1, 2, {"x": []}]""", """{"status":""",
        """{"bibcode": 7, "type": "metadata", "payload": 3}""",
        """{"bibcode": "b", "type": ["metadata"], "payload": {}}""",
        """{"bibcode": "b", "type": "nonbib_records", "payload": {"not": "a list"}}""",
        "\u0000\ufffd", "{}", "null", "[]", ""),
      Gen.listOf(Gen.oneOf('{', '}', '[', ']', '"', ':', ',', 'a', '1', ' '))
        .map(_.mkString))
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500),
      Prop.forAll(jsonish) { s =>
        val out = QueueDecode.decodeOne(s, ts)
        out.nonEmpty && out.forall(d =>
          if (d.ok) d.reason.isEmpty && d.bibcode.nonEmpty
          else d.reason.nonEmpty && d.raw == s)
      })
    assert(r.passed, r.toString)
  }
}
