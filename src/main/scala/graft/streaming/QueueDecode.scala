package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.records.{MasterRecord, UpdateMessage}

/** S1 — queue-envelope decode (reference adsmp/app.py:335-379
  * `get_msg_type`/`get_msg_status`, adsmp/tasks.py:41-108
  * `task_update_record`). The reference receives typed protobufs over its
  * queue; this build's queue carries their JSON reduction, one envelope
  * per line:
  *
  * {{{
  * {"type":"nonbib_data","bibcode":"...","timestamp":1700000000000,
  *  "status":"active","payload":{...}}
  * }}}
  *
  * List envelopes — the reference's `NonBibRecordList` /
  * `MetricsRecordList` batch types — carry `"records":[{...},...]` and
  * flatten to one slot message per element with the element's own
  * `bibcode`, exactly as `task_update_record` iterates
  * `msg.nonbib_records` (tasks.py:69-80). Unknown types are rejected with
  * a reason, mirroring the reference's `IgnorableException`; the caller
  * decides whether to quarantine or drop.
  *
  * Spark-first shape: the decode is an inherently row-wise imperative
  * boundary (the reference's protobuf deserialize), so it runs as a
  * compiled flatMap over `Dataset[String]` — one pass, no driver
  * involvement, scales with input partitions.
  */
object QueueDecode {

  /** One decode outcome row: `ok` rows carry an [[UpdateMessage]] worth of
    * fields (list envelopes emit several); reject rows keep the raw
    * envelope and a reason for quarantine. */
  case class Decoded(
      ok: Boolean,
      bibcode: String,
      mtype: String,
      payload: String,
      ts: Timestamp,
      status: Option[String],
      raw: String,
      reason: String)

  /** Reference `get_msg_type` single-record types → our slot-keyed mtype
    * (app.py:335-363; `metadata` covers DenormalizedRecord). */
  private val SingleTypes: Set[String] = MasterRecord.typeToSlot.keySet

  /** Reference list types → the element mtype they flatten to
    * (tasks.py:69-80). */
  private val ListTypes: Map[String, String] = Map(
    "nonbib_records" -> "nonbib_data",
    "metrics_records" -> "metrics")

  private def str(v: JValue): Option[String] = v match {
    case JString(s) if s.nonEmpty => Some(s)
    case _ => None
  }

  /** `get_msg_status` (app.py:365-379): protobuf status 1 = deleted; our
    * JSON reduction also accepts the string form. Anything else is
    * active. */
  private def statusOf(v: JValue): Option[String] = v match {
    case JString("deleted") => Some("deleted")
    case JInt(n) if n == 1 => Some("deleted")
    case _ => None
  }

  private def tsOf(v: JValue, default: Timestamp): Timestamp = v match {
    case JInt(ms) => new Timestamp(ms.toLong)
    case JLong(ms) => new Timestamp(ms)
    case JString(s) =>
      try Timestamp.valueOf(s.replace('T', ' ').stripSuffix("Z"))
      catch { case _: Throwable => default }
    case _ => default
  }

  /** Decode one envelope. List envelopes fan out; a malformed or
    * unknown-typed envelope yields a single reject row. */
  def decodeOne(json: String, defaultTs: Timestamp): Seq[Decoded] = {
    def reject(reason: String) =
      Seq(Decoded(ok = false, null, null, null, defaultTs, None, json, reason))
    val root = try JsonMethods.parse(json) catch { case _: Throwable => JNothing }
    root match {
      case obj: JObject =>
        val ts = tsOf(obj \ "timestamp", defaultTs)
        val status = statusOf(obj \ "status")
        str(obj \ "type") match {
          case Some(t) if SingleTypes.contains(t) =>
            str(obj \ "bibcode") match {
              case Some(bib) =>
                // a classify response stores ONLY its collections list in
                // the classifications slot (tasks.py:90-95 extracts
                // payload['collections'] before update_storage); a message
                // without one is an error, as the reference's KeyError is
                obj \ "payload" match {
                  case p if p == JNothing || status.contains("deleted") =>
                    // payload-less envelopes and deleted-status messages
                    // carry no usable payload: the merge nulls the slot
                    // (or deletes the record) regardless, and the
                    // reference handles status=deleted BEFORE the classify
                    // collections extraction (tasks.py:60-77 vs :90-95),
                    // so a deleted classify message must never hit the
                    // missing-collections error
                    Seq(Decoded(ok = true, bib, t, null, ts, status, json, null))
                  case p =>
                    val body = if (t == "classify") p \ "collections" else p
                    body match {
                      case JNothing =>
                        reject("classify message without collections")
                      case b =>
                        Seq(Decoded(ok = true, bib, t,
                          JsonMethods.compact(JsonMethods.render(b)), ts, status, json, null))
                    }
                }
              case None => reject("missing bibcode")
            }
          case Some(t) if ListTypes.contains(t) =>
            obj \ "records" match {
              case JArray(elems) if elems.nonEmpty =>
                elems.map {
                  case el: JObject =>
                    str(el \ "bibcode") match {
                      case Some(bib) =>
                        Decoded(ok = true, bib, ListTypes(t),
                          JsonMethods.compact(JsonMethods.render(el)), ts,
                          statusOf(el \ "status").orElse(status), json, null)
                      case None =>
                        Decoded(ok = false, null, null, null, ts, None, json,
                          "list element missing bibcode")
                    }
                  case _ =>
                    Decoded(ok = false, null, null, null, ts, None, json,
                      "list element not an object")
                }
              case _ => reject("list envelope without records")
            }
          case Some(t) => reject(s"unknown type $t")
          case None => reject("missing type")
        }
      case _ => reject("not a JSON object")
    }
  }

  /** Decode a dataset of raw envelopes into outcome rows. One compiled
    * flatMap; callers split with [[messages]] / [[rejects]]. */
  def decode(raw: Dataset[String], defaultTs: Timestamp): Dataset[Decoded] = {
    import raw.sparkSession.implicits._
    raw.flatMap(decodeOne(_, defaultTs))
  }

  def messages(decoded: Dataset[Decoded]): Dataset[UpdateMessage] = {
    import decoded.sparkSession.implicits._
    decoded.filter(_.ok)
      .map(d => UpdateMessage(d.bibcode, d.mtype, d.payload, d.ts, d.status))
  }

  def rejects(decoded: Dataset[Decoded]): Dataset[(String, String)] = {
    import decoded.sparkSession.implicits._
    decoded.filter(!_.ok).map(d => (d.raw, d.reason))
  }
}
