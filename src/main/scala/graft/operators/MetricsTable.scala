package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import java.sql.Timestamp

import graft.transform.SolrTransform

/** The metrics store (reference MetricsModel, adsmp/models.py:195-232) and
  * its upsert semantics (adsmp/app.py:45-77,514-556; pinned by
  * tests/test_metrics_update.py:83-166):
  *
  *   - keyed uniquely by bibcode; the row id is assigned at first insert
  *     and stable across updates;
  *   - an update REPLACES the whole row: fields absent from the incoming
  *     payload revert to their column defaults (refereed=false,
  *     author_num=1, counts 0, arrays empty) — not coalesced with the old
  *     values;
  *   - last write per bibcode wins within a batch.
  *
  * Spark shape: parse payloads to typed rows with defaults applied, take
  * the last per bibcode, full-outer-join the existing table on bibcode —
  * incoming side wins wholesale, id survives from the existing side.
  */
object MetricsTable {

  case class MetricsRow(
      id: Long,
      bibcode: String,
      an_citations: Option[Float],
      an_refereed_citations: Option[Float],
      author_num: Int,
      citations: Seq[String],
      citation_num: Int,
      downloads: Seq[Int],
      reads: Seq[Int],
      refereed: Boolean,
      refereed_citations: Seq[String],
      refereed_citation_num: Int,
      reference_num: Int,
      rn_citations: Option[Float],
      rn_citation_data: Option[String],
      modtime: Option[Timestamp])

  /** Parse one metrics payload applying the column defaults. */
  def fromJson(bibcode: String, payload: String, now: Timestamp): MetricsRow = {
    val j = SolrTransform.parse(payload)
    def int(k: String, d: Int): Int = j \ k match {
      case JInt(i)  => i.toInt
      case JLong(l) => l.toInt
      case _        => d
    }
    def flt(k: String): Option[Float] = j \ k match {
      case JDouble(d)  => Some(d.toFloat)
      case JInt(i)     => Some(i.toFloat)
      case JDecimal(d) => Some(d.toFloat)
      case _           => None
    }
    def bool(k: String, d: Boolean): Boolean = j \ k match {
      case JBool(b) => b
      case _        => d
    }
    def strsOf(k: String): Seq[String] = j \ k match {
      case JArray(xs) => xs.collect { case JString(s) => s }
      case _          => Nil
    }
    def ints(k: String): Seq[Int] = j \ k match {
      case JArray(xs) => xs.collect { case JInt(i) => i.toInt; case JLong(l) => l.toInt }
      case _          => Nil
    }
    MetricsRow(
      id = 0L, // assigned by the upsert (stable once inserted)
      bibcode = bibcode,
      an_citations = flt("an_citations"),
      an_refereed_citations = flt("an_refereed_citations"),
      author_num = int("author_num", 1),
      citations = strsOf("citations"),
      citation_num = int("citation_num", 0),
      downloads = ints("downloads"),
      reads = ints("reads"),
      refereed = bool("refereed", d = false),
      refereed_citations = strsOf("refereed_citations"),
      refereed_citation_num = int("refereed_citation_num", 0),
      reference_num = int("reference_num", 0),
      rn_citations = flt("rn_citations"),
      rn_citation_data = j \ "rn_citation_data" match {
        case JNothing | JNull => None
        case v => Some(graft.functions.CanonicalJson.serialize(v))
      },
      modtime = Some(now))
  }

  def emptyTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[MetricsRow].toDF
  }

  /** S7 upsert: whole-row replace per bibcode, stable id, last-in-batch
    * wins. One shuffle for the in-batch dedup, one co-located join.
    *
    * `incoming` must carry an explicit `seq` column (arrival timestamp or
    * sequence number): the reference's "last write wins" is wall-clock
    * ordered (adsmp/app.py:514-556), and any implicit stand-in such as
    * `monotonically_increasing_id` reflects partition layout, which is
    * nondeterministic after a shuffle. */
  def upsert(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val spark = existing.sparkSession
    val cols = emptyTable(spark).columns
    require(incoming.columns.contains("seq"),
      "MetricsTable.upsert: incoming batch must carry an explicit `seq` " +
        "arrival-order column (in-batch last-write-wins must not depend on " +
        "partition layout)")
    // last message per bibcode within the batch, by explicit arrival order
    val latest = incoming
      .groupBy(col("bibcode")).agg(max_by(struct(cols.map(col): _*), col("seq")).as("r"))
      .select(col("r.*"))
    val e = existing.as("e")
    val n = latest.as("n")
    val joined = e.join(n, col("e.bibcode") === col("n.bibcode"), "full_outer")
    // positive-range mask, not abs (abs(Long.MinValue) is negative);
    // bibcode stays the unique key — id is a stable synthetic surrogate
    val newId = xxhash64(coalesce(col("n.bibcode"), col("e.bibcode")))
      .bitwiseAND(lit(Long.MaxValue))
    joined.select(
      (Seq(
        coalesce(col("e.id"), newId).as("id"),
        coalesce(col("n.bibcode"), col("e.bibcode")).as("bibcode")) ++
        cols.filterNot(c => c == "id" || c == "bibcode").map { c =>
          // incoming row wins wholesale (defaults already applied in
          // fromJson); existing value survives only when no update came
          when(col("n.bibcode").isNotNull, col(s"n.$c")).otherwise(col(s"e.$c")).as(c)
        }): _*)
  }

  /** M8 — delete metrics rows by bibcode (adsmp/app.py:586-592). */
  def delete(existing: DataFrame, bibcodes: DataFrame): DataFrame =
    existing.join(bibcodes.select(col("bibcode")), Seq("bibcode"), "left_anti")
}
