package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

import graft.operators.MetricsTable
import graft.operators.MetricsTable.MetricsRow

/** Ports the reference's metrics-upsert semantics tests
  * (adsmp/tests/test_metrics_update.py:83-166): insert with defaults,
  * whole-row replace on update (absent fields revert to defaults),
  * stable id per bibcode, last-in-batch wins, M8 delete. */
class MetricsTableSpec extends AnyFunSuite with SparkSpec {

  val now = Timestamp.valueOf("2024-01-01 00:00:00")

  def rows(ps: (String, String)*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    spark.createDataset(ps.zipWithIndex.map { case ((b, p), i) =>
      (MetricsTable.fromJson(b, p, now), i.toLong)
    }).select(col("_1.*"), col("_2").as("seq"))
  }

  def byBib(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("bibcode") -> r).toMap

  test("insert, update, id stability (test_update_records, test_update_metrics)") {
    val t0 = MetricsTable.emptyTable(spark)
    val v1 = MetricsTable.upsert(t0,
      rows("bib1" -> """{"refereed": true, "author_num": 1}"""))
    val m1 = byBib(v1)
    assert(m1("bib1").getAs[Boolean]("refereed"))
    assert(m1("bib1").getAs[Int]("author_num") == 1)
    val id1 = m1("bib1").getAs[Long]("id")

    val v2 = MetricsTable.upsert(v1, rows(
      "bib1" -> """{"refereed": false, "author_num": 5}""",
      "bib2" -> """{"refereed": true, "author_num": 2}"""))
    val m2 = byBib(v2)
    assert(!m2("bib1").getAs[Boolean]("refereed"))
    assert(m2("bib1").getAs[Int]("author_num") == 5)
    assert(m2("bib1").getAs[Long]("id") == id1, "id stable across updates")
    assert(m2("bib2").getAs[Int]("author_num") == 2)
    assert(m2("bib2").getAs[Long]("id") != id1)

    val v3 = MetricsTable.upsert(v2, rows(
      "bib2" -> """{"refereed": false, "author_num": 4}""",
      "bib1" -> """{"refereed": false, "author_num": 5}""",
      "bib3" -> """{"author_num": 3}"""))
    val m3 = byBib(v3)
    assert(m3("bib2").getAs[Int]("author_num") == 4)
    assert(m3("bib3").getAs[Int]("author_num") == 3)
    assert(v3.count() == 3)
  }

  test("defaults on insert and on whole-row replace (test_update_default_values)") {
    val v1 = MetricsTable.upsert(MetricsTable.emptyTable(spark),
      rows("bib9" -> """{"bibcode": "bib9"}"""))
    assert(!byBib(v1)("bib9").getAs[Boolean]("refereed"), "refereed defaults false")
    assert(byBib(v1)("bib9").getAs[Int]("author_num") == 1, "author_num defaults 1")

    val v2 = MetricsTable.upsert(v1, rows("bib9" -> """{"refereed": true}"""))
    assert(byBib(v2)("bib9").getAs[Boolean]("refereed"))

    // update WITHOUT the field → reverts to default (whole-row replace)
    val v3 = MetricsTable.upsert(v2, rows(
      "bib9" -> """{"bibcode": "bib9"}""",
      "bib10" -> """{"refereed": true}"""))
    val m3 = byBib(v3)
    assert(!m3("bib9").getAs[Boolean]("refereed"), "absent field reverts to default")
    assert(m3("bib10").getAs[Boolean]("refereed"))
  }

  test("last write per bibcode wins within one batch") {
    val v = MetricsTable.upsert(MetricsTable.emptyTable(spark), rows(
      "dup" -> """{"author_num": 1}""",
      "dup" -> """{"author_num": 9}"""))
    assert(v.count() == 1)
    assert(byBib(v)("dup").getAs[Int]("author_num") == 9)
  }

  test("in-batch winner is seq-determined, independent of partition layout") {
    // shuffle the batch across partitions: the highest-seq row must still
    // win — this is exactly the case monotonically_increasing_id got wrong
    val batch = rows(
      "dup" -> """{"author_num": 1}""",
      "dup" -> """{"author_num": 2}""",
      "dup" -> """{"author_num": 9}""",
      "other" -> """{"author_num": 7}""").repartition(7)
    val v = MetricsTable.upsert(MetricsTable.emptyTable(spark), batch)
    assert(v.count() == 2)
    assert(byBib(v)("dup").getAs[Int]("author_num") == 9)
    assert(byBib(v)("other").getAs[Int]("author_num") == 7)
  }

  test("upsert refuses a batch without an explicit seq column") {
    val noSeq = rows("a" -> "{}").drop("seq")
    val e = intercept[IllegalArgumentException] {
      MetricsTable.upsert(MetricsTable.emptyTable(spark), noSeq)
    }
    assert(e.getMessage.contains("seq"))
  }

  test("M8 delete by bibcode (test_delete_metrics)") {
    import spark.implicits._
    val v = MetricsTable.upsert(MetricsTable.emptyTable(spark), rows(
      "keep" -> "{}", "drop" -> "{}"))
    val after = MetricsTable.delete(v, Seq("drop").toDF("bibcode"))
    assert(after.collect().map(_.getAs[String]("bibcode")).toSeq == Seq("keep"))
  }
}
