package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date

/** The Z-order layout's defining property, on a planted 256×256 grid
  * where the right answer is known by construction: bit interleaving
  * bounds the EXPECTED per-file range of BOTH dimensions (mean measured
  * ≈ 0.49 / 0.32 of full range here), whereas a 1-D sort layout clusters
  * one dim and lets every file span the full range of the other (mean
  * exactly 1.0) — so min/max file skipping on the second predicate reads
  * the whole table. The mean, not the worst file, is the right metric: a
  * 5000-row cut that straddles top-level curve quadrants can legitimately
  * span a dimension, but skipping effectiveness is driven by the average
  * file a predicate must intersect. */
class ZOrderSpec extends AnyFunSuite with SparkSpec {

  test("z-order files bound both dims on average; a date-sorted layout " +
    "leaves partkey at full range in every file") {
    import spark.implicits._
    // day = q·16 and pk12 = r·16+15 put q and r in the same bit positions
    // (4..11), so the layout key is the Morton interleave of (q, r)
    val rows = for (q <- 0 until 256; r <- 0 until 256) yield {
      val i = q * 256 + r
      (i.toLong + 1, 1L, r.toLong * 16 + 15,
        Date.valueOf(java.time.LocalDate.of(1992, 1, 1).plusDays(q * 16L)))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    rows.toDF("l_orderkey", "l_linenumber", "l_partkey", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    val files = SparkEntry.queries("w3_zorder_layout")(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(files.map(_._1).sum == 256L * 256, "every row lands in a file")
    val full = 255.0 * 16
    val meanDay = files.map(f => f._3 - f._2).sum.toDouble / files.length / full
    val meanPk = files.map(f => f._5 - f._4).sum.toDouble / files.length / full
    assert(meanDay <= 0.6, s"mean per-file day fraction $meanDay")
    assert(meanPk <= 0.6, s"mean per-file pk fraction $meanPk")

    // the 1-D baseline: sort the same rows by day only, cut the same
    // 5000-row files — partkey spans the table in every single file
    val sorted = rows.sortBy(t => (t._4.toLocalDate.toEpochDay, t._1))
    val basePk = sorted.grouped(5000).map { f =>
      (f.map(_._3).max - f.map(_._3).min).toDouble / full
    }.toSeq
    assert(basePk.sum / basePk.length >= 0.95,
      "date-sorted files span the full partkey range on average")
  }
}
