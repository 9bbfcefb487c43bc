package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, oracle-checkable query per operator in SURVEY.md §2.
  *
  * Contract (driver-side): `queries(name)(spark, sfDir)` must return a
  * DataFrame whose sorted-by-name columns hash-match the DuckDB result of
  * `oracle(name)` run over the same parquet tables. Operators that DuckDB
  * SQL cannot express (streaming, custom state) appear in `queries` only —
  * the driver then records a weaker rows>0 check.
  *
  * Both sides alias every computed column to the same name, pin value types
  * (BIGINT vs HUGEINT sums, INT vs BIGINT lengths), sort array payloads, and
  * end with a total-order ORDER BY so the comparison is bit-deterministic.
  */
trait Catalog {
  type QFn = (SparkSession, String) => DataFrame
  def queries: Map[String, QFn]
  def oracle: Map[String, String]
}

object Catalog {
  /** Release every catalog-held cached/pinned resource in one call — the
    * explicit teardown for long-lived sessions that the per-query caches
    * (LM vocab tables, funnel flags, PQ slices, …) otherwise leave to LRU
    * eviction under the documented session-scoped discipline. Bench and
    * Verify call this between queries so timings and memory stay
    * independent; an interactive service should call it between corpus
    * swaps. Covers the plan-keyed memo maps (connected components), the
    * pinned ordinal frames (sitemap/packing), and every `.cache()`d
    * relation in the session (`spark.catalog.clearCache`). */
  def unpersistAll(spark: SparkSession): Unit = {
    graft.operators.Sitemap.releasePinned()
    graft.operators.Packing.releasePinned()
    DedupCatalog.clearMemos()
    spark.catalog.clearCache()
  }
}
