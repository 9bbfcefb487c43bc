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
