package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.catalog._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator catalog into one `queries`/`oracleSql` map. Each
  * catalog object covers one slice of SURVEY.md §2 (relational operators,
  * record transforms, dedup, similarity search, text analysis, streaming).
  */
object SparkEntry {

  private val catalogs: Seq[Catalog] = Seq(
    RelationalCatalog,
    TransformCatalog,
    TextCatalog,
    DedupCatalog,
    SimilarityCatalog,
    RecordCatalog,
    MultimodalCatalog,
    PrepPipelineCatalog)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalogs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalogs.flatMap(_.oracle).toMap
}
