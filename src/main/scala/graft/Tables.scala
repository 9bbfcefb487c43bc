package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated deterministic test tables (TESTDATA.md).
  *
  * All catalog queries take a `sfDir` (e.g. /root/testdata/sf0.01) and read
  * one parquet file per table. Reads go through `spark.read.parquet` so
  * Catalyst gets column pruning + filter pushdown for free; at cluster scale
  * the same loaders would point at a partitioned table root instead of a
  * single file and nothing else changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** r16: memoized logical frames per (session, dir, table). Every
    * `spark.read.parquet` call re-infers the schema from the file footer
    * and rebuilds the relation — paid per Tables call per query
    * construction, hundreds of times per bench pass. The memo reuses the
    * immutable plan tree; nothing is persisted or cached — every
    * execution still scans the parquet.
    *
    * r17: the memo holds ONE session's frames at a time, keyed by the
    * session object itself (reference equality — the r16 form keyed on
    * System.identityHashCode, which can collide, and retained entries of
    * stopped sessions forever). A load from a different session swaps the
    * whole map, so a long-lived driver cycling sessions holds at most the
    * live session's ≤ dirs×tables frames; the frames themselves reference
    * their session, so per-session maps in a weak-keyed registry would
    * never be collected anyway. */
  private val memo = new java.util.concurrent.atomic.AtomicReference[
    (SparkSession, Map[String, DataFrame])]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val key = sfDir + ":" + name
    while (true) {
      val cur = memo.get()
      val sameSession = cur != null && (cur._1 eq spark)
      if (sameSession && cur._2.contains(key)) return cur._2(key)
      val df = loadFresh(spark, sfDir, name)
      val base = if (sameSession) cur._2 else Map.empty[String, DataFrame]
      if (memo.compareAndSet(cur, (spark, base + (key -> df)))) return df
      // lost a race: retry against the new map (loadFresh is cheap and
      // side-effect-free, so a duplicate derivation is harmless)
    }
    throw new IllegalStateException("unreachable")
  }

  private def loadFresh(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet has shipped ts as either TIMESTAMP(NANOS) (which Spark 4
    // rejects without nanosAsLong) or plain TIMESTAMP(MICROS); normalize both
    // to a session-UTC TimestampType so every downstream query and oracle sees
    // identical microsecond instants regardless of the generator's vintage.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      df.schema("ts").dataType match {
        case LongType => // epoch nanos as int64: truncate to µs like DuckDB does
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          // naive µs mean UTC wall-clock instants. The cast interprets the
          // wall clock in the SESSION time zone, so shift back by that
          // zone's offset: an identity under the UTC sessions every entry
          // point configures, and correct under any fixed-offset session
          // tz. Known residual: a geographic zone with DST misconverts by
          // 1h for wall clocks inside its spring-forward gap (the cast
          // resolves the nonexistent local time before the shift-back) —
          // run with a UTC or fixed-offset session tz for oracle parity.
          import org.apache.spark.sql.functions.from_utc_timestamp
          val tz = spark.conf.get("spark.sql.session.timeZone")
          df.withColumn("ts",
            from_utc_timestamp(col("ts").cast(TimestampType), tz))
        case _ => df
      }
    } else df
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
