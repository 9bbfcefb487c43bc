package graft

import org.apache.spark.sql.SparkSession

/** Shared local SparkSession for specs — one JVM-wide session so the suite
  * doesn't pay session startup per test class. */
object SparkSpec {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

trait SparkSpec {
  lazy val spark: SparkSession = SparkSpec.spark
}
