package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}

/** Accessors for the driver-provided testdata tables (TESTDATA.md).
  *
  * Plain parquet scans — Catalyst handles column pruning and filter
  * pushdown, so every query should `select`/`filter` declaratively and
  * let the scan read only what it needs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(names.contains(name),
      s"unknown table '$name'; expected one of ${names.mkString(", ")}")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS): Spark reads it as a nanosecond
    // Long (spark.sql.legacy.parquet.nanosAsLong, set in Engine.configure)
    // and we truncate to microsecond TimestampType — the same ns→µs
    // truncation DuckDB's epoch_us/CAST(ts AS TIMESTAMP) performs, so oracle
    // comparisons agree (FIXTURES.md, SURVEY.md §7 timestamp-fidelity risk).
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
