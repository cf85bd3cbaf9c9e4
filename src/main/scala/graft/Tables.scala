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
    // and we FLOOR it to microsecond TimestampType — `div` truncates toward
    // zero, which would disagree with DuckDB's flooring epoch_us by 1µs for
    // pre-epoch (negative) nanosecond timestamps (FIXTURES.md, SURVEY.md §7
    // timestamp-fidelity risk).
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(nsFloorToMicros))
    else df
  }

  /** Exact integer floor division of a ns Long to µs (no double rounding,
    * correct for negative values). */
  private[graft] def nsFloorToMicros: org.apache.spark.sql.Column =
    expr("(ts - (((ts % 1000) + 1000) % 1000)) div 1000")

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
