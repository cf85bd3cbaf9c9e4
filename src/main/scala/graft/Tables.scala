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
    val df = parallelize(spark.read.parquet(s"$dir/$name.parquet"),
      s"$dir/$name.parquet")
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

  /** Unsplittable-input guard (optimization guide §2.5): the driver
    * fixtures ship each table as ONE parquet file with one row group, so
    * every scan is a single partition and any per-row work fused into the
    * scan stage (HOF folds, decimal dots, codec walks) runs on 1 of N
    * cores — measured 368 → 249 s across the full sf0.1 inventory (v_pca's
    * Gram pass alone 11.5 s single-task). When the file layout supplies
    * fewer partitions than the session's parallelism, repartition
    * round-robin right after the read; rows are payload-light at this
    * size (the exchange is micro-seconds against multi-second scan-stage
    * compute). SCALE-ADAPTIVE, not a local[32] constant: a multi-file
    * corpus (gen_scale sf1+, any real deployment) already scans at ≥
    * defaultParallelism partitions and the condition no-ops; tables under
    * 64 KB (dimension tables — region/nation/supplier) skip it, since
    * their scans feed broadcasts where an exchange is pure overhead.
    * Hash-safety: every declared aggregate is order-independent by the
    * determinism contract (decimal sums, exact arithmetic, total-order
    * sorts before every limit), and the round-robin placement itself is
    * deterministic (sortBeforeRepartition, on by default). */
  private def parallelize(df: DataFrame, path: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // the probe (file-tree walk + RDD construction for the partition
    // count) costs 10-30 ms of driver planning per call — ~0.5 s/query
    // across a 3-table query's reps. The layout of a fixture path does
    // not change mid-JVM, so the DECISION is memoized per (path, target);
    // a stale entry could only mis-tune parallelism, never correctness
    // (round-robin placement is deterministic and every declared
    // aggregate is order-independent — the contract above).
    val doRepartition = decisionCache.computeIfAbsent((path, target), _ => {
      // listFiles() returns null on IO errors/races (ADVICE): treat as empty
      def bytes(f: java.io.File): Long =
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
            .map(bytes).sum
        else f.length()
      bytes(new java.io.File(path)) >= 64L * 1024 &&
        df.rdd.getNumPartitions < target
    })
    if (doRepartition) df.repartition(target) else df
  }

  private val decisionCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Boolean]()

  /** Exact integer floor division of a ns Long to µs (no double rounding,
    * correct for negative values). */
  private[graft] def nsFloorToMicros: org.apache.spark.sql.Column =
    expr("(ts - (((ts % 1000) + 1000) % 1000)) div 1000")

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
