package graft.sources

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parallel JDBC extraction — the read side of the engine's RDBMS surface
  * (JdbcSink is the write side). The reference's warehouse IS a Postgres
  * database; a user replacing it wholesale needs to pull existing tables
  * out in parallel, not through one connection.
  *
  * 100 TB posture: `readPartitionedAuto` discovers the partition bounds
  * with ONE driver-side scalar query (min/max — bounded like a watermark
  * read, the only driver-side values in this engine) and then issues
  * `numPartitions` stride-range scans, one JDBC connection per task.
  * Predicates and column pruning push into the remote database
  * (JDBCRelation PushedFilters — asserted in JdbcSourceSpec), so a
  * filtered extraction ships only matching rows over the wire. Stride
  * partitioning is uniform in VALUE space; for skewed keys pick a
  * near-uniform column (a sequence PK, an ingest timestamp) — the same
  * guidance as every range-partitioned scan.
  */
object JdbcSource {

  /** Plain single-connection read (small dims, metadata tables). */
  def read(spark: SparkSession, url: String, table: String,
           props: Properties = new Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Partitioned read with explicit bounds: `numPartitions` range scans
    * over `[lowerBound, upperBound]` on `partCol` (numeric/date/timestamp,
    * per Spark's JDBC partitioning contract). */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partCol: String, lowerBound: String, upperBound: String,
                      numPartitions: Int,
                      props: Properties = new Properties): DataFrame =
    spark.read
      .option("partitionColumn", partCol)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .jdbc(url, table, props)

  /** Partitioned read with DISCOVERED bounds: one scalar min/max round
    * trip, then the stride scans. Empty tables fall back to a plain read
    * (no bounds to stride over). */
  def readPartitionedAuto(spark: SparkSession, url: String, table: String,
                          partCol: String, numPartitions: Int,
                          props: Properties = new Properties): DataFrame = {
    // names reach a raw SQL string: validate the shape so a user-supplied
    // name cannot smuggle SQL into the probe. Plain identifiers pass RAW —
    // the same case-folding the subsequent Spark read applies to its own
    // raw `dbtable` — and a reserved-word / mixed-case name must arrive
    // pre-quoted (`"Order"`), exactly as it would for `dbtable`; dialect-
    // quoting a plain name here would break that symmetry (Derby folds
    // unquoted t→T, so probing "t" while Spark reads t finds nothing).
    val idPat = "^[A-Za-z_][A-Za-z0-9_$]*$"
    def validated(name: String, what: String): String = {
      def okPart(s: String) =
        s.matches(idPat) ||
          (s.length > 2 && s.head == '"' && s.last == '"' &&
            !s.substring(1, s.length - 1).contains('"'))
      require(name.nonEmpty && name.split('.').forall(okPart),
        s"$what '$name' is not a plain or quoted (optionally dotted) identifier")
      name
    }
    val qTable = validated(table, "table")
    val qCol = validated(partCol, "partition column")
    val conn = DriverManager.getConnection(url, props)
    val (lo, hi) =
      try {
        val rs = conn.createStatement().executeQuery(
          s"SELECT MIN($qCol), MAX($qCol) FROM $qTable")
        rs.next()
        (Option(rs.getString(1)), Option(rs.getString(2)))
      } finally conn.close()
    (lo, hi) match {
      case (Some(l), Some(h)) if l != h =>
        readPartitioned(spark, url, table, partCol, l, h, numPartitions, props)
      case _ => read(spark, url, table, props) // empty or single-valued
    }
  }
}
