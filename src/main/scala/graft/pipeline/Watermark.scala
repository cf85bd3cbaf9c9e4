package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, max}

/** Incremental-extraction watermark (reference O3/O4/O9, SURVEY.md §2A).
  *
  * The reference stringifies `SELECT Max(start_date)` through XCom and adds
  * one microsecond to fake an exclusive bound (`>=` after `+1µs`,
  * airflow_to_gcs.py:165-167) with a `"None"` string sentinel for the empty
  * table (airflow_to_gcs.py:162,214). Here the watermark is a typed
  * `Option[Timestamp]` and the bound is a strict `>` — same semantics, no
  * serialization hops, no precision loss (SURVEY.md §7 risk note).
  *
  * This is the one legitimate driver-side scalar in the pipeline: a 1-row
  * aggregate. The PK pre-scan the reference also collects
  * (gcs_to_postgres.py:155) stays distributed — see Loader.
  */
object Watermark {

  /** MAX of the watermark column, None when the table is empty. */
  def maxWatermark(spark: SparkSession, table: String, column: String): Option[Timestamp] =
    Option(spark.table(table).agg(max(col(column))).first().getTimestamp(0))

  /** Keep rows strictly above the watermark; no-op when none exists yet.
    * Late rows (at/below the watermark) are dropped — the reference's
    * implicit late-data policy.
    *
    * NULL watermark values: a NULL never satisfies `col > ts`, so rows with
    * a NULL watermark column load exactly once — on the FIRST run (empty
    * table → no watermark → no filter) — and are excluded from every
    * incremental run after it. For no-PK entities (task_instance) that is
    * precisely what prevents their re-append/duplication. */
  def applyWatermark(df: DataFrame, column: String, wm: Option[Timestamp]): DataFrame =
    wm.fold(df)(ts => df.filter(col(column) > lit(ts)))
}
