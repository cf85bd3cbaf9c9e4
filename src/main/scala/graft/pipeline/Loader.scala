package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.BinaryType

/** Insert-if-absent loader — the *intended* semantics of the reference's
  * GCSToPostgres (gcs_to_postgres.py:153-181): project, dedup on PK against
  * the target, bulk-append. The reference's dedup is dead code (it checks an
  * empty list, :153-158) and collects all existing PKs to the client
  * (:155-156) — at 100 TB that is fatal, so here the membership test is a
  * distributed left anti join on the PK columns (the one genuine join in the
  * reference's semantics, SURVEY.md §2A O13), and in-batch duplicates are
  * dropped first (the reference misses those entirely).
  */
object Loader {

  /** Append `incoming` to `table`, inserting only PK-absent rows.
    * Empty `pkCols` → plain append (task_instance path: PK commented out at
    * rpt.sql:58-62). Single action — no row counting here, so the anti join
    * runs exactly once. */
  def dedupAppend(spark: SparkSession, incoming: DataFrame, table: String,
                  pkCols: Seq[String]): Unit = {
    val deduped =
      if (pkCols.isEmpty) incoming
      else {
        val existing = spark.table(table).select(pkCols.map(col): _*)
        // NB the using-columns join reorders output (keys first); the final
        // coercion below restores table order — insertInto is positional.
        incoming
          .dropDuplicates(pkCols)
          .join(existing, pkCols, "left_anti")
      }
    val toInsert = coerceToTable(spark, deduped, table)
    // Append is job-atomic, comparable to the reference's per-file COPY
    // atomicity (gcs_to_postgres.py:178-181).
    toInsert.write.mode("append").insertInto(table)
  }

  /** Sink-side type coercion, driven by the table schema — the Spark analog
    * of Postgres COPY coercing staged text to the DDL types (SURVEY.md §1.2). */
  private def coerceToTable(spark: SparkSession, df: DataFrame, table: String): DataFrame = {
    val target = spark.table(table).schema
    df.select(target.map(f => col(f.name).cast(f.dataType)): _*)
  }
}
