package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit, when}

/** Change-data derivation from two table snapshots — how CDC is
  * bootstrapped when a source has no change log, and the inverse of
  * [[JdbcSink.applyCdc]] (which replays the change set this emits):
  * FULL OUTER join old × new on the PK, null-SAFE payload comparison
  * (`<=>` — a null payload value is a value, not a wildcard), emit
  * `I` (absent → present), `D` (present → absent), `U` (payload changed);
  * unchanged rows vanish.
  *
  * The reference re-extracts overlapping windows and relies on
  * insert-if-absent to reconcile (gcs_to_postgres.py:153-181) — it can
  * never observe an UPDATE or DELETE between extracts. Snapshot diffing is
  * the general reconciliation: at 100 TB it is two scans + ONE shuffle on
  * the PK (sort-merge full outer), the per-row payload compare is free in
  * codegen, and only the change set — usually a sliver — flows downstream.
  */
object SnapshotDiff {

  /** The I/U/D change set between two same-schema snapshots. Output:
    * PK columns, every payload column twice (`<c>_old`, `<c>_new`), `op`. */
  def diff(oldSnap: DataFrame, newSnap: DataFrame,
           pkCols: Seq[String]): DataFrame = {
    require(pkCols.nonEmpty, "diff requires PK columns")
    require(oldSnap.columns.toSeq == newSnap.columns.toSeq,
      s"snapshots must share a schema: ${oldSnap.columns.toSeq} vs " +
        s"${newSnap.columns.toSeq}")
    val payload = oldSnap.columns.filterNot(pkCols.contains).toSeq
    val o = oldSnap.select(pkCols.map(col) ++
      payload.map(c => col(c).as(s"${c}_old")) :+ lit(1).as("_has_old"): _*)
    val n = newSnap.select(pkCols.map(col) ++
      payload.map(c => col(c).as(s"${c}_new")) :+ lit(1).as("_has_new"): _*)
    val changed = payload.map(c => !(col(s"${c}_old") <=> col(s"${c}_new")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, pkCols, "full_outer")
      .withColumn("op",
        when(col("_has_old").isNull, lit("I"))
          .when(col("_has_new").isNull, lit("D"))
          .when(changed, lit("U")))
      .filter(col("op").isNotNull)
      .drop("_has_old", "_has_new")
  }
}
