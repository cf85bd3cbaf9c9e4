package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Idempotent DDL for the `rpt` reporting schema — the Spark realization of
  * the reference's `ddl` task (dags/reporting_dag.py:47-49 executing
  * include/sql/rpt.sql: CREATE SCHEMA/TABLE IF NOT EXISTS). Constraints
  * (PK/UNIQUE) have no Spark-native form; they are realized as loader
  * semantics (Loader.dedupAppend) and asserted by tests (SURVEY.md §1.3).
  */
object Catalog {

  val database = "rpt"

  def tableName(entity: String): String = s"$database.$entity"

  /** Re-runnable, like rpt.sql:1,6,21,37. Parquet-backed managed tables. */
  def ensure(spark: SparkSession): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $database")
    Schemas.byEntity.keys.foreach { entity =>
      val ddlSchema = Schemas.tableSchema(entity).toDDL
      spark.sql(s"CREATE TABLE IF NOT EXISTS ${tableName(entity)} ($ddlSchema) USING parquet")
    }
  }

  /** Drop a managed table AND its warehouse location: the default catalog
    * is per-JVM, so a table written by a previous process is unknown to
    * DROP TABLE while its directory still exists on disk — a subsequent
    * CREATE/saveAsTable would refuse with LOCATION_ALREADY_EXISTS.
    *
    * The location is resolved from the catalog while the table is still
    * registered (qualified names live under `<warehouse>/<db>.db/<table>`,
    * NOT `<db>/<table>`, and a table may carry an explicit LOCATION); only
    * for a table this catalog has never seen — the stale-directory case
    * this helper exists for — does it fall back to the managed-layout
    * default path.
    *
    * An EXTERNAL table's data is never touched: DROP TABLE on an external
    * table intentionally preserves the location, and this helper keeps
    * that contract — it deletes only MANAGED locations (or the
    * managed-layout fallback paths, which are managed by construction). */
  def dropManaged(spark: SparkSession, table: String): Unit = {
    val catalog = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val db = ident.database.getOrElse(catalog.getCurrentDatabase)
    var deleteLocation = true
    val p: org.apache.hadoop.fs.Path =
      if (catalog.tableExists(ident)) {
        val meta = catalog.getTableMetadata(ident)
        deleteLocation = meta.tableType ==
          org.apache.spark.sql.catalyst.catalog.CatalogTableType.MANAGED
        new org.apache.hadoop.fs.Path(meta.location)
      } else if (catalog.databaseExists(db))
        // db registered but table unknown: the catalog still knows where a
        // managed table of this name WOULD live (db location may be custom)
        new org.apache.hadoop.fs.Path(
          catalog.defaultTablePath(ident.copy(database = Some(db))))
      else {
        // neither registered (fresh JVM, stale directory on disk): the
        // managed layout is <warehouse>/<db>.db/<table>, default db at root
        val rel = if (db == "default") ident.table else s"$db.db/${ident.table}"
        new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), rel)
      }
    spark.sql(s"DROP TABLE IF EXISTS $table")
    if (deleteLocation) {
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
  }

  /** Test/teardown helper — not part of the reference surface. Also removes
    * the physical warehouse location: a fresh session's in-memory catalog
    * does not know tables a previous JVM created, so a leftover
    * `<warehouse>/rpt.db` would make CREATE TABLE fail with
    * LOCATION_ALREADY_EXISTS. */
  def drop(spark: SparkSession): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS $database CASCADE")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(s"$wh/$database.db")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
  }
}
