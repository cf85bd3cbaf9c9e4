package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.pipeline.{Catalog, Fixtures, ReportingPipeline}

/** The reference pipeline itself as a declared operator: DDL → staged-JSON
  * extract → watermark → anti-join dedup load, over the bundled
  * reference-shaped fixtures, returning the loaded dag_run table. Driver
  * does a rows-only check (the load is stateful and its input is not one of
  * the testdata parquet tables, so no DuckDB oracle); invariants are
  * asserted in PipelineSpec.
  */
object PipelineOps {

  private def fixtureDir: String = Fixtures.dir

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p_reporting_e2e" -> ((s, _) => {
      // fresh state per invocation → deterministic row count
      Catalog.drop(s)
      ReportingPipeline.run(s, fixtureDir)
      ReportingPipeline.run(s, fixtureDir) // idempotence: second run is a no-op
      s.table(Catalog.tableName("dag_run"))
        .select("dag_id", "dag_run_id", "execution_date", "state")
        .orderBy(col("dag_id"), col("dag_run_id"))
    })
  )

  val oracles: Map[String, String] = Map.empty
}
