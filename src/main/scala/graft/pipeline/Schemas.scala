package graft.pipeline

import org.apache.spark.sql.types._

/** One source of truth per entity (SURVEY.md §1.2): the reference declares
  * each schema twice — DDL (include/sql/rpt.sql:6-63) and extraction field
  * lists (operators/airflow_to_gcs.py:141-152,183-203,242-251) — and
  * reconciles them at the Postgres COPY. Here a single StructType drives the
  * JSON staging read, the strict projection, and the table DDL.
  *
  * Type mapping per SURVEY.md §1.3: varchar/text → String, timestamptz →
  * Timestamp (session TZ pinned UTC), boolean → Boolean (kept typed end to
  * end, unlike the reference's str() cast at airflow_to_gcs.py:143),
  * double precision → Double, integer → Integer, bytea → Binary.
  */
object Schemas {

  /** rpt.dag — include/sql/rpt.sql:6-19; fields airflow_to_gcs.py:141-152. */
  val dag: StructType = StructType(Seq(
    StructField("dag_id", StringType, nullable = false),
    StructField("is_paused", BooleanType),
    StructField("is_subdag", BooleanType),
    StructField("is_active", BooleanType),
    StructField("fileloc", StringType),
    StructField("file_token", StringType),
    StructField("owners", StringType),
    StructField("description", StringType),
    StructField("root_dag_id", StringType),
    StructField("schedule_interval", StringType)))

  /** rpt.dag_run — rpt.sql:21-35; fields airflow_to_gcs.py:231-251. */
  val dagRun: StructType = StructType(Seq(
    StructField("dag_id", StringType, nullable = false),
    StructField("dag_run_id", StringType, nullable = false),
    StructField("end_date", TimestampType),
    StructField("execution_date", TimestampType, nullable = false),
    StructField("external_trigger", BooleanType),
    StructField("logical_date", TimestampType),
    StructField("start_date", TimestampType),
    StructField("state", StringType)))

  /** rpt.task_instance — rpt.sql:37-63; fields airflow_to_gcs.py:183-203.
    * executor_config arrives as an opaque string from the API and is stored
    * as bytea (rpt.sql:57) → staged String, cast Binary at load. */
  val taskInstance: StructType = StructType(Seq(
    StructField("dag_id", StringType, nullable = false),
    StructField("task_id", StringType, nullable = false),
    StructField("execution_date", TimestampType),
    StructField("start_date", TimestampType),
    StructField("end_date", TimestampType),
    StructField("duration", DoubleType),
    StructField("state", StringType),
    StructField("try_number", IntegerType),
    StructField("max_tries", IntegerType),
    StructField("hostname", StringType),
    StructField("unixname", StringType),
    StructField("pool", StringType),
    StructField("pool_slots", IntegerType),
    StructField("queue", StringType),
    StructField("priority_weight", IntegerType),
    StructField("operator", StringType),
    StructField("queued_when", TimestampType),
    StructField("pid", IntegerType),
    StructField("executor_config", StringType)))

  val byEntity: Map[String, StructType] = Map(
    "dag" -> dag, "dag_run" -> dagRun, "task_instance" -> taskInstance)

  /** Target-table schema: staging schema with sink-side type coercion — the
    * reference coerces at Postgres COPY (SURVEY.md §1.2); here only
    * executor_config differs (staged string → stored bytea, rpt.sql:57). */
  def tableSchema(entity: String): StructType = entity match {
    case "task_instance" => StructType(taskInstance.fields.map(f =>
      if (f.name == "executor_config") f.copy(dataType = BinaryType) else f))
    case e => byEntity(e)
  }

  /** Dedup keys: rpt.sql:18 (dag PK), rpt.sql:32 (dag_run composite PK);
    * task_instance has its PK commented out (rpt.sql:58-62) → plain append,
    * matching the reference DAG passing no pk (dags/reporting_dag.py:141-170). */
  val pkOf: Map[String, Seq[String]] = Map(
    "dag" -> Seq("dag_id"),
    "dag_run" -> Seq("dag_run_id", "dag_id"),
    "task_instance" -> Seq.empty)

  /** Watermark column per entity (dags/reporting_dag.py:35,43). */
  val watermarkOf: Map[String, Option[String]] = Map(
    "dag" -> None,
    "dag_run" -> Some("start_date"),
    "task_instance" -> Some("start_date"))
}
