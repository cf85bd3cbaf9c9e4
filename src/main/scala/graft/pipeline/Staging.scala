package graft.pipeline

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, input_file_name}

/** Run-partitioned object-store staging (reference O6-O8 sinks, O10-O12
  * scans, O16 paths — SURVEY.md §2A).
  *
  * Staged files are whole-file JSON arrays (one array per page,
  * airflow_to_gcs.py:153-159,253-259), hence `multiLine=true` — a JSON-lines
  * read would silently return zero rows. Reads apply the entity's explicit
  * schema (never inference in production paths) and project exactly the
  * declared fields in order, which is strict like the reference's
  * `row[field]` KeyError (gcs_to_postgres.py:169-172): a missing column is
  * an analysis error.
  */
object Staging {

  /** `ts_nodash`-style run timestamp (dags/reporting_dag.py:57). */
  private val runTsFmt =
    DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss").withZone(ZoneOffset.UTC)

  def formatRunTs(ts: Instant): String = runTsFmt.format(ts)

  /** `airflow/<entity>/<ts_nodash>/` path convention (reporting_dag.py:57,91,133). */
  def stagingPath(base: String, entity: String, runTs: String): String =
    s"$base/airflow/$entity/$runTs"

  /** Column carrying the staged file URI (extract sequence): the reference
    * COPYs page files in order, so first-file-wins resolves intra-batch PK
    * duplicates — `Loader.dedupAppend(preference = col(srcFileCol))`. */
  val srcFileCol = "_src_file"

  /** Read staged JSON-array files with the entity schema + strict projection.
    * One whole-file array = one input partition; large pages should be
    * repartitioned downstream (SURVEY.md §7 risk note). With
    * `keepSourceFile`, appends [[srcFileCol]] (the loader's dedup
    * preference; dropped by sink-side coercion before insert). */
  def readStaged(spark: SparkSession, entity: String, paths: Seq[String],
                 arrayForm: Boolean = true,
                 keepSourceFile: Boolean = false): DataFrame = {
    val schema = Schemas.byEntity(entity)
    val df = spark.read
      .schema(schema)
      .option("multiLine", arrayForm)
      .json(paths: _*)
    val projected = df.select(schema.fieldNames.map(col): _*)
    if (keepSourceFile) projected.withColumn(srcFileCol, input_file_name())
    else projected
  }

  /** Tolerant staging read — realizes the reference's `max_bad_records`
    * parameter, which it declares but never reads (gcs_to_postgres.py:103,
    * a BigQuery-copied dead param; SURVEY.md §2A config surface): up to
    * `maxBadRecords` malformed records are dropped, one more fails the
    * load. PERMISSIVE parse routes malformed input to a corrupt-record
    * column; in array form a malformed FILE is one bad record (the COPY
    * unit), in JSON-lines form each bad line counts separately.
    *
    * The validation count runs over a scoped cache (Spark correctly
    * refuses fresh-scan plans that read ONLY the corrupt column), which is
    * unpersisted before returning; the returned frame is a clean re-read,
    * so `input_file_name()` still resolves (over a cached scan it blanks)
    * and nothing stays pinned in executor storage. The page parses twice —
    * a staging batch is page-sized, so validation-by-reparse is cheap. */
  def readStagedTolerant(spark: SparkSession, entity: String, paths: Seq[String],
                         maxBadRecords: Long, arrayForm: Boolean = true,
                         keepSourceFile: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val schema = Schemas.byEntity(entity)
    val corrupt = "_corrupt_record"
    def parsed = spark.read
      .schema(StructType(schema.fields :+ StructField(corrupt, StringType)))
      .option("multiLine", arrayForm)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .json(paths: _*)
    val validation = parsed.cache()
    val bad =
      try validation.filter(col(corrupt).isNotNull).count()
      finally validation.unpersist()
    if (bad > maxBadRecords)
      throw new IllegalStateException(
        s"staging read of $entity: $bad malformed records exceed " +
          s"max_bad_records=$maxBadRecords (paths: ${paths.mkString(", ")})")
    // the returned frame re-reads in DROPMALFORMED mode (the same records
    // survive as corrupt-IS-NULL, but no plan ever references the corrupt
    // column — a downstream count() would otherwise prune to corrupt-only
    // and hit Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction)
    val clean = spark.read.schema(schema)
      .option("multiLine", arrayForm)
      .option("mode", "DROPMALFORMED")
      .json(paths: _*)
    if (keepSourceFile) clean.withColumn(srcFileCol, input_file_name())
    else clean.select(schema.fieldNames.map(col): _*)
  }

  /** Stage a page set. Spark's JSON writer emits JSON-lines (not whole-file
    * arrays), so re-reads of our own staging pass arrayForm=false; the
    * reference-shaped fixture files use the array form (default). */
  def writeStaged(df: DataFrame, base: String, entity: String, runTs: String): String = {
    val path = stagingPath(base, entity, runTs)
    df.write.mode("overwrite").json(path)
    path
  }

  /** CSV dialect knobs — the reference's declared loader config surface
    * (`field_delimiter`, `quote_character`, `encoding`,
    * `allow_quoted_newlines`, `allow_jagged_rows`,
    * gcs_to_postgres.py:102-107; all dead params there, real here). */
  final case class CsvDialect(delimiter: String = ",", quote: String = "\"",
                              encoding: String = "UTF-8",
                              allowQuotedNewlines: Boolean = false,
                              allowJaggedRows: Boolean = false)

  /** CSV interop with the reference's NULL contract: empty field = NULL
    * (`COPY ... NULL AS ''`, gcs_to_postgres.py:178-180 — the O14 transient
    * format). Only needed when exchanging staged data with COPY-style
    * loaders; the engine's own staging stays typed. */
  def writeStagedCsv(df: DataFrame, base: String, entity: String, runTs: String,
                     dialect: CsvDialect = CsvDialect()): String = {
    val path = stagingPath(base, entity, runTs) + "-csv"
    df.write.mode("overwrite")
      .option("header", "true").option("nullValue", "")
      .option("delimiter", dialect.delimiter).option("quote", dialect.quote)
      .option("encoding", dialect.encoding)
      .csv(path)
    path
  }

  def readStagedCsv(spark: SparkSession, entity: String, path: String,
                    dialect: CsvDialect = CsvDialect()): DataFrame = {
    val schema = Schemas.byEntity(entity)
    spark.read.schema(schema)
      .option("header", "true").option("nullValue", "")
      .option("delimiter", dialect.delimiter).option("quote", dialect.quote)
      .option("encoding", dialect.encoding)
      // whole-file parsing for quoted newlines AND for non-UTF-8 charsets:
      // per-line mode splits records on raw 0x0A bytes before decoding, so
      // multi-byte encodings (UTF-16/32) would shred records mid-codepoint
      .option("multiLine",
        dialect.allowQuotedNewlines || !dialect.encoding.equalsIgnoreCase("UTF-8"))
      // jagged row = fewer fields than the schema; PERMISSIVE null-fills
      // (the reference's allow_jagged_rows intent), FAILFAST rejects
      .option("mode", if (dialect.allowJaggedRows) "PERMISSIVE" else "FAILFAST")
      .csv(path)
      .select(schema.fieldNames.map(col): _*)
  }
}
