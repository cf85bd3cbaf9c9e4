package graft.pipeline

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** JDBC terminal sink — the reference's real reporting target is a Postgres
  * database loaded via COPY (gcs_to_postgres.py:178-181); SURVEY.md §2A O15
  * maps that to `df.write.jdbc` with batched inserts. Mirrors Loader's
  * managed-table semantics against any JDBC database:
  *
  *  - [[dedupAppend]]: insert-if-absent (PK anti join against the target)
  *  - [[upsert]]: update-on-conflict (absent PKs batch-INSERT, present PKs
  *    batch-UPDATE)
  *
  * Scale posture: the existing-keys read prunes to the PK columns (Spark's
  * JDBC relation pushes column pruning into the remote SELECT) and can be
  * range-partitioned via the standard partitionColumn/numPartitions options
  * in `props`; writes go through executeBatch with `batchSize` rows per
  * round trip — for Postgres add `reWriteBatchedInserts=true` to collapse a
  * batch into multi-row INSERTs. Tests run against embedded Derby (the one
  * JDBC engine bundled with Spark's jars).
  */
object JdbcSink {

  /** Append PK-absent rows of `incoming` to JDBC `table`. Empty `pkCols` →
    * plain bulk append. */
  def dedupAppend(spark: SparkSession, incoming: DataFrame, url: String,
                  table: String, pkCols: Seq[String],
                  props: Properties = new Properties,
                  batchSize: Int = 10000,
                  preference: Seq[Column] = Nil): Unit = {
    val remote = spark.read.jdbc(url, table, props)
    val fresh =
      if (pkCols.isEmpty) incoming
      else Loader.pickPerKey(incoming, pkCols, preference)
        .join(remote.select(pkCols.map(col): _*), pkCols, "left_anti")
    writeAppend(coerceToRemote(fresh, remote), url, table, props, batchSize)
  }

  /** Update-on-conflict: rows whose PK exists in `table` UPDATE it in
    * batches; absent PKs are bulk-inserted. In-batch duplicates resolve by
    * `preference` order (first wins), like [[Loader.upsert]]. */
  def upsert(spark: SparkSession, incoming: DataFrame, url: String,
             table: String, pkCols: Seq[String],
             props: Properties = new Properties,
             batchSize: Int = 10000,
             preference: Seq[Column] = Nil): Unit = {
    require(pkCols.nonEmpty, "upsert requires PK columns")
    val remote = spark.read.jdbc(url, table, props)
    val inc = coerceToRemote(
      Loader.pickPerKey(incoming, pkCols, preference), remote)
    // Snapshot the existing-PK set BEFORE the insert phase: the JDBC
    // relation is lazy, so an un-materialized semi join would re-read the
    // table after the inserts commit and redundantly re-UPDATE every row
    // just inserted (double write volume; racy under concurrent writers).
    // localCheckpoint, not cache: cached blocks are best-effort — a lost
    // block would silently recompute from the live JDBC table mid-upsert,
    // which is exactly the re-read this snapshot exists to prevent. A
    // truncated-lineage checkpoint fails loudly instead; blocks are freed
    // by the ContextCleaner once the frame is unreachable.
    val existing = remote.select(pkCols.map(col): _*).localCheckpoint()
    writeAppend(inc.join(existing, pkCols, "left_anti"), url, table, props, batchSize)
    writeUpdates(inc.join(existing, pkCols, "left_semi"), url, table, pkCols,
      props, batchSize)
  }

  /** Apply a CDC change batch to a JDBC table — [[Loader.applyCdc]]'s
    * semantics against the remote sink: per PK the highest `seqCol` wins
    * (I→D nets absent, D→I reinserts), latest non-D rows upsert, latest-D
    * PKs issue batched DELETEs. Deletes of absent PKs are no-ops (the
    * at-least-once replay case), so re-applying a batch is idempotent.
    *
    * Atomicity contract — EVENTUAL, not batch-atomic: each partition
    * commits its own transaction (a distributed sink has no cross-
    * partition transaction without XA/2PC, which plain JDBC sinks don't
    * offer), and upserts commit before deletes start. A failure mid-apply
    * therefore leaves a visibility window in which some upserted rows are
    * live while their batch's deletes have not yet landed; readers see a
    * MIXED batch until the batch is replayed to completion (replay is safe
    * by the idempotence above — this is exactly Kafka-Connect-style
    * at-least-once CDC apply). If readers must not observe partial
    * batches, write a batch-complete marker row (batch id + max seq) to a
    * sidecar table AFTER applyCdc returns and have readers filter on it. */
  def applyCdc(spark: SparkSession, changes: DataFrame, url: String,
               table: String, pkCols: Seq[String],
               props: Properties = new Properties,
               batchSize: Int = 10000,
               opCol: String = "op", seqCol: String = "seq"): Unit = {
    require(pkCols.nonEmpty, "applyCdc requires PK columns")
    val latest = Loader.pickPerKey(changes, pkCols,
      Seq(col(seqCol).desc))
    upsert(spark, latest.filter(col(opCol) =!= "D").drop(opCol, seqCol),
      url, table, pkCols, props, batchSize)
    val sql = s"DELETE FROM $table WHERE " +
      pkCols.map(c => s"$c = ?").mkString(" AND ")
    executeKeyedDml(latest.filter(col(opCol) === "D")
      .select(pkCols.map(col): _*), url, sql, props, batchSize)
  }

  /** BATCH-ATOMIC CDC apply — the opt-in mode that closes [[applyCdc]]'s
    * documented visibility window. Two phases:
    *
    *  1. DISTRIBUTED stage: the batch's net effect is bulk-written with
    *     Spark's parallel JDBC writer to two stage tables — latest non-D
    *     rows (the remote's schema) to `<table>_cdc_up`, delete PKs to
    *     `<table>_cdc_del`. The stages are invisible to readers, so this
    *     phase needs no transaction and keeps the row shipping distributed.
    *  2. SINGLE-TRANSACTION swap on ONE connection: a correlated DELETE of
    *     every staged PK from the target, then INSERT .. SELECT of the
    *     staged upsert rows — two set-based statements the database
    *     executes under one commit, so a reader sees the batch entirely or
    *     not at all (any engine with transactional DML + READ COMMITTED,
    *     i.e. Postgres/Derby/anything the reference targets).
    *
    * The swap transaction's work is O(changes) done remotely (no row
    * ships twice); the price vs [[applyCdc]] is the single writer in phase
    * 2 and the stage-table round trip — pay it when readers must never
    * observe a partial batch. Re-running after a phase-2 failure is safe:
    * the transaction rolled back, the stage rewrite is an overwrite, and
    * the swap is idempotent per staged batch.
    *
    * `failpoint` is a test seam injected between the DELETE and the
    * INSERT of phase 2 (JdbcSinkSpec proves a mid-swap crash rolls back to
    * the pre-batch table); `preSwapFailpoint` fires after the stage tables
    * are loaded but before the swap transaction opens (JdbcSinkSpec proves
    * a crash there leaves the target byte-identical — staging is invisible
    * by construction — and the rerun completes the batch). */
  def applyCdcAtomic(spark: SparkSession, changes: DataFrame, url: String,
                     table: String, pkCols: Seq[String],
                     props: Properties = new Properties,
                     batchSize: Int = 10000,
                     opCol: String = "op", seqCol: String = "seq",
                     failpoint: () => Unit = () => (),
                     preSwapFailpoint: () => Unit = () => ()): Unit = {
    require(pkCols.nonEmpty, "applyCdcAtomic requires PK columns")
    val remote = spark.read.jdbc(url, table, props)
    val latest = Loader.pickPerKey(changes, pkCols, Seq(col(seqCol).desc))
    val pkLower = pkCols.map(_.toLowerCase).toSet
    // two stage tables, both with column names taken from the TARGET's own
    // metadata (so the swap SQL resolves identically under any engine's
    // identifier folding): upserts carry the full payload, the delete stage
    // only PK columns
    val upserts = coerceToRemote(
      latest.filter(col(opCol) =!= "D").drop(opCol, seqCol), remote)
    val deleteKeys = latest.filter(col(opCol) === "D")
      .select(remote.schema.collect {
        case f if pkLower.contains(f.name.toLowerCase) =>
          col(f.name).cast(f.dataType).as(f.name)
      }: _*)
    val stageUp = s"${table}_cdc_up"
    val stageDel = s"${table}_cdc_del"
    upserts.write.mode("overwrite")
      .option("batchsize", batchSize.toLong).jdbc(url, stageUp, props)
    deleteKeys.write.mode("overwrite")
      .option("batchsize", batchSize.toLong).jdbc(url, stageDel, props)
    preSwapFailpoint()
    // Spark's JDBC writer maps StringType to the dialect's TEXT/CLOB, which
    // some engines (Derby) cannot IMPLICITLY compare with, or insert into,
    // the target's VARCHARs — so the swap SQL explicitly CASTs the stage's
    // string columns to the target's own VARCHAR(n), read from a zero-row
    // metadata probe (a no-op cast on engines like Postgres where text and
    // varchar compare natively)
    val varcharPrec: Map[String, Int] = {
      val mc = DriverManager.getConnection(url, props)
      try {
        val md = mc.prepareStatement(s"SELECT * FROM $table WHERE 1=0")
          .executeQuery().getMetaData
        (1 to md.getColumnCount).collect {
          case i if md.getColumnType(i) == java.sql.Types.VARCHAR ||
                    md.getColumnType(i) == java.sql.Types.CHAR =>
            md.getColumnLabel(i).toLowerCase -> math.max(1, md.getPrecision(i))
        }.toMap
      } finally mc.close()
    }
    def sref(c: String): String = varcharPrec.get(c.toLowerCase)
      .map(p => s"CAST(s.$c AS VARCHAR($p))").getOrElse(s"s.$c")
    val cols = remote.schema.map(_.name)
    val pkMatch = pkCols.map(c => s"${sref(c)} = t.$c").mkString(" AND ")
    val conn = DriverManager.getConnection(url, props)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      st.executeUpdate(s"DELETE FROM $table t WHERE EXISTS (" +
        s"SELECT 1 FROM $stageUp s WHERE $pkMatch)")
      st.executeUpdate(s"DELETE FROM $table t WHERE EXISTS (" +
        s"SELECT 1 FROM $stageDel s WHERE $pkMatch)")
      failpoint()
      st.executeUpdate(s"INSERT INTO $table (${cols.mkString(", ")}) " +
        s"SELECT ${cols.map(sref).mkString(", ")} FROM $stageUp s")
      conn.commit()
    } catch {
      case e: Throwable =>
        try conn.rollback() catch { case _: Throwable => () }
        throw e
    } finally conn.close()
    // best-effort stage cleanup, outside the swap transaction
    Seq(stageUp, stageDel).foreach { stg =>
      val c2 = DriverManager.getConnection(url, props)
      try c2.createStatement().executeUpdate(s"DROP TABLE $stg")
      catch { case _: Throwable => () } finally c2.close()
    }
  }

  /** Distributed batched keyed DML (DELETE and friends): each partition
    * opens one connection and flushes `batchSize` statements per round
    * trip — the same per-partition imperative JDBC shape as
    * [[writeUpdates]]. */
  private def executeKeyedDml(keys: DataFrame, url: String, sql: String,
                              props: Properties, batchSize: Int): Unit = {
    val sqlTypes = keys.schema.fields.map(f => jdbcType(f.dataType))
    val propsMap = {
      import scala.jdk.CollectionConverters._
      props.asScala.toMap
    }
    keys.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val p = new Properties()
        propsMap.foreach { case (k, v) => p.setProperty(k, v) }
        val conn = DriverManager.getConnection(url, p)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sql)
          var n = 0
          rows.foreach { r =>
            var i = 0
            while (i < sqlTypes.length) {
              val v = r.get(i)
              if (v == null) ps.setNull(i + 1, sqlTypes(i))
              else ps.setObject(i + 1, v, sqlTypes(i))
              i += 1
            }
            ps.addBatch()
            n += 1
            if (n % batchSize == 0) ps.executeBatch()
          }
          ps.executeBatch()
          conn.commit()
        } finally conn.close()
      }
    }
  }

  /** The remote table's Spark schema WITH its real DDL nullability.
    * `spark.read.jdbc` deliberately reports every column nullable
    * (JDBCRDD resolves with alwaysNullable — sound for reads, useless for
    * constraint validation), so NOT NULL is recovered from the JDBC
    * driver's ResultSetMetaData on a zero-row probe. Feed the result to
    * [[Loader.conformToSchema]] to reject a batch missing a required
    * column BEFORE any row ships to the remote, instead of failing
    * mid-write on the database's constraint error. */
  def constrainedSchema(spark: SparkSession, url: String, table: String,
                        props: Properties = new Properties): StructType = {
    val base = spark.read.jdbc(url, table, props).schema
    val conn = DriverManager.getConnection(url, props)
    try {
      val md = conn.prepareStatement(s"SELECT * FROM $table WHERE 1=0")
        .executeQuery().getMetaData
      val noNulls = (1 to md.getColumnCount).collect {
        case i if md.isNullable(i) == java.sql.ResultSetMetaData.columnNoNulls =>
          md.getColumnLabel(i).toLowerCase
      }.toSet
      StructType(base.map(f =>
        if (noNulls.contains(f.name.toLowerCase)) f.copy(nullable = false)
        else f))
    } finally conn.close()
  }

  /** Project/cast to the remote table's schema (sink-side coercion, like
    * Loader.coerceToTable) — also drops loader-only columns such as the
    * staging-file preference. */
  private def coerceToRemote(df: DataFrame, remote: DataFrame): DataFrame =
    df.select(remote.schema.map(f => col(f.name).cast(f.dataType)): _*)

  private def writeAppend(df: DataFrame, url: String, table: String,
                          props: Properties, batchSize: Int): Unit =
    df.write.mode("append")
      .option("batchsize", batchSize.toLong)
      .jdbc(url, table, props)

  /** Distributed batched UPDATE: each partition opens one connection and
    * flushes `batchSize` statements per round trip — per-partition
    * imperative JDBC is the one place mapPartitions-style code is the right
    * tool (no Catalyst expression executes remote DML). */
  private def writeUpdates(df: DataFrame, url: String, table: String,
                           pkCols: Seq[String], props: Properties,
                           batchSize: Int): Unit = {
    // column names come from remote JDBC metadata (Derby/Oracle report
    // uppercase), so the PK exclusion must be case-insensitive — otherwise
    // the UPDATE would redundantly SET the PKs (or fail on engines that
    // forbid PK updates)
    val pkLower = pkCols.map(_.toLowerCase)
    val setCols = df.columns.filterNot(c => pkLower.contains(c.toLowerCase)).toSeq
    if (setCols.isEmpty) return
    val sql = s"UPDATE $table SET ${setCols.map(c => s"$c = ?").mkString(", ")} " +
      s"WHERE ${pkCols.map(c => s"$c = ?").mkString(" AND ")}"
    val ordered = df.select((setCols ++ pkCols).map(col): _*)
    val sqlTypes = ordered.schema.fields.map(f => jdbcType(f.dataType))
    val propsMap = {
      import scala.jdk.CollectionConverters._
      props.asScala.toMap
    }
    ordered.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val p = new Properties()
        propsMap.foreach { case (k, v) => p.setProperty(k, v) }
        val conn = DriverManager.getConnection(url, p)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sql)
          var n = 0
          rows.foreach { r =>
            var i = 0
            while (i < sqlTypes.length) {
              val v = r.get(i)
              if (v == null) ps.setNull(i + 1, sqlTypes(i))
              else ps.setObject(i + 1, v, sqlTypes(i))
              i += 1
            }
            ps.addBatch()
            n += 1
            if (n % batchSize == 0) ps.executeBatch()
          }
          ps.executeBatch()
          conn.commit()
        } finally conn.close()
      }
    }
  }

  private def jdbcType(dt: DataType): Int = dt match {
    case StringType => java.sql.Types.VARCHAR
    case BooleanType => java.sql.Types.BOOLEAN
    case IntegerType => java.sql.Types.INTEGER
    case LongType => java.sql.Types.BIGINT
    case DoubleType => java.sql.Types.DOUBLE
    case FloatType => java.sql.Types.REAL
    case TimestampType => java.sql.Types.TIMESTAMP
    case DateType => java.sql.Types.DATE
    case BinaryType => java.sql.Types.BINARY
    case d: DecimalType => java.sql.Types.DECIMAL
    case other =>
      throw new IllegalArgumentException(s"unsupported JDBC update type $other")
  }
}
