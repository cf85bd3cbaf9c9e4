package graft.sources

import java.time.OffsetDateTime
import java.util

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.pipeline.{RestExtract, Schemas}

/** DataSource V2 connector for the Airflow-REST-shaped page protocol — the
  * idiomatic form of the live extract (SURVEY.md §2B "REST source as DSv2
  * TableProvider"):
  *
  * {{{
  * spark.read.format("graft.sources.RestDataSource")
  *   .option("baseUrl", "...").option("entity", "dag_run")
  *   .option("batchSize", "1000")
  *   .load()
  *   .filter($"start_date" > lit(wm))   // pushed into the HTTP query
  * }}}
  *
  * The watermark predicate (`start_date > ts`) is pushed down into the
  * source as `start_date_gte` — the engine-level analog of the reference's
  * incremental extraction (airflow_to_gcs.py:162-172), now visible to
  * Catalyst as a real pushed filter. Each page is one InputPartition, so
  * extraction parallelism = numPages, planned from one driver-side probe.
  */
class RestDataSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val entity = options.get("entity")
    require(entity != null && Schemas.byEntity.contains(entity),
      s"option 'entity' must be one of ${Schemas.byEntity.keys.mkString(", ")} (got: $entity)")
    require(options.get("baseUrl") != null, "option 'baseUrl' is required")
    Schemas.byEntity(entity)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new RestTable(schema, opts.get("baseUrl"), opts.get("entity"),
      Option(opts.get("batchSize")).map(_.toInt).getOrElse(1000),
      RestDataSource.authFrom(opts),
      Option(opts.get("postList")).exists(_.toBoolean))
  }
}

private[sources] object RestDataSource {
  /** Credential options → RestExtract.Auth: `user`+`password` (basic, the
    * reference's airflow_user/airflow_pass) or `token` (bearer). Both set
    * is ambiguous → error rather than a silent precedence pick. */
  def authFrom(opts: CaseInsensitiveStringMap): Option[RestExtract.Auth] = {
    val basic = Option(opts.get("user")).map { u =>
      RestExtract.BasicAuth(u, Option(opts.get("password")).getOrElse(""))
    }
    val bearer = Option(opts.get("token")).map(RestExtract.BearerAuth)
    require(basic.isEmpty || bearer.isEmpty,
      "options 'user' and 'token' are mutually exclusive")
    basic.orElse(bearer)
  }
}

private[sources] class RestTable(schema: StructType, baseUrl: String,
                                 entity: String, batchSize: Int,
                                 auth: Option[RestExtract.Auth],
                                 postList: Boolean = false)
    extends Table with SupportsRead {
  override def name(): String = s"rest($entity)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RestScanBuilder(schema, baseUrl, entity, batchSize, auth, postList)
}

private[sources] class RestScanBuilder(schema: StructType, baseUrl: String,
                                       entity: String, batchSize: Int,
                                       auth: Option[RestExtract.Auth],
                                       postList: Boolean = false)
    extends ScanBuilder with SupportsPushDownFilters {

  private var watermark: Option[String] = None
  private var pushed: Array[Filter] = Array.empty

  /** Use `start_date > ts` to narrow the source query — but the HTTP param
    * is an inclusive `start_date_gte` bound, so the filter is only a
    * PARTIAL pushdown: it is returned as residual too and Spark re-applies
    * the strict `>` post-scan (boundary rows the server may return are
    * filtered exactly). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.collect {
      // value type depends on spark.sql.datetime.java8API.enabled
      case f @ GreaterThan("start_date", ts: java.sql.Timestamp) =>
        watermark = Some(ts.toInstant.toString); f
      case f @ GreaterThan("start_date", i: java.time.Instant) =>
        watermark = Some(i.toString); f
    }
    filters // all filters stay residual — pushdown only narrows
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new RestScan(schema,
      RestExtract.Api(baseUrl, batchSize, auth = auth, postList = postList),
      entity, watermark)
}

private[sources] class RestScan(schema: StructType, api: RestExtract.Api,
                                entity: String, wm: Option[String])
    extends Scan with Batch {

  override def readSchema(): StructType = schema
  override def description(): String =
    s"RestScan($entity, watermark=${wm.getOrElse("none")})"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val total = RestExtract.totalEntries(api, entity, wm)
    val pages = math.max(1L, (total + api.batchSize - 1) / api.batchSize)
    (0L until pages).map(p => RestPage(p * api.batchSize): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory(schema, api, entity, wm)
}

private[sources] case class RestPage(offset: Long) extends InputPartition

private[sources] class RestReaderFactory(schema: StructType,
                                         api: RestExtract.Api, entity: String,
                                         wm: Option[String])
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val offset = partition.asInstanceOf[RestPage].offset
    new PartitionReader[InternalRow] {
      private val items: JsonNode = {
        val body = RestExtract.getPage(api, entity, offset, wm)
        // GET pages key items by "items"; the Airflow batch-list POST
        // protocol keys them by entity ("dag_runs"/"task_instances") —
        // getPage + itemsKey dispatch on the Api, so this reader serves
        // both protocols unchanged
        new ObjectMapper().readTree(body).get(RestExtract.itemsKey(api, entity))
      }
      private var i = -1
      override def next(): Boolean = { i += 1; items != null && i < items.size() }
      override def get(): InternalRow = jsonToRow(items.get(i), schema)
      override def close(): Unit = ()
    }
  }

  private def jsonToRow(node: JsonNode, schema: StructType): InternalRow =
    InternalRow.fromSeq(schema.fields.toSeq.map { f =>
      val v = node.get(f.name)
      if (v == null || v.isNull) null
      else f.dataType match {
        case StringType => UTF8String.fromString(v.asText())
        case BooleanType => java.lang.Boolean.valueOf(v.asBoolean())
        case DoubleType => java.lang.Double.valueOf(v.asDouble())
        case IntegerType => java.lang.Integer.valueOf(v.asInt())
        case TimestampType =>
          val ins = parseInstant(v.asText())
          java.lang.Long.valueOf(ins.getEpochSecond * 1000000L + ins.getNano / 1000L)
        case other => throw new IllegalArgumentException(
          s"unsupported REST column type ${other.simpleString} for ${f.name}")
      }
    })

  private def parseInstant(s: String): java.time.Instant =
    try OffsetDateTime.parse(s).toInstant
    catch { case _: Exception => java.time.Instant.parse(s) }
}
