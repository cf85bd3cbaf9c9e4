package graft.pipeline

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}

/** Live REST extraction (reference O6-O8, airflow_to_gcs.py:118-293),
  * redesigned for distribution: the reference pages serially in one worker
  * (`offset += batch_size` loop) and fans out detail calls 1+N serially;
  * here each page is one task — `spark.range(numPages)` → per-partition
  * HTTP fetch — so extraction parallelism scales with executors, and the
  * watermark is a typed query parameter, not a templated string.
  *
  * Page protocol (Airflow-REST-shaped): GET
  * `{base}/{entity}?limit=N&offset=M[&{wmParam}={wm}]` returning
  * `{"items": [...], "total_entries": T}`. The driver makes ONE probe call
  * for `total_entries` (a scalar, like the watermark); everything else runs
  * on executors. Responses stage through the entity's explicit schema —
  * never inference.
  */
object RestExtract {

  final case class Api(baseUrl: String, batchSize: Int = 1000,
                       watermarkParam: String = "start_date_gte")

  // one client per JVM (driver or executor) — each HttpClient owns selector
  // threads and a connection pool; per-request construction churns both
  @transient private lazy val client: HttpClient = HttpClient.newHttpClient()

  private def get(url: String): String = {
    val req = HttpRequest.newBuilder(URI.create(url)).GET().build()
    val res = client.send(req, HttpResponse.BodyHandlers.ofString())
    require(res.statusCode() == 200, s"GET $url -> ${res.statusCode()}")
    res.body()
  }

  private def pageUrl(api: Api, entity: String, offset: Long,
                      wm: Option[String]): String = {
    // URL-encode the watermark: Instant.toString is URL-safe, but an
    // offset-bearing form ('+02:00') would otherwise decode as a space
    val wmQ = wm.map(w => s"&${api.watermarkParam}=" +
      java.net.URLEncoder.encode(w, "UTF-8")).getOrElse("")
    s"${api.baseUrl}/$entity?limit=${api.batchSize}&offset=$offset$wmQ"
  }

  /** One page's raw body — shared with the DSv2 connector (sources.RestDataSource). */
  def getPage(api: Api, entity: String, offset: Long, wm: Option[String]): String =
    get(pageUrl(api, entity, offset, wm))

  /** Driver-side probe: total row count for the (watermarked) extraction. */
  def totalEntries(api: Api, entity: String, wm: Option[String]): Long = {
    val body = get(pageUrl(api, entity, 0, wm))
    new ObjectMapper().readTree(body).get("total_entries").asLong()
  }

  /** Distributed paged fetch → DataFrame with the entity's schema. */
  def fetch(spark: SparkSession, api: Api, entity: String,
            wm: Option[String] = None): DataFrame = {
    val total = totalEntries(api, entity, wm)
    val numPages = math.max(1L, (total + api.batchSize - 1) / api.batchSize)
    val batch = api.batchSize
    val (baseUrl, wmParam) = (api.baseUrl, api.watermarkParam)
    val pages: Dataset[java.lang.Long] = spark.range(numPages)
      .as(Encoders.LONG)
    val rows: Dataset[String] = pages.mapPartitions { it =>
      val mapper = new ObjectMapper()
      it.flatMap { page =>
        val url = pageUrl(Api(baseUrl, batch, wmParam), entity, page * batch, wm)
        val items = mapper.readTree(get(url)).get("items")
        (0 until items.size()).iterator.map(i => items.get(i).toString)
      }
    }(Encoders.STRING)
    spark.read.schema(Schemas.byEntity(entity)).json(rows)
  }

  /** Full live path for one entity: extract → run-partitioned staging →
    * watermarked dedup load (O6→O16 end to end). */
  def extractStageLoad(spark: SparkSession, api: Api, entity: String,
                       stagingBase: String, runTs: String): Unit = {
    val table = Catalog.tableName(entity)
    val wmCol = Schemas.watermarkOf(entity)
    val wm = wmCol.flatMap(c => Watermark.maxWatermark(spark, table, c))
    val fetched = fetch(spark, api, entity, wm.map(_.toInstant.toString))
    val path = Staging.writeStaged(fetched, stagingBase, entity, runTs)
    val staged = Staging.readStaged(spark, entity, Seq(path), arrayForm = false)
    // the HTTP bound is inclusive (start_date_gte); re-apply the strict >
    // watermark like the batch path, or boundary rows would duplicate on
    // entities without a PK (task_instance)
    val filtered = wmCol match {
      case Some(c) => Watermark.applyWatermark(staged, c, wm)
      case None => staged
    }
    Loader.dedupAppend(spark, filtered, table, Schemas.pkOf(entity))
  }
}
