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

  /** Request credential, applied as an `Authorization` header on EVERY
    * request — the driver probe and every executor page/detail fetch alike
    * (the reference authenticates each `requests.get` with
    * `auth=(user, pass)`, airflow_to_gcs.py:77-80,130-140). Serializable so
    * the closure ships it to executors; the header value is precomputed
    * once per instance. */
  sealed trait Auth extends Serializable { def header: String }
  /** HTTP basic — the reference's `airflow_user`/`airflow_pass` pair. */
  final case class BasicAuth(user: String, pass: String) extends Auth {
    override val header: String = "Basic " + java.util.Base64.getEncoder
      .encodeToString(s"$user:$pass".getBytes("UTF-8"))
  }
  /** Bearer token — the modern Airflow (2.7+) / generic-REST form. */
  final case class BearerAuth(token: String) extends Auth {
    override val header: String = s"Bearer $token"
  }

  /** `maxAttempts`/`retryBaseMs`: transient-failure policy for EVERY
    * request (driver probe and executor fetches). 429 and 5xx responses
    * and connection-level IOExceptions retry with deterministic
    * exponential backoff (base, 2x, 4x, ... — no jitter, so tests are
    * exact); other 4xx fail immediately — an auth or contract error does
    * not heal by retrying. A live Airflow behind a proxy throws 502/503
    * during deploys and 429 under burst pagination; without this policy
    * one blip fails a whole extraction task. */
  /** `postList = true` selects the Airflow *batch-list* protocol
    * (airflow_to_gcs.py:174,225,268): POST to `dags/~/dagRuns/list` /
    * `dags/~/dagRuns/~/taskInstances/list` with a JSON body
    * `{"page_limit": N, "page_offset": M[, "start_date_gte": wm]}` — these
    * cross-dag endpoints have no GET equivalent, so a live run against a
    * real Airflow requires this mode. The default (GET + query params)
    * remains for per-entity list endpoints; the DSv2 connector speaks
    * both (option `postList=true`). */
  final case class Api(baseUrl: String, batchSize: Int = 1000,
                       watermarkParam: String = "start_date_gte",
                       auth: Option[Auth] = None,
                       maxAttempts: Int = 4, retryBaseMs: Long = 250L,
                       postList: Boolean = false)

  // one client per JVM (driver or executor) — each HttpClient owns selector
  // threads and a connection pool; per-request construction churns both
  @transient private lazy val client: HttpClient = HttpClient.newHttpClient()

  private def get(url: String, auth: Option[Auth], maxAttempts: Int = 1,
                  retryBaseMs: Long = 0L): String = {
    var attempt = 1
    var lastErr = ""
    while (attempt <= maxAttempts) {
      try {
        val b = HttpRequest.newBuilder(URI.create(url)).GET()
        auth.foreach(a => b.header("Authorization", a.header))
        val res = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
        val sc = res.statusCode()
        if (sc == 200) return res.body()
        // non-retryable client errors fail fast (429 is the rate-limit
        // exception — it IS the retry case)
        require(sc == 429 || sc >= 500, s"GET $url -> $sc")
        lastErr = s"GET $url -> $sc"
      } catch {
        case e: java.io.IOException => lastErr = s"GET $url failed: ${e.getMessage}"
      }
      if (attempt < maxAttempts)
        Thread.sleep(retryBaseMs << (attempt - 1))
      attempt += 1
    }
    throw new java.io.IOException(
      s"$lastErr (after $maxAttempts attempts)")
  }

  /** POST with a JSON body; same status/retry policy as [[get]]. Shares the
    * per-JVM client. The reference authenticates and sets
    * `Content-Type: application/json` on each batch-list POST
    * (airflow_to_gcs.py:75-80,174). */
  private def post(url: String, body: String, auth: Option[Auth],
                   maxAttempts: Int = 1, retryBaseMs: Long = 0L): String = {
    var attempt = 1
    var lastErr = ""
    while (attempt <= maxAttempts) {
      try {
        val b = HttpRequest.newBuilder(URI.create(url))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(body, java.nio.charset.StandardCharsets.UTF_8))
        auth.foreach(a => b.header("Authorization", a.header))
        val res = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
        val sc = res.statusCode()
        if (sc == 200) return res.body()
        require(sc == 429 || sc >= 500, s"POST $url -> $sc")
        lastErr = s"POST $url -> $sc"
      } catch {
        case e: java.io.IOException => lastErr = s"POST $url failed: ${e.getMessage}"
      }
      if (attempt < maxAttempts)
        Thread.sleep(retryBaseMs << (attempt - 1))
      attempt += 1
    }
    throw new java.io.IOException(s"$lastErr (after $maxAttempts attempts)")
  }

  /** Batch-list endpoints: entity → (URL path, response items key).
    * The Airflow cross-dag batch lists key their items by entity —
    * `"dag_runs"` / `"task_instances"` — not `"items"`
    * (airflow_to_gcs.py:182,242). */
  private val batchList: Map[String, (String, String)] = Map(
    "dag_run" -> ("dags/~/dagRuns/list", "dag_runs"),
    "task_instance" -> ("dags/~/dagRuns/~/taskInstances/list", "task_instances"))

  /** The batch-list page body. INTENDED semantics, not the reference's
    * literal loop: the reference drops `start_date_gte` from every page
    * after the first (airflow_to_gcs.py:268-270 rebuilds `data` without it)
    * and never paginates taskInstances at all (:173-211 fetches one page) —
    * both documented reference bugs (SURVEY.md §4). Here every page carries
    * the same watermark, so a row landing between page fetches can't shift
    * the offset window mid-extraction. */
  private def postBody(api: Api, offset: Long, wm: Option[String]): String = {
    val wmField = wm.map(w =>
      s""","${api.watermarkParam}":${new ObjectMapper().writeValueAsString(w)}""").getOrElse("")
    s"""{"page_limit":${api.batchSize},"page_offset":$offset$wmField}"""
  }

  private def pageUrl(api: Api, entity: String, offset: Long,
                      wm: Option[String]): String = {
    // URL-encode the watermark: Instant.toString is URL-safe, but an
    // offset-bearing form ('+02:00') would otherwise decode as a space
    val wmQ = wm.map(w => s"&${api.watermarkParam}=" +
      java.net.URLEncoder.encode(w, "UTF-8")).getOrElse("")
    s"${api.baseUrl}/$entity?limit=${api.batchSize}&offset=$offset$wmQ"
  }

  /** One page's raw body — shared with the DSv2 connector (sources.RestDataSource).
    * Dispatches on the Api's protocol; the response's items key differs
    * between the two (`items` vs entity-keyed), so callers should use
    * [[itemsKey]] rather than hard-coding it. */
  def getPage(api: Api, entity: String, offset: Long, wm: Option[String]): String =
    if (api.postList)
      post(s"${api.baseUrl}/${batchList(entity)._1}", postBody(api, offset, wm),
        api.auth, api.maxAttempts, api.retryBaseMs)
    else
      get(pageUrl(api, entity, offset, wm), api.auth, api.maxAttempts, api.retryBaseMs)

  /** Response array key for a page fetched via [[getPage]]. */
  def itemsKey(api: Api, entity: String): String =
    if (api.postList) batchList(entity)._2 else "items"

  /** Driver-side probe: total row count for the (watermarked) extraction. */
  def totalEntries(api: Api, entity: String, wm: Option[String]): Long = {
    val body = getPage(api, entity, 0, wm)
    new ObjectMapper().readTree(body).get("total_entries").asLong()
  }

  /** Distributed paged fetch → DataFrame with the entity's schema. Works
    * for both protocols: one page = one task either way, so batch-list
    * POST extraction fans out exactly like GET extraction. */
  def fetch(spark: SparkSession, api: Api, entity: String,
            wm: Option[String] = None): DataFrame = {
    val total = totalEntries(api, entity, wm)
    val numPages = math.max(1L, (total + api.batchSize - 1) / api.batchSize)
    val apiB = api // case class: serializable, closure-captured whole
    val key = itemsKey(api, entity)
    val rows: Dataset[String] = spark.range(numPages).as(Encoders.LONG)
      .mapPartitions { it =>
        val mapper = new ObjectMapper()
        it.flatMap { page =>
          val body = getPage(apiB, entity, page * apiB.batchSize, wm)
          val items = mapper.readTree(body).get(key)
          (0 until items.size()).iterator.map(i => items.get(i).toString)
        }
      }(Encoders.STRING)
    spark.read.schema(Schemas.byEntity(entity)).json(rows)
  }

  /** O6 dags-mode list→detail fan-out (airflow_to_gcs.py:130-140): the
    * reference GETs the `/dags` list, then one `/dags/{dag_id}` detail call
    * per row — 1+N requests, serially, in one worker. Here the list pages
    * distribute exactly like any entity fetch, and the per-id detail GETs
    * run inside `mapPartitions` on executors — so the N detail calls fan
    * out across the cluster and scale with executor count, while the
    * driver still makes only the single `total_entries` probe. Detail
    * bodies stage through the explicit 10-field dag schema (never
    * inference), matching the reference's projected row dict. */
  def fetchDags(spark: SparkSession, api: Api): DataFrame = {
    val total = totalEntries(api, "dag", None)
    val numPages = math.max(1L, (total + api.batchSize - 1) / api.batchSize)
    val apiB = api
    // stage 1: page the id list (only dag_id is consumed from list items)
    val ids: Dataset[String] = spark.range(numPages).as(Encoders.LONG)
      .mapPartitions { it =>
        val mapper = new ObjectMapper()
        it.flatMap { page =>
          val url = pageUrl(apiB, "dag", page * apiB.batchSize, None)
          val items = mapper.readTree(get(url, apiB.auth, apiB.maxAttempts, apiB.retryBaseMs)).get("items")
          (0 until items.size()).iterator
            .map(i => items.get(i).get("dag_id").asText())
        }
      }(Encoders.STRING)
    // stage 2: one detail GET per id, partition-parallel; ids are URL-path
    // encoded (dag_ids are user-defined strings)
    val rows: Dataset[String] = ids.mapPartitions { it =>
      it.map { id =>
        val enc = java.net.URLEncoder.encode(id, "UTF-8").replace("+", "%20")
        get(s"${apiB.baseUrl}/dag/$enc", apiB.auth, apiB.maxAttempts, apiB.retryBaseMs)
      }
    }(Encoders.STRING)
    spark.read.schema(Schemas.dag).json(rows)
  }

  /** Full live path for one entity: extract → run-partitioned staging →
    * watermarked dedup load (O6→O16 end to end). */
  def extractStageLoad(spark: SparkSession, api: Api, entity: String,
                       stagingBase: String, runTs: String): Unit = {
    val table = Catalog.tableName(entity)
    val wmCol = Schemas.watermarkOf(entity)
    val wm = wmCol.flatMap(c => Watermark.maxWatermark(spark, table, c))
    // dag is the reference's list→detail mode (no watermark, full refresh);
    // dag_run/task_instance page a flat watermarked list
    val fetched =
      if (entity == "dag") fetchDags(spark, api)
      else fetch(spark, api, entity, wm.map(_.toInstant.toString))
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
