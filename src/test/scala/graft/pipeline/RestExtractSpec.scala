package graft.pipeline

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Live REST extraction against a local stub server speaking the
  * Airflow-REST page shape: pagination fans out across tasks, the watermark
  * narrows the server-side result, and the full
  * extract→stage→watermark→dedup-load path lands correct rows. */
class RestExtractSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = TestSpark.spark

  private var server: HttpServer = _
  private var base: String = _

  // 25 dag_runs, start_date 2022-03-01T00:00:05Z + i hours
  private def runJson(i: Int): String = {
    val start = java.time.Instant.parse("2022-03-01T00:00:05Z")
      .plusSeconds(3600L * i)
    s"""{"dag_id": "live_dag", "dag_run_id": "run_$i",
        "end_date": null, "execution_date": "$start",
        "external_trigger": false, "logical_date": "$start",
        "start_date": "$start", "state": "success"}"""
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/api/dag_run", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val params = Option(ex.getRequestURI.getQuery).getOrElse("")
          .split("&").filter(_.contains("="))
          .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap
        val limit = params.getOrElse("limit", "1000").toInt
        val offset = params.getOrElse("offset", "0").toInt
        val wm = params.get("start_date_gte").map(java.time.Instant.parse)
        // INCLUSIVE >= semantics (the Airflow API contract): boundary rows
        // are returned; the engine's residual strict > must drop them
        val all = (0 until 25).filter { i =>
          val start = java.time.Instant.parse("2022-03-01T00:00:05Z")
            .plusSeconds(3600L * i)
          wm.forall(w => !start.isBefore(w))
        }
        val page = all.slice(offset, offset + limit).map(runJson)
        val body =
          s"""{"items": [${page.mkString(",")}], "total_entries": ${all.size}}"""
        val bytes = body.getBytes("UTF-8")
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    base = s"http://localhost:${server.getAddress.getPort}/api"
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  test("paged fetch fans out and returns every row, typed") {
    val api = RestExtract.Api(base, batchSize = 10)
    val df = RestExtract.fetch(spark, api, "dag_run")
    assert(df.count() == 25)
    assert(df.schema("start_date").dataType.typeName == "timestamp")
    assert(df.select("dag_run_id").distinct().count() == 25)
  }

  test("watermark narrows the extraction server-side (inclusive raw fetch)") {
    val api = RestExtract.Api(base, batchSize = 10)
    // watermark at run_19's start: the raw fetch keeps the inclusive
    // boundary row (server >= semantics) — runs 19..24; the strict > is
    // applied by extractStageLoad / the DSv2 residual filter
    val wm = java.time.Instant.parse("2022-03-01T00:00:05Z").plusSeconds(3600L * 19)
    val df = RestExtract.fetch(spark, api, "dag_run", Some(wm.toString))
    assert(df.count() == 6)
  }

  test("DSv2 connector: watermark filter pushes into the HTTP query") {
    val df = spark.read.format("graft.sources.RestDataSource")
      .option("baseUrl", base).option("entity", "dag_run")
      .option("batchSize", "10")
      .load()
    assert(df.count() == 25)
    val wm = java.sql.Timestamp.from(
      java.time.Instant.parse("2022-03-01T00:00:05Z").plusSeconds(3600L * 19))
    val filtered = df.filter(col("start_date") > lit(wm))
    assert(filtered.count() == 5, "server must receive the pushed watermark")
    // the pushed predicate is visible in the scan description
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("watermark=2022-03-01T19:00:05Z"), plan.take(600))
    // residual filters still evaluate in Spark
    assert(df.filter(col("state") === "success").count() == 25)
    assert(df.filter(col("state") === "failed").count() == 0)
  }

  test("live extract→stage→load is incremental and idempotent") {
    Catalog.drop(spark); Catalog.ensure(spark)
    val api = RestExtract.Api(base, batchSize = 7)
    val stagingBase = java.nio.file.Files.createTempDirectory("graft-live").toString
    RestExtract.extractStageLoad(spark, api, "dag_run", stagingBase, "20220301T000000")
    assert(spark.table("rpt.dag_run").count() == 25)
    // second run: watermark = max(start_date) → server returns nothing new
    RestExtract.extractStageLoad(spark, api, "dag_run", stagingBase, "20220301T010000")
    assert(spark.table("rpt.dag_run").count() == 25)
  }
}
