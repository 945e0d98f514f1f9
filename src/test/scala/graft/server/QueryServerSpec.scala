package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.kql.Catalog

/** End-to-end HTTP/SSE API tests — the analog of the reference's server
  * integration tests: POST a KQL query, read SSE rows back.
  */
class QueryServerSpec extends AnyFunSuite {
  import TestSpark.spark

  private lazy val server = {
    val cat = Catalog.forTestData(spark, TestSpark.sf)
    QueryServer.start(spark, cat)
  }
  private lazy val base = s"http://localhost:${server.boundPort}"
  private lazy val client = HttpClient.newHttpClient()

  private def post(path: String, body: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(base + path))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("POST /query streams SSE rows") {
    val r = post("/query",
      """{"query": "events | summarize n=count() by event_type | sort by event_type"}""")
    assert(r.statusCode() == 200)
    assert(r.headers().firstValue("Content-Type").orElse("").startsWith("text/event-stream"))
    val dataLines = r.body().split("\n").filter(_.startsWith("data: {")).toSeq
    assert(dataLines.length == 5) // five event types
    assert(dataLines.head.contains("\"event_type\":"))
    assert(r.body().contains("event: done"))
  }

  test("POST /query accepts raw KQL text body") {
    val r = post("/query", "events | count")
    assert(r.statusCode() == 200)
    assert(r.body().contains("\"Count\":"))
  }

  test("POST /explain returns the plan without executing") {
    val r = post("/explain", """{"query": "events | where value > 1 | count"}""")
    assert(r.statusCode() == 200)
    assert(r.body().contains("where value > 1"))
    assert(r.body().contains("spark optimized plan"))
  }

  test("POST /views/{id} registers a view usable in scans") {
    assert(post("/views/errs", "events | where event_type == 'error'").statusCode() == 200)
    val r = post("/query", "views.errs | count")
    assert(r.statusCode() == 200 && r.body().contains("\"Count\":"))
  }

  test("bad KQL yields 400 with the parse error") {
    val r = post("/query", "events | frobnicate")
    assert(r.statusCode() == 400)
    assert(r.body().contains("unknown step"))
  }

  test("bad view id rejected") {
    assert(post("/views/../etc", "events | count").statusCode() != 200)
  }
}
