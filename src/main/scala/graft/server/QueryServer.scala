package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import graft.kql.{Catalog, Kql, KqlParseException}

/** HTTP/SSE API mirroring the reference's server surface
  * (`miso-server/src/http_server.rs`): `POST /query` streams result rows as
  * server-sent events, `POST /explain` returns the plan without executing,
  * `POST /views/{id}` registers a named view. Built on the JDK's HttpServer
  * + Spark's bundled Jackson — no extra dependencies.
  *
  * Scale note: rows stream through `toJSON.toLocalIterator`, so the driver
  * holds one partition at a time, never the full result — the moral
  * equivalent of miso's channel-fed SSE writer.
  */
final class QueryServer(spark: SparkSession, catalog: Catalog, port: Int) {
  private val mapper = new ObjectMapper()
  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  def boundPort: Int = server.getAddress.getPort

  def start(): this.type = {
    server.createContext("/query", (ex: HttpExchange) => handle(ex, handleQuery))
    server.createContext("/explain", (ex: HttpExchange) => handle(ex, handleExplain))
    server.createContext("/views/", (ex: HttpExchange) => handle(ex, handleView))
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    this
  }

  def stop(): Unit = server.stop(0)

  private def handle(ex: HttpExchange, fn: HttpExchange => Unit): Unit =
    try fn(ex)
    catch {
      case e: KqlParseException => respond(ex, 400, e.getMessage)
      case e: IllegalArgumentException => respond(ex, 400, e.getMessage)
      case e: Exception =>
        respond(ex, 500, Option(e.getMessage).getOrElse(e.getClass.getName).trim)
    } finally ex.close()

  private def body(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), UTF_8)

  /** Request body: `{"query": "…"}` or raw KQL text. */
  private def queryOf(ex: HttpExchange): String = {
    val raw = body(ex)
    if (raw.trim.startsWith("{")) {
      val node = mapper.readTree(raw)
      require(node.has("query"), "missing 'query' field")
      node.get("query").asText()
    } else raw
  }

  private def respond(ex: HttpExchange, code: Int, text: String): Unit = {
    val bytes = text.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "text/plain; charset=utf-8")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  /** SSE stream of JSON rows: `data: {…}` per row, `event: done` terminal
    * (the reference's stream shape, `http_server.rs:335-405`).
    */
  private def handleQuery(ex: HttpExchange): Unit = {
    val df = Kql.run(spark, catalog, queryOf(ex))
    ex.getResponseHeaders.set("Content-Type", "text/event-stream; charset=utf-8")
    ex.sendResponseHeaders(200, 0) // chunked
    val out = ex.getResponseBody
    // once the 200 + SSE headers are on the wire, execution errors cannot
    // become an HTTP status — surface them as an SSE error event (the
    // reference streams errors in-band the same way)
    try {
      val it = df.toJSON.toLocalIterator()
      while (it.hasNext) {
        out.write(s"data: ${it.next()}\n\n".getBytes(UTF_8))
        out.flush()
      }
      out.write("event: done\ndata: \n\n".getBytes(UTF_8))
    } catch {
      case e: Exception =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          .trim.replace("\n", " ").take(500)
        out.write(s"event: error\ndata: $msg\n\n".getBytes(UTF_8))
    }
    out.flush()
  }

  private def handleExplain(ex: HttpExchange): Unit =
    respond(ex, 200, Kql.explain(spark, catalog, queryOf(ex)))

  /** `POST /views/{id}` registers; scans of `views.{id}` splice it. */
  private def handleView(ex: HttpExchange): Unit = {
    val id = ex.getRequestURI.getPath.stripPrefix("/views/")
    require(id.nonEmpty && id.matches("[A-Za-z_][A-Za-z0-9_]*"), s"bad view id '$id'")
    catalog.registerView(id, queryOf(ex))
    respond(ex, 200, s"view '$id' registered")
  }
}

object QueryServer {
  /** Start on an ephemeral (or given) port. */
  def start(spark: SparkSession, catalog: Catalog, port: Int = 0): QueryServer =
    new QueryServer(spark, catalog, port).start()

  /** Standalone entry point: serve the testdata catalog. */
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val port = sys.env.getOrElse("SPARK_GRAFT_PORT", "8580").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val srv = start(spark, Catalog.forTestData(spark, sfDir), port)
    println(s"graft query server listening on :${srv.boundPort} (sf=$sfDir)")
    Thread.currentThread().join()
  }
}
