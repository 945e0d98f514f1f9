package graft.kql

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source + view registry: maps `conn.collection` names to DataFrames, the
  * analog of the reference's connector collection lookup
  * (`miso-connectors/src/lib.rs:133-138`) and server-side views
  * (`miso-server/src/http_server.rs:500-559`). Views and `let` bindings are
  * pure macro expansion — spliced into the plan at reference, never
  * materialized (`query_to_workflow.rs:51-84`).
  */
/** A `write`/`tee` target: parquet path, plus the primary key when the sink
  * upserts instead of appending.
  */
final case class SinkSpec(path: String, primaryKey: Option[String])

/** Per-field statistics (reference `miso-connectors/src/stats.rs`
  * `FieldStats { distinct_count }`): the cardinality estimate that feeds
  * the join lowering's broadcast decision — the Spark analog of the
  * reference's DynamicFilter sizing.
  */
final case class FieldStats(distinctCount: Long)
final case class TableStats(
    rows: Long, fields: Map[String, FieldStats], computedAtMs: Long)

final class Catalog(spark: SparkSession) {
  // concurrent maps: the HTTP server mutates views/sinks from its handler
  // threads while query threads read them
  private val tables = TrieMap[String, () => DataFrame]()
  private val streams = TrieMap[String, () => DataFrame]()
  private val views = TrieMap[String, Query]()
  private val viewSources = TrieMap[String, String]()
  private val sinks = TrieMap[String, SinkSpec]()
  // human-readable source description per table, for the connectors API
  private val tableDescs = TrieMap[String, String]()

  def register(name: String, df: => DataFrame): this.type = {
    tables(name) = () => df
    tableDescs.putIfAbsent(name, "dataframe")
    this
  }

  /** Register a file-backed table — the analog of `POST /connectors/{id}`
    * configuring a connector (`miso-server/src/http_server.rs`).
    */
  def registerPath(name: String, path: String, format: String): this.type = {
    require(Set("parquet", "json").contains(format), s"unsupported format '$format'")
    tables(name) = () => spark.read.format(format).load(path)
    tableDescs(name) = s"$format:$path"
    this
  }

  def tableNames: Seq[String] = tables.keys.toSeq.sorted
  def tableDesc(name: String): Option[String] =
    tables.get(name).map(_ => tableDescs.getOrElse(name, "dataframe"))

  def removeTable(name: String): Boolean = {
    val had = tables.remove(name).isDefined
    streams.remove(name)
    tableDescs.remove(name)
    had
  }

  /** Register a streaming view of a table, used by the progressive
    * partial-results path: the same rows, but as a streaming DataFrame
    * whose micro-batches refine blocking aggregates while the query runs.
    */
  def registerStream(name: String, df: => DataFrame): this.type = {
    streams(name) = () => df
    this
  }

  def resolveStream(name: String): Option[DataFrame] = streams.get(name).map(_())

  /** Register a KQL view; scans of `views.name` (or bare `name`) splice it. */
  def registerView(name: String, kql: String): this.type = {
    val parsed = Parser.parse(kql)
    require(parsed.lets.isEmpty, "views cannot contain let bindings")
    views(name) = parsed.query
    viewSources(name) = kql
    this
  }

  def viewNames: Seq[String] = views.keys.toSeq.sorted
  def viewSource(name: String): Option[String] = viewSources.get(name)

  def removeView(name: String): Boolean = {
    viewSources.remove(name)
    views.remove(name).isDefined
  }

  /** Register an append-mode parquet sink path for `write`/`tee` targets
    * (reference `create_sink`, `miso-connectors/src/lib.rs:306-310`).
    */
  def registerSink(name: String, path: String): this.type = {
    sinks(name) = SinkSpec(path, None)
    this
  }

  /** Register a key-upserting sink: rows written here replace stored rows
    * sharing the primary-key value (reference `create_updatable_sink`,
    * `lib.rs:311-318`, `memory.rs:181-195`).
    */
  def registerUpsertSink(name: String, path: String, primaryKey: String): this.type = {
    sinks(name) = SinkSpec(path, Some(primaryKey))
    this
  }

  def resolveSink(name: String): Option[SinkSpec] = sinks.get(name)

  def resolveTable(name: String): Option[DataFrame] = tables.get(name).map(_())

  // field statistics, keyed by table name. The reference refetches stats
  // on a background interval (stats.rs IntervalStatsCollector); embedded
  // in a library the paradigm-correct form is on-demand compute with the
  // result cached until explicitly recomputed — the server's
  // GET /connectors/{id}/stats triggers it
  private val statsMap = TrieMap[String, TableStats]()

  /** One aggregate pass over the table: total rows plus
    * `approx_count_distinct` per atomic column (HLL — mergeable map-side
    * partials, one shuffle of k sketch rows, the only stats shape that
    * works at 100 TB). Nested/variant/binary columns are skipped, like the
    * reference's connectors which only report stats for indexed scalar
    * fields.
    */
  def computeStats(name: String): Option[TableStats] =
    resolveTable(name).map { df =>
      import org.apache.spark.sql.functions.{approx_count_distinct, col, count, lit}
      import org.apache.spark.sql.types._
      val cols = df.schema.fields.filter(_.dataType match {
        case _: ArrayType | _: MapType | _: StructType | BinaryType |
             _: VariantType => false
        case _ => true
      })
      val aggs = count(lit(1)).as("__rows") +:
        cols.toSeq.map(f => approx_count_distinct(col(f.name)).as(f.name))
      val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      val ts = TableStats(
        row.getLong(0),
        cols.toSeq.zipWithIndex
          .map { case (f, i) => f.name -> FieldStats(row.getLong(i + 1)) }
          .toMap,
        System.currentTimeMillis())
      statsMap(name) = ts
      ts
    }

  /** Cached stats only — never triggers a scan (the compiler consults this
    * during plan building, where a blocking stats job would be a
    * compile-time surprise).
    */
  def stats(name: String): Option[TableStats] = statsMap.get(name)

  /** Run a native (Spark SQL) query with every registered table exposed as
    * a temp view under its bare name — the analog of connector `raw_query`.
    */
  def rawQuery(sql: String): DataFrame = {
    tables.foreach { case (name, mk) =>
      if (!name.contains(".")) mk().createOrReplaceTempView(name)
    }
    spark.sql(sql)
  }

  def resolveView(name: String): Option[Query] =
    views.get(name).orElse {
      if (name.startsWith("views.")) views.get(name.stripPrefix("views."))
      else None
    }
}

object Catalog {
  /** Catalog over the driver parquet testdata: table names resolve bare
    * (`lineitem`) or with a connector prefix (`test.lineitem`).
    */
  def forTestData(spark: SparkSession, sfDir: String): Catalog = {
    import org.apache.spark.sql.functions.{col, parse_json}
    val c = new Catalog(spark)
    graft.Tables.names.foreach { n =>
      c.register(n, graft.Tables.load(spark, sfDir, n))
      c.register(s"test.$n", graft.Tables.load(spark, sfDir, n))
      c.registerStream(n, graft.Tables.loadStream(spark, sfDir, n))
      c.registerStream(s"test.$n", graft.Tables.loadStream(spark, sfDir, n))
    }
    // schemaless view of events: props as a VariantType column (miso's
    // native dynamic-JSON model) — field paths descend via try_variant_get
    c.register("eventsv", graft.Tables.load(spark, sfDir, "events")
      .withColumn("props", parse_json(col("props"))))
    // a genuinely FOREIGN store: customer seeded into embedded Derby and
    // read back through the graft-sqlstore V2 connector, so scans of this
    // name negotiate filter/column/limit/topn/aggregate pushdown with a
    // remote SQL engine (miso's federation identity). Lazy: the register
    // thunk seeds Derby only when a query actually resolves the name.
    c.register("derby.customer",
      graft.sources.v2.DerbyTestStore.readBack(spark, sfDir, "customer"))
    c
  }
}
