package graft.sources.v2

import java.sql.{Connection, DriverManager, ResultSet, Types}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Avg, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsPushDownTopN}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A DataSource V2 connector for an external SQL store (JDBC — tested
  * against embedded Apache Derby), implementing the full read-pushdown
  * surface: `SupportsPushDownFilters`, `SupportsPushDownRequiredColumns`,
  * `SupportsPushDownLimit`, `SupportsPushDownTopN`,
  * `SupportsPushDownAggregates`.
  *
  * This is the Spark-native analog of the reference's federated
  * connectors (`miso-connectors/src/quickwit.rs:1268-1552`,
  * `elasticsearch.rs:1264-1487`, `splunk/mod.rs:1182-1380`): each miso
  * connector translates the prefix of the query plan it can serve —
  * filters, projections, limits, top-n, summarize — into the remote
  * store's own query language and leaves a residual plan for the engine
  * (`tests/common/test_cases.rs:30-50` pins those residual plans per
  * connector). Here Catalyst drives the same negotiation through the V2
  * pushdown interfaces, this ScanBuilder translates what Derby's SQL can
  * express, and whatever it declines stays in the Spark plan — the
  * residual. `V2PushdownSpec` pins the residual plans.
  *
  * At 100 TB the remote store is not one JDBC endpoint but a fleet of
  * shards; the split model here is `partitionColumn`/`numPartitions`/
  * `lowerBound`/`upperBound` options generating one range predicate per
  * input partition (the same contract as Spark's own JDBC source), so a
  * 1000-executor cluster issues 1000 disjoint remote reads in parallel.
  * Aggregate pushdown stays correct under splits by downgrading to
  * PARTIAL pushdown (`supportCompletePushDown` false ⇒ Spark plans the
  * final merge agg); top-n pushdown is declined entirely under splits
  * (per-shard order is not global order).
  *
  * Options: `url` (JDBC), `table`, and optionally the four split options.
  */
class SqlStoreProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-sqlstore"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SqlStore.withConnection(options.get("url")) { conn =>
      val st = conn.prepareStatement(
        s"SELECT * FROM ${SqlStore.quote(options.get("table"))} WHERE 1=0")
      try {
        val md = st.getMetaData
        StructType((1 to md.getColumnCount).map { i =>
          StructField(md.getColumnLabel(i), SqlStore.sparkType(
            md.getColumnType(i)), md.isNullable(i) != 0)
        })
      } finally st.close()
    }

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new SqlStoreTable(schema, opts.get("url"), opts.get("table"),
      Option(opts.get("partitioncolumn")).map { pc =>
        SplitSpec(pc,
          opts.get("lowerbound").toLong,
          opts.get("upperbound").toLong,
          opts.get("numpartitions").toInt)
      })
  }

  override def supportsExternalMetadata(): Boolean = true
}

/** Range-split read: `numPartitions` disjoint slices of
  * `[lowerBound, upperBound]` on `column` (rows outside the bounds land in
  * the first/last slice — bounds steer parallelism, never filter).
  */
final case class SplitSpec(
    column: String, lowerBound: Long, upperBound: Long, numPartitions: Int)

class SqlStoreTable(
    schema: StructType, url: String, table: String, split: Option[SplitSpec])
    extends Table with SupportsRead {
  override def name(): String = s"sqlstore:$table"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SqlStoreScanBuilder(schema, url, table, split)
}

class SqlStoreScanBuilder(
    tableSchema: StructType, url: String, table: String,
    split: Option[SplitSpec])
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit
    with SupportsPushDownTopN
    with SupportsPushDownAggregates {

  private val nSplits = split.map(_.numPartitions).getOrElse(1)
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = tableSchema
  private var pushedLimit: Option[Int] = None
  private var pushedOrder: Array[SortOrder] = Array.empty
  // pushed aggregate state: SELECT-list fragments + the post-agg schema
  private var aggSelect: Option[Seq[String]] = None
  private var aggGroupBy: Seq[String] = Nil
  private var aggSchema: Option[StructType] = None
  private var aggComplete = false

  // --- filters -----------------------------------------------------------
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) =
      filters.partition(f => SqlStore.compileFilter(f, tableSchema).isDefined)
    pushed = ok
    residual // Spark re-applies these — the residual plan
  }
  override def pushedFilters(): Array[Filter] = pushed

  // --- column pruning ----------------------------------------------------
  override def pruneColumns(requiredSchema: StructType): Unit =
    // post-aggregate schema is authoritative once an agg is pushed
    if (aggSchema.isEmpty) required = requiredSchema

  // --- limit / top-n -----------------------------------------------------
  override def pushLimit(limit: Int): Boolean = {
    pushedLimit = Some(limit)
    true // under splits this is a per-slice cap; Spark keeps its own Limit
  }
  override def isPartiallyPushed(): Boolean = nSplits > 1

  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean = {
    // per-shard order is not global order: decline under splits and let
    // Spark plan TakeOrderedAndProject over the parallel scan
    if (nSplits > 1) return false
    val compilable = orders.forall(o =>
      SqlStore.fieldName(o.expression()).exists(n =>
        tableSchema.fieldNames.contains(n)))
    if (!compilable) return false
    pushedOrder = orders
    pushedLimit = Some(limit)
    true
  }

  // --- aggregates --------------------------------------------------------
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    nSplits == 1 && translateAggregation(aggregation).isDefined

  override def pushAggregation(aggregation: Aggregation): Boolean =
    translateAggregation(aggregation) match {
      case Some((select, groupBy, schema)) =>
        aggSelect = Some(select); aggGroupBy = groupBy
        aggSchema = Some(schema); aggComplete = nSplits == 1
        true
      case None => false
    }

  /** Aggregation → (SELECT fragments, GROUP BY fragments, result schema),
    * or None when any piece exceeds what the store evaluates natively —
    * Catalyst then keeps the whole aggregate (the reference's rule: a
    * connector only accepts plan steps it can express,
    * `miso-optimizations/src/pushdown.rs`).
    */
  private def translateAggregation(
      agg: Aggregation): Option[(Seq[String], Seq[String], StructType)] = {
    def colOf(e: V2Expression): Option[(String, StructField)] =
      SqlStore.fieldName(e).flatMap(n =>
        tableSchema.fields.find(_.name == n).map(f => (SqlStore.quote(n), f)))
    val groupBy = agg.groupByExpressions.toSeq.map(colOf)
    if (groupBy.exists(_.isEmpty)) return None
    val fields = ArrayBuffer[StructField]()
    val select = ArrayBuffer[String]()
    groupBy.flatten.foreach { case (sql, f) => select += sql; fields += f }
    // partial pushdown (splits) must emit mergeable partials: sum/count/
    // min/max are; avg is not (Spark rewrites avg→sum+count itself when
    // complete pushdown is off, so declining it here is safe)
    val partialOk: AggregateFunc => Boolean = {
      case _: Avg => nSplits == 1
      case _ => true
    }
    agg.aggregateExpressions.toSeq.foreach {
      case f if !partialOk(f) => return None
      case _: CountStar =>
        select += "CAST(COUNT(*) AS BIGINT)"
        fields += StructField("count_star", LongType, nullable = false)
      case c: Count =>
        val (sql, _) = colOf(c.column()).getOrElse(return None)
        val d = if (c.isDistinct) {
          if (nSplits > 1) return None // distinct does not partial-merge
          "DISTINCT "} else ""
        select += s"CAST(COUNT($d$sql) AS BIGINT)"
        fields += StructField("count", LongType, nullable = false)
      case s: Sum =>
        val (sql, f) = colOf(s.column()).getOrElse(return None)
        if (s.isDistinct && nSplits > 1) return None
        val d = if (s.isDistinct) "DISTINCT " else ""
        f.dataType match {
          case ByteType | ShortType | IntegerType | LongType =>
            select += s"CAST(SUM($d$sql) AS BIGINT)"
            fields += StructField("sum", LongType, nullable = true)
          case FloatType | DoubleType =>
            select += s"CAST(SUM($d$sql) AS DOUBLE)"
            fields += StructField("sum", DoubleType, nullable = true)
          case _ => return None
        }
      case m: Min =>
        val (sql, f) = colOf(m.column()).getOrElse(return None)
        select += s"MIN($sql)"
        fields += StructField("min", f.dataType, nullable = true)
      case m: Max =>
        val (sql, f) = colOf(m.column()).getOrElse(return None)
        select += s"MAX($sql)"
        fields += StructField("max", f.dataType, nullable = true)
      case a: Avg =>
        val (sql, _) = colOf(a.column()).getOrElse(return None)
        if (a.isDistinct) return None
        select += s"AVG(CAST($sql AS DOUBLE))"
        fields += StructField("avg", DoubleType, nullable = true)
      case _ => return None // unsupported aggregate → no push at all
    }
    Some((select.toSeq, groupBy.flatten.map(_._1), StructType(fields.toSeq)))
  }

  // --- build -------------------------------------------------------------
  override def build(): Scan = {
    val whereSql = {
      val parts = pushed.flatMap(f => SqlStore.compileFilter(f, tableSchema))
      if (parts.isEmpty) "" else parts.mkString(" WHERE (", ") AND (", ")")
    }
    val selectSql = aggSelect match {
      case Some(aggs) => aggs.mkString(", ")
      case None =>
        if (required.isEmpty) "1" // count-only scan: no columns needed
        else required.fieldNames.map(SqlStore.quote).mkString(", ")
    }
    val groupSql =
      if (aggSelect.isEmpty) ""
      else if (aggGroupBy.isEmpty) ""
      else aggGroupBy.mkString(" GROUP BY ", ", ", "")
    val orderSql =
      if (pushedOrder.isEmpty) ""
      else pushedOrder.map { o =>
        val n = SqlStore.fieldName(o.expression()).get
        val dir =
          if (o.direction() == SortDirection.ASCENDING) "ASC" else "DESC"
        val nulls = o.nullOrdering().toString.replace('_', ' ')
        s"${SqlStore.quote(n)} $dir $nulls"
      }.mkString(" ORDER BY ", ", ", "")
    val limitSql =
      pushedLimit.map(n => s" FETCH FIRST $n ROWS ONLY").getOrElse("")
    // an empty required schema (count-without-pushdown) still reads row
    // COUNTS: SELECT a constant, emit zero-field rows
    val readSchema = aggSchema.getOrElse(required)
    new SqlStoreScan(url, table, selectSql, whereSql, groupSql, orderSql,
      limitSql, readSchema, split,
      pushedInfo = s"PushedFilters: [${pushed.mkString(", ")}], " +
        s"PushedAggregates: [${aggSelect.map(_.mkString(", ")).getOrElse("")}], " +
        s"PushedGroupBy: [${aggGroupBy.mkString(", ")}], " +
        s"PushedTopN: [${orderSql.trim}${pushedLimit.map(n => s" LIMIT $n").getOrElse("")}], " +
        s"ReadSchema: ${readSchema.simpleString}")
  }
}

class SqlStoreScan(
    url: String, table: String, selectSql: String, whereSql: String,
    groupSql: String, orderSql: String, limitSql: String,
    schema: StructType, split: Option[SplitSpec], pushedInfo: String)
    extends Scan with Batch {

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String = s"sqlstore:$table $pushedInfo"

  /** One SQL statement per input partition; under splits, a disjoint range
    * predicate on the split column is AND-ed into the WHERE clause.
    */
  private def sqlFor(rangePred: Option[String]): String = {
    val where = (rangePred, whereSql) match {
      case (None, w) => w
      case (Some(r), "") => s" WHERE $r"
      case (Some(r), w) => s"$w AND ($r)"
    }
    s"SELECT $selectSql FROM ${SqlStore.quote(table)}" +
      where + groupSql + orderSql + limitSql
  }

  override def planInputPartitions(): Array[InputPartition] = split match {
    case None => Array(SqlPartition(sqlFor(None), 0))
    case Some(SplitSpec(col, lo, hi, n)) =>
      val q = SqlStore.quote(col)
      val step = math.max(1L, (hi - lo + n) / n)
      (0 until n).map { i =>
        val a = lo + i * step
        val b = a + step
        val pred =
          if (i == 0) s"$q < $b" // first slice absorbs under-bound rows
          else if (i == n - 1) s"$q >= $a" // last absorbs over-bound rows
          else s"$q >= $a AND $q < $b"
        SqlPartition(sqlFor(Some(pred)), i)
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SqlStoreReaderFactory(url, schema)
}

final case class SqlPartition(sql: String, index: Int) extends InputPartition

class SqlStoreReaderFactory(url: String, schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new SqlStorePartitionReader(url, p.asInstanceOf[SqlPartition].sql, schema)
}

/** Streams the remote result set row-by-row into InternalRows — nothing is
  * buffered beyond JDBC's own fetch window, so a huge remote slice never
  * materializes on the executor.
  */
class SqlStorePartitionReader(url: String, sql: String, schema: StructType)
    extends PartitionReader[InternalRow] {
  private val conn = SqlStore.connect(url)
  private val stmt = conn.createStatement()
  private val rs: ResultSet = stmt.executeQuery(sql)
  private val n = schema.fields.length

  override def next(): Boolean = rs.next()

  override def get(): InternalRow = {
    val row = new GenericInternalRow(n)
    var i = 0
    while (i < n) {
      val v: Any = schema.fields(i).dataType match {
        case LongType => rs.getLong(i + 1)
        case IntegerType => rs.getInt(i + 1)
        case DoubleType => rs.getDouble(i + 1)
        case FloatType => rs.getFloat(i + 1)
        case BooleanType => rs.getBoolean(i + 1)
        case StringType =>
          val s = rs.getString(i + 1)
          if (s == null) null else UTF8String.fromString(s)
        case TimestampType =>
          val t = rs.getTimestamp(i + 1)
          if (t == null) null
          else t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
        case DateType =>
          val d = rs.getDate(i + 1)
          if (d == null) null else d.toLocalDate.toEpochDay.toInt
        case d: DecimalType =>
          val b = rs.getBigDecimal(i + 1)
          if (b == null) null
          else org.apache.spark.sql.types.Decimal(b, d.precision, d.scale)
        case BinaryType => rs.getBytes(i + 1)
        case other =>
          throw new IllegalArgumentException(s"unsupported read type $other")
      }
      row(i) = if (rs.wasNull()) null else v
      i += 1
    }
    row
  }

  override def close(): Unit = {
    try rs.close() finally { try stmt.close() finally conn.close() }
  }
}

object SqlStore {
  def connect(url: String): Connection = DriverManager.getConnection(url)

  def withConnection[A](url: String)(f: Connection => A): A = {
    val c = connect(url)
    try f(c) finally c.close()
  }

  def quote(name: String): String = "\"" + name.replace("\"", "\"\"") + "\""

  def fieldName(e: V2Expression): Option[String] = e match {
    case n: NamedReference if n.fieldNames().length == 1 =>
      Some(n.fieldNames()(0))
    case _ => None
  }

  def sparkType(sqlType: Int): DataType = sqlType match {
    case Types.BIGINT => LongType
    case Types.INTEGER | Types.SMALLINT | Types.TINYINT => IntegerType
    case Types.DOUBLE | Types.FLOAT => DoubleType
    case Types.REAL => FloatType
    case Types.BOOLEAN | Types.BIT => BooleanType
    case Types.VARCHAR | Types.CHAR | Types.LONGVARCHAR | Types.CLOB =>
      StringType
    case Types.TIMESTAMP => TimestampType
    case Types.DATE => DateType
    case Types.DECIMAL | Types.NUMERIC => DecimalType(38, 18)
    case Types.BINARY | Types.VARBINARY | Types.LONGVARBINARY | Types.BLOB =>
      BinaryType
    case other =>
      throw new IllegalArgumentException(s"unsupported JDBC type $other")
  }

  private def sqlLiteral(v: Any): Option[String] = v match {
    case null => None
    case s: String => Some("'" + s.replace("'", "''") + "'")
    case s: UTF8String => sqlLiteral(s.toString)
    case b: Boolean => Some(if (b) "TRUE" else "FALSE")
    case n @ (_: Byte | _: Short | _: Int | _: Long) => Some(n.toString)
    case d: Double =>
      if (d.isNaN || d.isInfinite) None else Some(d.toString)
    case f: Float =>
      if (f.isNaN || f.isInfinite) None else Some(f.toString)
    case d: java.math.BigDecimal => Some(d.toPlainString)
    case d: BigDecimal => Some(d.underlying.toPlainString)
    case t: java.sql.Timestamp => Some(s"TIMESTAMP('${t.toString}')")
    case t: java.time.Instant =>
      sqlLiteral(java.sql.Timestamp.from(t))
    case d: java.sql.Date => Some(s"DATE('${d.toString}')")
    case d: java.time.LocalDate => Some(s"DATE('${d.toString}')")
    case _ => None
  }

  private def likeEscape(s: String): String =
    s.replace("=", "==").replace("%", "=%").replace("_", "=_")
      .replace("'", "''")

  /** v1 Filter → store-SQL predicate; None marks it residual. Mirrors the
    * per-connector `apply_filter` translation tables in the reference
    * (each declines what the remote language cannot express).
    */
  def compileFilter(f: Filter, schema: StructType): Option[String] = {
    def colOk(n: String): Option[String] =
      if (schema.fieldNames.contains(n)) Some(quote(n)) else None
    f match {
      case EqualTo(a, v) =>
        for (c <- colOk(a); l <- sqlLiteral(v)) yield s"$c = $l"
      case EqualNullSafe(a, null) => colOk(a).map(c => s"$c IS NULL")
      case EqualNullSafe(a, v) =>
        for (c <- colOk(a); l <- sqlLiteral(v)) yield s"$c = $l"
      case GreaterThan(a, v) =>
        for (c <- colOk(a); l <- sqlLiteral(v)) yield s"$c > $l"
      case GreaterThanOrEqual(a, v) =>
        for (c <- colOk(a); l <- sqlLiteral(v)) yield s"$c >= $l"
      case LessThan(a, v) =>
        for (c <- colOk(a); l <- sqlLiteral(v)) yield s"$c < $l"
      case LessThanOrEqual(a, v) =>
        for (c <- colOk(a); l <- sqlLiteral(v)) yield s"$c <= $l"
      case In(a, vs) =>
        val ls = vs.toSeq.map(sqlLiteral)
        if (ls.exists(_.isEmpty)) None
        else colOk(a).map(c => s"$c IN (${ls.flatten.mkString(", ")})")
      case IsNull(a) => colOk(a).map(c => s"$c IS NULL")
      case IsNotNull(a) => colOk(a).map(c => s"$c IS NOT NULL")
      case And(l, r) =>
        for (a <- compileFilter(l, schema); b <- compileFilter(r, schema))
          yield s"($a) AND ($b)"
      case Or(l, r) =>
        for (a <- compileFilter(l, schema); b <- compileFilter(r, schema))
          yield s"($a) OR ($b)"
      case Not(c) => compileFilter(c, schema).map(p => s"NOT ($p)")
      case StringStartsWith(a, v) =>
        colOk(a).map(c => s"$c LIKE '${likeEscape(v)}%' ESCAPE '='")
      case StringEndsWith(a, v) =>
        colOk(a).map(c => s"$c LIKE '%${likeEscape(v)}' ESCAPE '='")
      case StringContains(a, v) =>
        colOk(a).map(c => s"$c LIKE '%${likeEscape(v)}%' ESCAPE '='")
      case _ => None // AlwaysTrue/AlwaysFalse/nested → residual
    }
  }
}
