package graft.sources.v2

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Test/bench fixture: an embedded Apache Derby database seeded from the
  * driver's parquet testdata, standing in for the reference's live remote
  * stores (the testcontainers Quickwit/ES/Splunk fixtures of
  * `tests/common/mod.rs`). The `graft-sqlstore` V2 connector then reads it
  * back WITH pushdown — a genuinely foreign row store the Spark plan
  * cannot see through, so PushedFilters/PushedAggregates in the scan are
  * the real federation contract, not parquet conveniences.
  *
  * Seeding streams `toLocalIterator` through batched JDBC inserts —
  * driver-side by design (this is test fixture setup for a bounded dim
  * table, not an operator), one-time per JVM per sf directory.
  */
object DerbyTestStore {
  private val dbs = TrieMap[String, String]() // (sfDir, table) -> jdbc url
  private lazy val root = {
    System.setProperty("derby.stream.error.file", "/tmp/graft-derby.log")
    val d = java.nio.file.Files.createTempDirectory("graft-derby")
    d.toFile.deleteOnExit()
    d
  }

  private def sqlType(t: DataType): String = t match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case DoubleType => "DOUBLE"
    case BooleanType => "BOOLEAN"
    case StringType => "VARCHAR(1024)"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case DateType => "DATE"
    case other => throw new IllegalArgumentException(s"no Derby type for $other")
  }

  /** JDBC url of a Derby database holding `table` seeded from
    * `sfDir/table.parquet`; idempotent per JVM.
    */
  // Lookup and seeding both sit inside the lock: TrieMap.getOrElseUpdate
  // does not run the thunk atomically, so two first-access racers would
  // both seed and the loser would hit CREATE TABLE on an existing db.
  def url(spark: SparkSession, sfDir: String, table: String): String =
    synchronized(dbs.getOrElseUpdate(s"$sfDir/$table", {
      val dbPath = root.resolve(
        sfDir.replaceAll("[^A-Za-z0-9.]", "_") + "_" + table)
      val u = s"jdbc:derby:$dbPath;create=true"
      val df = graft.Tables.load(spark, sfDir, table)
      val fields = df.schema.fields
      SqlStore.withConnection(u) { conn =>
        val ddl = fields.map(f =>
          s"${SqlStore.quote(f.name)} ${sqlType(f.dataType)}")
          .mkString(s"CREATE TABLE ${SqlStore.quote(table)} (", ", ", ")")
        val st = conn.createStatement()
        try st.execute(ddl) finally st.close()
        conn.setAutoCommit(false)
        val ins = conn.prepareStatement(
          s"INSERT INTO ${SqlStore.quote(table)} VALUES (" +
            fields.map(_ => "?").mkString(", ") + ")")
        try {
          var pending = 0
          df.toLocalIterator().forEachRemaining { row =>
            var i = 0
            while (i < fields.length) {
              if (row.isNullAt(i)) ins.setNull(i + 1, java.sql.Types.NULL)
              else fields(i).dataType match {
                case LongType => ins.setLong(i + 1, row.getLong(i))
                case IntegerType => ins.setInt(i + 1, row.getInt(i))
                case DoubleType => ins.setDouble(i + 1, row.getDouble(i))
                case BooleanType => ins.setBoolean(i + 1, row.getBoolean(i))
                case StringType => ins.setString(i + 1, row.getString(i))
                case TimestampType | TimestampNTZType =>
                  ins.setTimestamp(i + 1,
                    java.sql.Timestamp.from(row.getInstant(i)))
                case DateType => ins.setDate(i + 1,
                  java.sql.Date.valueOf(row.getLocalDate(i)))
                case other => throw new IllegalArgumentException(s"$other")
              }
              i += 1
            }
            ins.addBatch()
            pending += 1
            if (pending == 500) { ins.executeBatch(); pending = 0 }
          }
          if (pending > 0) ins.executeBatch()
          conn.commit()
        } finally ins.close()
      }
      u
    }))

  /** The seeded table read back through the V2 connector. */
  def readBack(spark: SparkSession, sfDir: String, table: String,
      splits: Option[SplitSpec] = None): DataFrame = {
    val r = spark.read.format("graft-sqlstore")
      .option("url", url(spark, sfDir, table))
      .option("table", table)
    splits.fold(r) { s =>
      r.option("partitionColumn", s.column)
        .option("lowerBound", s.lowerBound.toString)
        .option("upperBound", s.upperBound.toString)
        .option("numPartitions", s.numPartitions.toString)
    }.load()
  }
}
