package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Armor against test-data encoding drift: the driver has shipped
  * `events.ts` as both parquet TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
  * across generations. The reference is schemaless per-row
  * (`miso-workflow-types/src/value/mod.rs:20`) and never notices such a
  * change; `Tables.load` must branch on the decoded schema and yield
  * identical rows and an identical `ts` dtype from every encoding.
  */
class TablesSpec extends AnyFunSuite {
  import TestSpark._

  // 3 rows with distinct micro-precision instants; nanos are exact multiples
  // of 1000 (the driver data has no sub-microsecond components).
  private val micros = Seq(1700000000000000L, 1700000000000001L, 1700003600123456L)

  private def writeFixture(dir: String)(build: => org.apache.spark.sql.DataFrame): String = {
    build.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def tmp(): String =
    Files.createTempDirectory("tables-spec").toString

  test("load yields identical rows and ts dtype from NANOS-long, NTZ-micros, and LTZ-micros encodings") {
    import spark.implicits._
    // (a) raw long nanos under the `ts` name — what a TIMESTAMP(NANOS) file
    //     decodes to with spark.sql.legacy.parquet.nanosAsLong=true (Spark
    //     cannot author NANOS logical-typed parquet itself, so the long
    //     write IS the faithful reproduction of that read path).
    val nanosDir = writeFixture(tmp()) {
      micros.map(m => (m * 1000L, m.toString)).toDF("ts", "k")
    }
    // (b) TIMESTAMP(MICROS, isAdjustedToUTC=false) — TIMESTAMP_NTZ, the
    //     current driver encoding.
    val ntzDir = writeFixture(tmp()) {
      micros.map(m => (m, m.toString)).toDF("us", "k")
        .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"), col("k"))
    }
    // (c) TIMESTAMP(MICROS, isAdjustedToUTC=true) — session-TZ timestamp.
    val ltzDir = writeFixture(tmp()) {
      micros.map(m => (m, m.toString)).toDF("us", "k")
        .select(timestamp_micros(col("us")).as("ts"), col("k"))
    }

    val loaded = Seq("nanos" -> nanosDir, "ntz" -> ntzDir, "ltz" -> ltzDir).map {
      case (label, dir) => label -> Tables.load(spark, dir, "events")
    }
    for ((label, df) <- loaded) {
      withClue(s"$label: ") {
        assert(df.schema("ts").dataType === TimestampType)
        val got = df.select(unix_micros(col("ts")), col("k"))
          .as[(Long, String)].collect().sortBy(_._2).map(_._1).toSeq
        assert(got === micros)
      }
    }
  }

  test("loadStream normalizes ts the same way as load") {
    import spark.implicits._
    val dir = writeFixture(tmp()) {
      micros.map(m => (m, m.toString)).toDF("us", "k")
        .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"), col("k"))
    }
    val sdf = Tables.loadStream(spark, dir, "events")
    assert(sdf.isStreaming)
    assert(sdf.schema("ts").dataType === TimestampType)
  }

  test("the real events table loads with a TimestampType ts at sf0.001") {
    val df = Tables.load(spark, sf, "events")
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.count() > 0)
  }

  test("every known timestamp column normalizes; genuine longs stay long") {
    for ((t, c) <- Seq("orders" -> "o_orderdate", "lineitem" -> "l_shipdate",
        "events" -> "ts")) {
      withClue(s"$t.$c: ") {
        assert(Tables.load(spark, sf, t).schema(c).dataType === TimestampType)
      }
    }
    // a real long column in a table with a ts column is never touched
    assert(Tables.load(spark, sf, "orders").schema("o_orderkey").dataType
      === org.apache.spark.sql.types.LongType)
  }
}
