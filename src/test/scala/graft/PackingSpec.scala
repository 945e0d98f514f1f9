package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Packing

/** The distributed two-phase prefix sum pinned against the naive
  * single-task global window, plus packing boundary semantics.
  */
class PackingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("global offset equals the single-window prefix sum, any partitioning") {
    val df = (1 to 257).map(i => (i.toLong, (i % 7 + 1).toLong))
      .toDF("id", "n")
      .repartition(13) // scramble: offsets must not depend on layout
    val got = Packing.withGlobalOffset(df, "id", "n", "off")
      .select("id", "off").as[(Long, Long)].collect().toMap
    val w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    val want = df.withColumn("off", coalesce(sum("n").over(w), lit(0L)))
      .select("id", "off").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("offsets are exclusive: first row 0, next rows cumulative") {
    val df = Seq((1L, 5L), (2L, 3L), (3L, 10L)).toDF("id", "n")
    val got = Packing.withGlobalOffset(df, "id", "n", "off")
      .orderBy("id").select("off").as[Long].collect().toSeq
    assert(got == Seq(0L, 5L, 8L))
  }

  test("packing splits a boundary-straddling doc across sequences") {
    // budget 10: doc 2 occupies offsets 8..13 → sequences 0 and 1
    val df = Seq((1L, 8L), (2L, 6L), (3L, 2L)).toDF("id", "n")
    val got = Packing.packSequences(df, "id", "n", budget = 10L)
      .orderBy("id")
      .select("id", "tok_offset", "seq_first", "seq_last")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 0L, 0L), (2L, 8L, 0L, 1L), (3L, 14L, 1L, 1L)))
  }

  test("orderCol ties break by size: output multiset is deterministic") {
    val df = Seq((1L, 5L), (2L, 9L), (2L, 3L), (3L, 2L)).toDF("id", "n")
    val got = Packing.withGlobalOffset(df.repartition(5), "id", "n", "off")
      .orderBy("id", "n").select("id", "n", "off")
      .as[(Long, Long, Long)].collect().toSeq
    // within id=2, the smaller size sorts first: offsets 5 then 8
    assert(got == Seq((1L, 5L, 0L), (2L, 3L, 5L), (2L, 9L, 8L), (3L, 2L, 17L)))
  }

  test("zero-length docs keep a valid one-point sequence range") {
    val df = Seq((1L, 4L), (2L, 0L), (3L, 4L)).toDF("id", "n")
    val got = Packing.packSequences(df, "id", "n", budget = 4L)
      .orderBy("id")
      .select("id", "seq_first", "seq_last").as[(Long, Long, Long)]
      .collect().toSeq
    // doc 2 has no tokens: first == last == the sequence at its offset
    assert(got == Seq((1L, 0L, 0L), (2L, 1L, 1L), (3L, 1L, 1L)))
  }
}
