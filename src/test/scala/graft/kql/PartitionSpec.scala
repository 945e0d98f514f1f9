package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** `partition by Col ( … )` — Kusto's partition operator, lowered to
  * key-partitioned windows/aggregates over a single hash shuffle instead
  * of per-key subtable loops. The serialized window scalars
  * (`row_number`/`prev`/`next`/`row_cumsum`) distribute per key here,
  * where outside a partition they require one global order.
  */
class PartitionSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("t", Seq(
      ("a", 3L, 30L), ("a", 1L, 10L), ("a", 2L, 20L),
      ("b", 2L, 5L), ("b", 1L, 7L),
      ("c", 1L, 100L)
    ).toDF("k", "seq", "v"))
    c.register("dim", Seq(("a", "alpha")).toDF("k", "name"))
    c
  }

  private def run(kql: String) = Kql.run(spark, cat, kql)

  // ───────── windows per key ─────────

  test("row_number restarts per key") {
    val df = run(
      """t | partition by k (sort by seq asc | extend rk = row_number())
        | | sort by k asc, seq asc | project k, seq, rk""".stripMargin)
    assert(df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L),
        ("b", 1L, 1L), ("b", 2L, 2L), ("c", 1L, 1L)))
  }

  test("prev/next/row_cumsum are per-key frames") {
    val df = run(
      """t | partition by k (sort by seq asc
        |     | extend p = prev(v, 1, -1), cs = row_cumsum(v))
        | | sort by k asc, seq asc | project k, p, cs""".stripMargin)
    assert(df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("a", -1L, 10L), ("a", 10L, 30L), ("a", 20L, 60L),
        ("b", -1L, 7L), ("b", 7L, 12L), ("c", -1L, 100L)))
  }

  // ───────── take / top per key ─────────

  test("take after sort keeps the first N rows of each key") {
    val df = run(
      """t | partition by k (sort by v desc | take 1)
        | | sort by k asc | project k, v""".stripMargin)
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 30L), ("b", 7L), ("c", 100L)))
  }

  test("top N by is per-key top-N") {
    val df = run(
      """t | partition by k (top 2 by v asc)
        | | sort by k asc, v asc | project k, v""".stripMargin)
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 10L), ("a", 20L), ("b", 5L), ("b", 7L), ("c", 100L)))
  }

  test("take without a preceding sort is rejected (determinism contract)") {
    val e = intercept[KqlParseException](run("t | partition by k (take 1)"))
    assert(e.getMessage.contains("sort"))
  }

  // ───────── aggregates per key ─────────

  test("summarize gains the key as implicit group key") {
    val df = run(
      """t | partition by k (summarize s = sum(v)) | sort by k asc""".stripMargin)
    assert(df.columns.toSeq == Seq("k", "s"))
    assert(df.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("a", 60.0), ("b", 12.0), ("c", 100.0)))
  }

  test("summarize with the key already a group key does not duplicate it") {
    val df = run(
      """t | partition by k (summarize n = count() by k) | sort by k asc""".stripMargin)
    assert(df.columns.toSeq == Seq("n", "k") || df.columns.toSeq == Seq("k", "n"))
    assert(df.count() == 3)
  }

  test("count is per-key Count") {
    val df = run("t | partition by k (count) | sort by k asc")
    assert(df.columns.toSeq == Seq("k", "Count"))
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 3L), ("b", 2L), ("c", 1L)))
  }

  test("distinct keeps the key in the tuple") {
    val df = run(
      """t | partition by k (extend h = v > 15 | distinct h)
        | | sort by k asc, h asc""".stripMargin)
    assert(df.columns.toSeq == Seq("k", "h"))
    assert(df.collect().map(r => (r.getString(0), r.getBoolean(1))).toSeq ==
      Seq(("a", false), ("a", true), ("b", false), ("c", true)))
  }

  // ───────── composition and guards ─────────

  test("row-wise steps compose inside the partition") {
    val df = run(
      """t | partition by k (where v >= 10 | sort by v asc
        |     | extend rk = row_number() | take 1 | extend kv = strcat(k, ':'))
        | | sort by k asc | project k, v, rk, kv""".stripMargin)
    // b's rows (5, 7) are all filtered out; a keeps v=10, c keeps v=100
    assert(df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq ==
      Seq(("a", 10L, 1L, "a:"), ("c", 100L, 1L, "c:")))
  }

  test("hint.strategy is accepted and ignored") {
    val df = run(
      """t | partition hint.strategy=shuffle by k (sort by seq asc | take 1)
        | | sort by k asc | project k, seq""".stripMargin)
    assert(df.count() == 3)
  }

  test("join/union/sinks inside partition are rejected") {
    val e = intercept[KqlParseException](run(
      "t | partition by k (join kind=inner (dim) on k)"))
    assert(e.getMessage.contains("partition"))
    val e2 = intercept[KqlParseException](run(
      "t | partition by k (union (dim))"))
    assert(e2.getMessage.contains("partition"))
  }

  test("an invoke cannot smuggle a join into the partition") {
    val e = intercept[KqlParseException](run(
      """let f = (T: table) { T | join kind=inner (dim) on k };
        |t | partition by k (invoke f())""".stripMargin))
    assert(e.getMessage.contains("partition"))
    // row-wise invoke bodies are fine
    val df = run(
      """let f = (T: table) { T | where v >= 10 };
        |t | partition by k (invoke f() | count) | sort by k asc""".stripMargin)
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 3L), ("c", 1L)))
  }

  test("a summarize alias shadowing the partition key errors loudly") {
    val e = intercept[KqlParseException](run(
      "t | partition by k (summarize n = count() by k = seq)"))
    assert(e.getMessage.contains("partition key"))
    // the bare key as an explicit group expression stays legal
    assert(run("t | partition by k (summarize n = count() by k)").count() == 3)
  }

  test("unknown partition column fails at compile") {
    val e = intercept[KqlParseException](run("t | partition by nope (count)"))
    assert(e.getMessage.contains("not found"))
  }

  test("serial order does not leak across the partition boundary") {
    // row_number after the partition still demands its own sort
    val e = intercept[KqlParseException](run(
      """t | partition by k (sort by seq asc | take 1)
        | | extend rk = row_number()""".stripMargin))
    assert(e.getMessage.contains("serialized"))
  }

  // ───────── plan shape and explain ─────────

  test("plan has no single-partition exchange (distributed per-key windows)") {
    val df = run(
      """t | partition by k (sort by seq asc | extend rk = row_number() | take 2)""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"partition by must not serialize to one partition:\n$plan")
    assert(plan.contains("hashpartitioning"), plan)
  }

  test("explain renders the partition step (and the other round-5 steps)") {
    val txt = Kql.renderSteps(Parser.parse(
      """t | partition by k (sort by seq asc | take 1)
        | | top-hitters 3 of k | sample-distinct 2 of k""".stripMargin))
    assert(txt.contains("partition by k ("))
    assert(txt.contains("top-hitters 3 of k"))
    assert(txt.contains("sample-distinct 2 of k"))
    val txt2 = Kql.renderSteps(Parser.parse(
      "print x = 1 | evaluate bag_unpack(b, 'p_')".replace("evaluate", "evaluate")))
    assert(txt2.contains("print x = 1"))
    assert(txt2.contains("bag_unpack(b, \"p_\")") || txt2.contains("bag_unpack(b, 'p_')"))
  }
}
