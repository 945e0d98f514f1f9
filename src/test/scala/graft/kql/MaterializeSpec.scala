package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** `let x = materialize(query);` — Kusto's materialize: the subquery
  * compiles once and persists (MEMORY_AND_DISK, lazy), so every reference
  * reads the same InMemoryRelation instead of recomputing the subtree.
  */
class MaterializeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("t", Seq(
      ("a", 1L), ("a", 2L), ("b", 3L), ("c", 4L), ("c", 5L)
    ).toDF("k", "v"))
    c
  }

  private def run(kql: String) = Kql.run(spark, cat, kql)

  test("materialized let: same results as the plain let") {
    val q = """%s
              |agg | union (agg) | summarize s = sum(n) by k | sort by k asc"""
      .stripMargin
    val plain = run(q.format("let agg = (t | summarize n = count() by k);"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val mat = run(q.format("let agg = materialize(t | summarize n = count() by k);"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(mat == plain)
    assert(mat == Seq(("a", 4.0), ("b", 2.0), ("c", 4.0)))
  }

  // NOTE: each test uses a DISTINCT let body — Spark's cache manager
  // substitutes a cached plan into ANY later query with a matching
  // subtree, so a leftover cache from one test would leak into the next.

  test("two references share one InMemoryRelation; plain lets do not") {
    val q = """%s
              |agg | union (agg) | summarize s = sum(n) by k"""
      .stripMargin
    val parsed = Kql.parse(
      q.format("let agg = materialize(t | where v > 1 | summarize n = count() by k);"))
    val compiler = new Compiler(spark, cat, parsed.lets,
      materializedLets = parsed.materialized)
    val matPlan = compiler.compile(parsed.query)
      .queryExecution.optimizedPlan.toString
    compiler.releaseMaterialized()
    assert(matPlan.contains("InMemoryRelation"), matPlan)
    val plain = run(q.format("let agg = (t | where v > 1 | summarize n = count() by k);"))
    val plainPlan = plain.queryExecution.optimizedPlan.toString
    assert(!plainPlan.contains("InMemoryRelation"), plainPlan)
  }

  test("releaseMaterialized unpersists the cache blocks") {
    val parsed = Kql.parse(
      """let agg = materialize(t | where v > 0 | summarize n = count() by k);
        |agg | union (agg) | count""".stripMargin)
    val compiler = new Compiler(spark, cat, parsed.lets,
      materializedLets = parsed.materialized)
    val df = compiler.compile(parsed.query)
    assert(df.collect().head.getLong(0) == 6L) // 3 groups × 2
    compiler.releaseMaterialized()
    // after release, a recompile of the same query plans WITHOUT the cache
    val fresh = new Compiler(spark, cat, parsed.lets) // no materialization
      .compile(parsed.query)
    assert(!fresh.queryExecution.optimizedPlan.toString
      .contains("InMemoryRelation"))
  }

  test("explain renders the materialize marker") {
    val txt = Kql.renderSteps(Kql.parse(
      "let m = materialize(t | count); m"))
    assert(txt.contains("let m = materialize("))
    val plainTxt = Kql.renderSteps(Kql.parse("let m = (t | count); m"))
    assert(!plainTxt.contains("materialize"))
  }
}
