package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** `find in (…) where …` cross-table search and the `as` pipeline-naming
  * operator.
  */
class FindAsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("web", Seq(
      (1L, "alice", 200L), (2L, "bob", 404L), (3L, "carol", 500L)
    ).toDF("id", "user", "status"))
    c.register("app", Seq(
      (10L, "bob", "crash"), (11L, "dave", "ok")
    ).toDF("id", "user", "msg"))
    c
  }

  private def run(kql: String) = Kql.run(spark, cat, kql)

  test("find unions by name, null-fills missing columns, tags source_") {
    val df = run(
      """find in (web, app) where user == 'bob' or status == 500
        | | sort by source_ asc, user asc""".stripMargin)
    // output = source_ + the predicate's columns in first-reference order
    // (id is not referenced, so it's not in the output)
    assert(df.columns.toSeq == Seq("source_", "user", "status"))
    val got = df.select("source_", "user").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("app", "bob"), ("web", "bob"), ("web", "carol")))
    // status is null for app rows (column absent there)
    assert(df.filter($"source_" === "app").collect().forall(_.isNullAt(2)))
  }

  test("find with project controls the output shape") {
    val df = run(
      """find in (web, app) where user startswith 'b' project u = toupper(user), id
        | | sort by source_ asc""".stripMargin)
    assert(df.columns.toSeq == Seq("source_", "u", "id"))
    assert(df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq(("app", "BOB", 10L), ("web", "BOB", 2L)))
  }

  test("find rejects a column no table has") {
    val e = intercept[KqlParseException](run(
      "find in (web, app) where nosuch > 1"))
    assert(e.getMessage.contains("nosuch"))
  }

  test("a table actually named find still scans") {
    val c2 = new Catalog(spark)
    c2.register("find", Seq(Tuple1(7L)).toDF("x"))
    assert(Kql.run(spark, c2, "find | project x").collect()(0).getLong(0) == 7L)
  }

  test("as names the prefix for a later join in the same query") {
    val df = run(
      """web | where status < 500 | as good
        | | join kind=inner (good) on $left.user == $right.user
        | | summarize n = count()""".stripMargin)
    // good has 2 rows (alice, bob); self-join on user → 2 matches
    assert(df.collect()(0).getLong(0) == 2L)
  }

  test("as with hint.materialized parses; union sees the binding") {
    val df = run(
      """web | where status == 404 | as hint.materialized=true err404
        | | union (err404)
        | | summarize n = count()""".stripMargin)
    assert(df.collect()(0).getLong(0) == 2L) // the row + its union copy
  }
}
