package graft.kql

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Ports of the reference workflow suite's edge-case tests
  * (`miso-workflow/src/tests.rs`): null logic in and/or, empty-string RHS,
  * dcount with nulls, nested/missing mv-expand, join degenerate shapes,
  * summarize-by literal/duplicate/cast keys, limit 0, short-circuit filters.
  */
class EdgeCaseSpec extends AnyFunSuite {
  import TestSpark.spark

  private def logs(json: String*): DataFrame = {
    import spark.implicits._
    spark.read.json(spark.createDataset(json))
  }

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("test.c", logs(
      """{"x": 1, "s": "ab"}""", """{"x": 1, "s": "cd"}""",
      """{"x": null, "s": "ef"}""", """{"x": null, "s": "gh"}""",
      """{"x": 2, "s": "ij"}"""))
    c.register("test.nested", logs(
      """{"id": 1, "m": {"arr": [10, 20]}, "plain": 5}""",
      """{"id": 2, "m": {"arr": []}, "plain": 6}"""))
    c.register("test.jl", logs("""{"id": 1, "v": "l1"}""", """{"id": 2, "v": "l2"}"""))
    c.register("test.jr_empty", logs("""{"id": 99, "w": "r"}""").filter("id < 0"))
    c
  }

  private def run(kql: String): DataFrame = Kql.run(spark, cat, kql)
  private def count(kql: String): Long = run(kql).count()

  // round-8 ADX scoping sugar: table('T') / database('D').T /
  // cluster('C').database('D').T — cluster scope discarded, database
  // scope maps to the dotted conn.collection form
  test("table()/database()/cluster() scoping sugar resolves sources") {
    val c2 = new Catalog(spark)
    import spark.implicits._
    c2.register("plaintab", Seq(1L, 2L).toDF("x"))
    c2.register("db1.t", Seq(1L, 2L, 3L).toDF("x"))
    assert(Kql.run(spark, c2, "table('plaintab') | count")
      .collect()(0).getLong(0) == 2L)
    assert(Kql.run(spark, c2, "database('db1').t | count")
      .collect()(0).getLong(0) == 3L)
    assert(Kql.run(spark, c2, "database('db1').table('t') | count")
      .collect()(0).getLong(0) == 3L)
    assert(Kql.run(spark, c2,
      "cluster('ignored').database('db1').t | count")
      .collect()(0).getLong(0) == 3L)
    // the sugar works in subquery position too
    assert(Kql.run(spark, c2,
      "plaintab | join kind=inner (table('plaintab')) on x | count")
      .collect()(0).getLong(0) == 2L)
  }

  // round-8: union kind=inner keeps only columns common to ALL sides
  test("union kind=inner intersects columns; outer null-fills") {
    val c2 = new Catalog(spark)
    import spark.implicits._
    c2.register("u1", Seq((1L, "a")).toDF("x", "s"))
    c2.register("u2", Seq((2L, 3.5)).toDF("x", "d"))
    c2.register("u3", Seq((3L, true)).toDF("x", "b"))
    val innerDf = Kql.run(spark, c2,
      "union kind=inner u1, u2, u3 | sort by x asc")
    assert(innerDf.columns.toSeq == Seq("x"))
    assert(innerDf.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val outer = Kql.run(spark, c2, "union u1, u2 | sort by x asc")
    assert(outer.columns.toSet == Set("x", "s", "d"))
    // withsource still rides along under inner
    val ws = Kql.run(spark, c2,
      "union kind=inner withsource=src u1, u2 | sort by x asc")
    assert(ws.columns.toSet == Set("x", "src"))
    assert(ws.collect().map(_.getString(1)).toSeq == Seq("u1", "u2"))
  }

  // round-8: kind=innerunique dedups the LEFT side on the key before the
  // inner join — each left key contributes one row's matches (ADX's
  // default kind; our deterministic pick = min over left columns)
  test("join kind=innerunique keeps one left row per key") {
    val c2 = new Catalog(spark)
    c2.register("iu.l", logs(
      """{"id": 1, "v": "a"}""", """{"id": 1, "v": "b"}""",
      """{"id": 2, "v": "c"}"""))
    c2.register("iu.r", logs(
      """{"id": 1, "w": "x"}""", """{"id": 1, "w": "y"}""",
      """{"id": 2, "w": "z"}"""))
    val r = Kql.run(spark, c2,
      """iu.l | join kind=innerunique (iu.r) on id
        | | sort by id asc, w asc""".stripMargin).collect()
    // left id=1 dedups to the min row (1,"a"); it matches BOTH right
    // rows; plain inner would give 5 rows, innerunique gives 3
    assert(r.map(x => (x.getLong(x.fieldIndex("id")),
      x.getString(x.fieldIndex("v")), x.getString(x.fieldIndex("w"))))
      .toSeq == Seq((1L, "a", "x"), (1L, "a", "y"), (2L, "c", "z")))
    val inner = Kql.run(spark, c2,
      "iu.l | join kind=inner (iu.r) on id").count()
    assert(inner == 5L) // bare inner unchanged (reference parity)
  }

  // null_in_and_operator / null_in_or_operator (tests.rs)
  test("null logic in and/or follows drop-row semantics") {
    // null > 0 AND true → null → dropped; only x=1,1,2 rows pass
    assert(count("test.c | where x > 0 and s contains '' ") == 3)
    // null > 0 OR s=='ef' → the null-x row with s=ef survives via OR
    assert(count("test.c | where x > 0 or s == 'ef'") == 4)
  }

  // contains/startswith/endswith with empty RHS → true (interpreter:44-49)
  test("string predicates with empty RHS match everything") {
    assert(count("test.c | where s contains ''") == 5)
    assert(count("test.c | where s startswith ''") == 5)
    assert(count("test.c | where s endswith ''") == 5)
  }

  // dcount_with_nulls (tests.rs:2051): {1,1,null,null,2} → 3
  test("dcount counts null as a distinct value") {
    val got = run("test.c | summarize dcount_x=dcount(x)").collect()(0).getLong(0)
    assert(got == 3L)
  }

  test("dcount without nulls is plain distinct count") {
    val got = run("test.c | where exists(x) | summarize d=dcount(x)").collect()(0).getLong(0)
    assert(got == 2L)
  }

  // expand_deeply_nested_path / expand_non_existent_field
  test("mv-expand on a nested path expands in place; empty array drops row") {
    val got = run("test.nested | mv-expand m.arr | project id, v = m.arr | sort by id, v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 10L), (1L, 20L)))
  }

  test("mv-expand of a non-existent or scalar field leaves rows untouched") {
    assert(count("test.nested | mv-expand nope") == 2)
    assert(count("test.nested | mv-expand plain") == 2)
  }

  test("mv-expand: null array passes through, empty array drops (expand.rs)") {
    val c2 = new Catalog(spark)
    c2.register("arrs", logs(
      """{"id": 1, "a": [7, 8]}""",
      """{"id": 2, "a": null}""",
      """{"id": 3, "a": []}"""))
    val got = Kql.run(spark, c2, "arrs | mv-expand a | project id, a | sort by id, a")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1))).toSeq
    assert(got == Seq((1L, 7L), (1L, 8L), (2L, null)))
  }

  test("field references resolve case-insensitively with correct type semantics") {
    val c2 = new Catalog(spark)
    c2.register("ci", logs("""{"val": 0}""", """{"val": 2}"""))
    // truthiness of a numeric column must treat 0 as falsy even when the
    // reference uses different casing
    assert(Kql.run(spark, c2, "ci | where Val | count").collect()(0).getLong(0) == 1L)
    assert(Kql.run(spark, c2, "ci | where val | count").collect()(0).getLong(0) == 1L)
  }

  // join_empty_right_side / join_no_key_matches
  test("joins against an empty or non-matching right side") {
    assert(count("test.jl | join kind=inner (test.jr_empty) on id") == 0)
    assert(count("test.jl | join kind=left (test.jr_empty) on id") == 2)
    assert(count("test.jl | join kind=inner (test.jl | project-rename id2 = id) on $left.id == $right.id2 | where id != id2") == 0)
  }

  // summarize_by_literal / summarize_by_duplicate_field / summarize_by_cast
  test("summarize by literal, duplicate, and cast keys") {
    val lit = run("test.c | summarize n=count() by k=5").collect()
    assert(lit.length == 1 && lit(0).getLong(1) == 5L)
    val dup = run("test.c | where exists(x) | summarize n=count() by x, x")
    assert(dup.columns.toSeq == Seq("x", "x1", "n"))
    val cst = run("test.c | where exists(x) | summarize n=count() by k=tostring(x) | sort by k")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(cst == Seq(("1", 2L), ("2", 1L)))
  }

  // limit_zero / short_circuit_where_false
  test("limit 0 and provably-false filters yield empty results") {
    assert(count("test.c | take 0") == 0)
    assert(count("test.c | where false | summarize n=count() by x") == 0)
  }

  // sort_by_all_null_field keeps all rows
  test("sort by an all-null field keeps every row") {
    assert(count("test.c | where not(exists(x)) | sort by x | project s") == 2)
  }

  // case_no_conditions_match → default
  test("case falls through to default") {
    val got = run("test.c | where x == 2 | project r = case(x == 99, 'a', 'dflt')")
      .collect()(0).getString(0)
    assert(got == "dflt")
  }
}
