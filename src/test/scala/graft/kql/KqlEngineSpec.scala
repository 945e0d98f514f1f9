package graft.kql

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** End-to-end KQL engine tests over in-memory JSON logs — the analog of the
  * reference's workflow test corpus (`miso-workflow/src/tests.rs`): each case
  * is KQL text → parse → lower → execute → compare collected JSON.
  */
class KqlEngineSpec extends AnyFunSuite {
  import TestSpark.spark

  private def logs(json: String*): DataFrame = {
    import spark.implicits._
    spark.read.json(spark.createDataset(json))
  }

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("test.stack", logs(
      """{"user":"1","questionId":10,"type":"question","title":"How to sort","tags":["rust","sort"],"score":5}""",
      """{"user":"2","questionId":10,"answerId":100,"type":"answer","body":"Use sort_by please","score":3}""",
      """{"user":"3","questionId":11,"type":"question","title":"Spark joins","tags":["spark"],"score":8}""",
      """{"user":"1","questionId":11,"answerId":101,"type":"answer","body":"Broadcast it","score":2}""",
      """{"user":"2","questionId":12,"type":"question","title":"Null handling","tags":[],"score":null}"""
    ))
    c.register("test.nums", logs(
      """{"a":1,"b":2.5,"s":"x"}""",
      """{"a":2,"b":0.0,"s":""}""",
      """{"a":3,"b":-1.5,"s":"y"}""",
      """{"a":null,"b":4.0,"s":"z"}"""
    ))
    c.register("test.left", logs(
      """{"k":1,"v":"l1","shared":"L1"}""",
      """{"k":2,"v":"l2","shared":"L2"}""",
      """{"k":null,"v":"l3","shared":"L3"}"""
    ))
    c.register("test.right", logs(
      """{"k":1,"w":"r1","shared":"R1"}""",
      """{"k":3,"w":"r3","shared":"R3"}""",
      """{"k":null,"w":"r4","shared":"R4"}"""
    ))
    c
  }

  private def run(kql: String): DataFrame = Kql.run(spark, cat, kql)

  private def rows(kql: String): Seq[Map[String, Any]] = {
    val df = run(kql)
    df.collect().toSeq.map { r =>
      r.schema.fieldNames.zipWithIndex.flatMap { case (n, i) =>
        if (r.isNullAt(i)) None else Some(n -> r.get(i))
      }.toMap
    }
  }

  // ───────── filter ─────────

  test("filter eq") {
    assert(rows("test.stack | where type == 'question' | count")
      == Seq(Map("Count" -> 3L)))
  }

  test("filter numeric cmp and logical ops") {
    assert(rows("test.nums | where a >= 2 and b < 1 | project a").map(_("a")).toSet
      == Set(2L, 3L))
  }

  test("filter truthiness of non-boolean exprs") {
    // non-empty string is truthy; empty string falsy ('z' row has null a)
    val got = rows("test.nums | where s | project a")
    assert(got.length == 3)
    assert(got.flatMap(_.get("a")).toSet == Set(1L, 3L))
  }

  test("filter in / not in") {
    assert(rows("test.nums | where a in (1, 3) | count") == Seq(Map("Count" -> 2L)))
    // total-order semantics: the null-a row is NOT in (1,3), so !in keeps it
    assert(rows("test.nums | where a !in (1, 3) | count") == Seq(Map("Count" -> 2L)))
  }

  test("filter between") {
    assert(rows("test.nums | where a between (2 .. 3) | count") == Seq(Map("Count" -> 2L)))
    // total-order: null < 2 is true, so the null-a row is !between
    assert(rows("test.nums | where a !between (2 .. 3) | count") == Seq(Map("Count" -> 2L)))
  }

  test("filter null comparison drops row (missing semantics)") {
    // a is null in one row: null >= 1 is null ⇒ dropped, not kept
    assert(rows("test.nums | where a >= 1 | count") == Seq(Map("Count" -> 3L)))
  }

  test("string predicates: contains/startswith/endswith") {
    assert(rows("test.stack | where title contains 'sort' | count") == Seq(Map("Count" -> 1L)))
    assert(rows("test.stack | where title startswith 'How' | count") == Seq(Map("Count" -> 1L)))
    assert(rows("test.stack | where title endswith 'joins' | count") == Seq(Map("Count" -> 1L)))
  }

  test("has is word-bounded and case-insensitive; has_cs is case-sensitive") {
    assert(rows("test.stack | where body has 'SORT_BY' | count") == Seq(Map("Count" -> 1L)))
    // 'sort' is a word inside 'sort_by'? no — underscore is alnum-adjacent?
    // Reference treats [^a-zA-Z0-9] as boundary, so '_' IS a boundary char.
    assert(rows("test.stack | where body has 'sort' | count") == Seq(Map("Count" -> 1L)))
    assert(rows("test.stack | where body has_cs 'SORT_BY' | count") == Seq(Map("Count" -> 0L)))
  }

  test("division is always float and div-by-zero drops the row") {
    assert(rows("test.nums | where a / 2 == 0.5 | project a") == Seq(Map("a" -> 1L)))
    // b == 0.0 on row a=2 → a/b null → dropped
    assert(rows("test.nums | where a / b > 0 | project a").map(_("a")).toSet == Set(1L))
  }

  // ───────── project / extend / rename ─────────

  test("project with alias, auto-name, and Column1 fallback") {
    val df = run("test.nums | project a, doubled=a*2, a+1")
    assert(df.columns.toSeq == Seq("a", "doubled", "Column1"))
  }

  test("project duplicate names get suffixes") {
    val df = run("test.nums | project a, a, a")
    assert(df.columns.toSeq == Seq("a", "a1", "a2"))
  }

  test("extend keeps original fields") {
    val df = run("test.nums | extend c = a * 10")
    assert(df.columns.contains("a") && df.columns.contains("c"))
    assert(rows("test.nums | extend c = a * 10 | where c == 30 | project a")
      == Seq(Map("a" -> 3L)))
  }

  test("project-rename moves a field") {
    val df = run("test.nums | project-rename alpha = a")
    assert(df.columns.contains("alpha") && !df.columns.contains("a"))
  }

  test("case/iff conditional") {
    assert(rows("test.nums | extend sign = case(b > 0, 'pos', b < 0, 'neg', 'zero') | where a == 2 | project sign")
      == Seq(Map("sign" -> "zero")))
    assert(rows("test.nums | extend big = iff(a >= 2, true, false) | where big | count")
      == Seq(Map("Count" -> 2L)))
  }

  test("extract returns null on no-match (row filtered)") {
    assert(rows("""test.stack | extend id = extract("sort_(\\w+)", 1, body) | where exists(id) | project id""")
      == Seq(Map("id" -> "by")))
  }

  test("casts: toint tolong toreal tostring tobool; bad parse → null") {
    assert(rows("test.nums | extend i = toint('42') | where a == 1 | project i")
      == Seq(Map("i" -> 42L)))
    assert(rows("test.nums | extend i = toint('nope') | where exists(i) | count")
      == Seq(Map("Count" -> 0L)))
    assert(rows("test.nums | extend r = toreal('1.5') | where a == 1 | project r")
      == Seq(Map("r" -> 1.5)))
    assert(rows("test.nums | extend s2 = tostring(a) | where a == 1 | project s2")
      == Seq(Map("s2" -> "1")))
  }

  test("strcat concatenates") {
    assert(rows("test.nums | where a == 1 | project c = strcat(s, '-', a)")
      == Seq(Map("c" -> "x-1")))
  }

  // ───────── limit / sort / top ─────────

  test("sort defaults asc nulls last") {
    val got = run("test.nums | sort by a | project a").collect().map(r =>
      if (r.isNullAt(0)) null else r.getLong(0))
    assert(got.toSeq == Seq(1L, 2L, 3L, null))
  }

  test("sort desc nulls first, multikey") {
    val got = run("test.nums | sort by a desc nulls first, b asc | project a").collect().map(r =>
      if (r.isNullAt(0)) null else r.getLong(0))
    assert(got.toSeq == Seq(null, 3L, 2L, 1L))
  }

  test("top n by") {
    assert(rows("test.stack | top 2 by score desc | project score").map(_("score"))
      == Seq(8L, 5L))
  }

  test("limit/take") {
    assert(run("test.stack | sort by questionId | take 3").count() == 3L)
  }

  // ───────── summarize ─────────

  test("summarize all aggregation kinds") {
    val got = rows(
      "test.stack | summarize n=count(), dc=dcount(questionId), s=sum(score), a=avg(score), mn=min(score), mx=max(score)")
    assert(got == Seq(Map(
      "n" -> 5L, "dc" -> 3L, "s" -> 18.0, "a" -> 4.5, "mn" -> 2L, "mx" -> 8L)))
  }

  test("summarize countif") {
    assert(rows("test.stack | summarize qs=countif(type == 'question')")
      == Seq(Map("qs" -> 3L)))
  }

  test("summarize by key; null key drops row") {
    val got = rows("test.stack | summarize n=count() by type | sort by type")
    assert(got == Seq(Map("type" -> "answer", "n" -> 2L), Map("type" -> "question", "n" -> 3L)))
    // score is null on one row → that row drops from score-keyed groups
    val byScore = rows("test.stack | summarize n=count() by score")
    assert(byScore.map(_("n").asInstanceOf[Long]).sum == 4L)
  }

  test("summarize default agg names") {
    val df = run("test.stack | summarize count(), sum(score), dcount(user)")
    assert(df.columns.toSeq == Seq("count_", "sum_score", "dcount_user"))
  }

  // test_summarize_unnamed_aggregations_with_duplicates (parser_tests.rs:520)
  test("duplicate unnamed aggregations get numbered suffixes") {
    val df = run("test.stack | summarize count(), count(), sum(score)")
    assert(df.columns.toSeq == Seq("count_", "count_1", "sum_score"))
  }

  // test_summarize_unnamed_with_named_conflicts (parser_tests.rs:537): the
  // explicit alias claims count_ first; the unnamed counts number after it
  test("explicit alias conflicting with a default agg name") {
    val df = run("test.stack | summarize count_ = sum(score), count(), count()")
    assert(df.columns.toSeq == Seq("count_", "count_1", "count_2"))
  }

  // test_project_unnamed (parser_tests.rs:358): auto-names fill around
  // explicit ones, and a colliding explicit name seeds its own counter
  test("project auto-naming around an explicit Column2") {
    val df = run(
      "test.stack | project score + 1, score + 1, score, Column2 = 5, user")
    assert(df.columns.toSeq ==
      Seq("Column1", "Column2", "score", "Column21", "user"))
  }

  // keyword used as a field name (parser_tests.rs `where in == "value"`)
  test("reserved words resolve as field names in expressions") {
    val d = spark.read.json(spark.createDataset(Seq(
      """{"in": "value", "top": 1}""", """{"in": "other", "top": 2}"""))(
      org.apache.spark.sql.Encoders.STRING))
    val c = new Catalog(spark)
    c.register("test.kw", d)
    assert(Kql.run(spark, c, "test.kw | where in == 'value'").count() == 1)
  }

  // test datetime(null) → null literal (parser_tests.rs:945)
  test("datetime(null) is the null literal") {
    assert(run("test.stack | where score == datetime(null)").count() ==
      run("test.stack | where score == null").count())
  }

  test("summarize by bin of numeric") {
    val got = rows("test.stack | summarize n=count() by b=bin(score, 5) | sort by b")
    assert(got == Seq(Map("b" -> 0L, "n" -> 2L), Map("b" -> 5L, "n" -> 2L)))
  }

  test("distinct") {
    assert(run("test.stack | distinct type").count() == 2L)
    assert(run("test.stack | distinct user, type").count() == 5L)
  }

  // ───────── union / join ─────────

  test("union bag semantics with mismatched schemas") {
    assert(run("test.left | union (test.right)").count() == 6L)
    assert(run("test.left | union (test.right) | where exists(w) | count")
      .collect()(0).getLong(0) == 3L)
  }

  test("join inner: null keys dropped, collision suffixed, key deduped") {
    val df = run("test.left | join kind=inner (test.right) on k")
    assert(df.columns.toSeq.sorted == Seq("k", "shared", "shared1", "v", "w"))
    val got = rows("test.left | join kind=inner (test.right) on k")
    assert(got == Seq(Map("k" -> 1L, "v" -> "l1", "shared" -> "L1", "w" -> "r1", "shared1" -> "R1")))
  }

  test("join left: kept side wins collisions, unmatched right-side fields null") {
    val got = rows("test.left | join kind=left (test.right) on k | sort by k")
    assert(got.length == 2) // null-key left row dropped
    assert(got(0) == Map("k" -> 1L, "v" -> "l1", "shared" -> "L1", "w" -> "r1"))
    assert(got(1) == Map("k" -> 2L, "v" -> "l2", "shared" -> "L2")) // no w
  }

  test("join right keeps right rows") {
    val got = rows("test.left | join kind=right (test.right) on k | sort by k")
    assert(got.length == 2)
    assert(got(0) == Map("k" -> 1L, "w" -> "r1", "shared" -> "R1", "v" -> "l1"))
    assert(got(1) == Map("k" -> 3L, "w" -> "r3", "shared" -> "R3"))
  }

  test("join outer: unmatched both sides, null keys still dropped") {
    val got = rows("test.left | join kind=outer (test.right) on k | sort by k")
    assert(got.map(_("k")) == Seq(1L, 2L, 3L))
  }

  test("join with explicit $left/$right keys") {
    val got = rows(
      "test.left | join kind=inner (test.right | project-rename rk = k) on $left.k == $right.rk")
    assert(got.length == 1 && got.head("k") == 1L && got.head("rk") == 1L)
  }

  // ───────── mv-expand ─────────

  test("mv-expand unrolls arrays; empty arrays drop the row") {
    val got = rows("test.stack | where type == 'question' | mv-expand tags | project questionId, tags")
    assert(got == Seq(
      Map("questionId" -> 10L, "tags" -> "rust"),
      Map("questionId" -> 10L, "tags" -> "sort"),
      Map("questionId" -> 11L, "tags" -> "spark")))
  }

  test("mv-expand multi-field zip pads with null") {
    val c2 = new Catalog(spark)
    c2.register("test.zip", logs("""{"x":[1,2,3],"y":["a"]}"""))
    val got = Kql.run(spark, c2, "test.zip | mv-expand x, y | project x, y")
      .collect().map(r => (r.get(0), r.get(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, null), (3L, null)))
  }

  // ───────── let / views / timespans ─────────

  test("let binding splices a subquery") {
    assert(rows(
      "let qs = (test.stack | where type == 'question'); qs | count")
      == Seq(Map("Count" -> 3L)))
  }

  test("let chained variables and let inside union") {
    // tests.rs: let_chained_variables / let_variable_in_union
    assert(rows(
      """let qs = (test.stack | where type == 'question');
        |let hi = (qs | where score >= 8);
        |hi | count""".stripMargin) == Seq(Map("Count" -> 1L)))
    assert(rows(
      """let qs = (test.stack | where type == 'question');
        |qs | union (qs) | count""".stripMargin) == Seq(Map("Count" -> 6L)))
  }

  test("nested case expressions") {
    // tests.rs: case_nested
    val got = rows(
      """test.nums | extend c = case(a >= 2, case(a >= 3, 'big', 'mid'), 'small')
        | | where exists(a) | project a, c | sort by a""".stripMargin)
    assert(got.map(m => (m("a"), m("c"))) ==
      Seq((1L, "small"), (2L, "mid"), (3L, "big")))
  }

  test("explain golden: rendered steps are stable") {
    val parsed = Kql.parse(
      "test.stack | where score > 2 and type == 'question' | summarize n=count() by user | top 3 by n desc")
    assert(Kql.renderSteps(parsed) ==
      """scan test.stack
        |where (score > 2) and (type == 'question')
        |summarize n = count() by user = user
        |top 3 by n desc""".stripMargin)
  }

  test("views registered on the catalog resolve like sources") {
    cat.registerView("questions", "test.stack | where type == 'question'")
    assert(rows("views.questions | count") == Seq(Map("Count" -> 3L)))
    assert(rows("questions | summarize n=count() by user | sort by user").length == 3)
  }

  test("timespan arithmetic with datetime columns") {
    val c2 = new Catalog(spark)
    c2.register("test.times", logs(
      """{"t":"2024-01-01T00:00:00Z","v":1}""",
      """{"t":"2024-01-01T05:00:00Z","v":2}"""
    ).withColumn("t", org.apache.spark.sql.functions.col("t").cast("timestamp")))
    assert(Kql.run(spark, c2,
      "test.times | where t >= datetime('2024-01-01T00:00:00Z') + 1h | project v")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(Kql.run(spark, c2,
      "test.times | summarize n=count() by b=bin(t, 1d)").count() == 1L)
  }

  test("now() is bound at parse time") {
    val r1 = Kql.parse("test.nums | where a > now() - 1d", 1700000000000000L)
    val r2 = Kql.parse("test.nums | where a > now() - 1d", 1700000000000000L)
    assert(r1 == r2)
  }

  test("explain renders steps and spark plan") {
    val s = Kql.explain(spark, cat, "test.stack | where type == 'question' | summarize n=count() by user")
    assert(s.contains("scan test.stack"))
    assert(s.contains("spark optimized plan"))
  }

  // ───────── empty-data + per-type sorts (tests.rs:1067, :932) ─────────

  test("summarize without by on empty data: one row, sum/avg 0.0, min/max null") {
    val c2 = new Catalog(spark)
    c2.register("empty", logs("""{"x": 1}""").filter("x > 99"))
    val got = Kql.run(spark, c2,
      "empty | summarize max_x=max(x), min_x=min(x), sum_x=sum(x), avg_x=avg(x), cnt=count()")
      .collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.isNullAt(r.fieldIndex("max_x")) && r.isNullAt(r.fieldIndex("min_x")))
    assert(r.getDouble(r.fieldIndex("sum_x")) == 0.0)
    assert(r.getDouble(r.fieldIndex("avg_x")) == 0.0)
    assert(r.getLong(r.fieldIndex("cnt")) == 0L)
  }

  test("sort by each value type") {
    val c2 = new Catalog(spark)
    c2.register("typed", logs(
      """{"i": 3, "f": 1.5, "s": "b", "b": true,  "t": "2024-01-02T00:00:00Z"}""",
      """{"i": 1, "f": -2.5, "s": "a", "b": false, "t": "2024-01-01T00:00:00Z"}""",
      """{"i": 2, "f": 0.5, "s": "c", "b": true,  "t": "2024-01-03T00:00:00Z"}"""
    ).withColumn("t", org.apache.spark.sql.functions.col("t").cast("timestamp")))
    def firstOf(key: String): Any =
      Kql.run(spark, c2, s"typed | sort by $key | project $key").collect()(0).get(0)
    assert(firstOf("i") == 1L)
    assert(firstOf("f") == -2.5)
    assert(firstOf("s") == "a")
    assert(firstOf("b") == false)
    assert(firstOf("t").toString.startsWith("2024-01-01"))
  }

  // ───────── error handling ─────────

  test("parse errors carry position") {
    val e = intercept[KqlParseException](Kql.parse("test.stack | nonsense 42"))
    assert(e.getMessage.contains("unknown step"))
  }

  test("unknown source errors") {
    val e = intercept[KqlParseException](run("test.missing | count").collect())
    assert(e.getMessage.contains("unknown source"))
  }
}
