package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Round-6 step batch: `sample` (reproducible), `project-reorder`
  * (wildcards + ordering), `parse-kv` (typed keys, quotes, first-wins),
  * and `reduce by` (deterministic digit-run patterns).
  */
class StepBatch6Spec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("t", Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0), (5L, "e", 50.0), (6L, "f", 60.0)
    ).toDF("id", "name", "val"))
    c.register("kv", Seq(
      (1L, "user=alice; size=42; ok=true; score=1.5"),
      (2L, "size=7; user=\"bob x\"; user=dup"),
      (3L, "nothing relevant"),
      (4L, "user=; size=abc")
    ).toDF("id", "s"))
    c.register("logs", Seq(
      "error 404 on node17", "error 500 on node3", "error 404 on node2",
      "disk 99 full", "disk 12 full"
    ).toDF("msg"))
    c
  }

  private def run(kql: String) = Kql.run(spark, cat, kql)

  // ── sample ──

  test("sample returns exactly n rows, reproducibly") {
    val a = run("t | sample 3 | sort by id asc").collect().map(_.getLong(0))
    val b = run("t | sample 3 | sort by id asc").collect().map(_.getLong(0))
    assert(a.length == 3)
    assert(a.sameElements(b)) // deterministic pick
    // a sample of more rows than exist is the whole table
    assert(run("t | sample 100").count() == 6)
  }

  test("sample is a subset of the input") {
    val ids = run("t | sample 4").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(Set(1L, 2L, 3L, 4L, 5L, 6L)) && ids.size == 4)
  }

  // ── project-reorder ──

  test("project-reorder moves named columns to the front") {
    assert(run("t | project-reorder val, name").columns.toSeq ==
      Seq("val", "name", "id"))
  }

  test("project-reorder wildcard expands in schema order by default") {
    assert(run("t | project-reorder n*, *").columns.toSeq ==
      Seq("name", "id", "val"))
  }

  test("project-reorder wildcard with desc sorts matched names") {
    assert(run("t | project-reorder * desc").columns.toSeq ==
      Seq("val", "name", "id"))
    assert(run("t | project-reorder * asc").columns.toSeq ==
      Seq("id", "name", "val"))
  }

  test("project-reorder unknown explicit column is an error") {
    assertThrows[KqlParseException] {
      run("t | project-reorder nope")
    }
  }

  test("project-reorder keeps rows and order intact") {
    val r = run("t | sort by id desc | project-reorder val | limit 2")
      .collect()
    assert(r.map(_.getDouble(0)).toSeq == Seq(60.0, 50.0))
  }

  // ── parse-kv ──

  test("parse-kv extracts typed keys; missing keys are null") {
    val r = run(
      """kv | parse-kv s as (user: string, size: long, ok: bool, score: real)
        |   with (pair_delimiter=';', kv_delimiter='=')
        | | sort by id asc""".stripMargin).collect()
    assert(r(0).getString(2) == "alice")
    assert(r(0).getLong(3) == 42L)
    assert(r(0).getBoolean(4))
    assert(r(0).getDouble(5) == 1.5)
    assert(r(2).isNullAt(2) && r(2).isNullAt(3)) // no keys at all
  }

  test("parse-kv: first occurrence wins, quotes strip") {
    val r = run(
      """kv | where id == 2
        | | parse-kv s as (user: string, size: long)
        |   with (pair_delimiter=';', kv_delimiter='=', quote='"')""".stripMargin)
      .collect().head
    assert(r.getString(2) == "bob x") // quoted value, first of the dups
    assert(r.getLong(3) == 7L)
  }

  test("parse-kv: empty value stays empty string; bad typed parse is null") {
    val r = run(
      """kv | where id == 4
        | | parse-kv s as (user: string, size: long)
        |   with (pair_delimiter=';', kv_delimiter='=')""".stripMargin)
      .collect().head
    assert(r.getString(2) == "")
    assert(r.isNullAt(3)) // "abc" is not a long
  }

  // ── reduce by ──

  test("reduce by clusters digit runs into patterns") {
    val r = run("logs | reduce by msg | sort by Pattern asc").collect()
    assert(r.map(x => (x.getString(0), x.getLong(1))).toSeq == Seq(
      ("disk * full", 2L),
      ("error * on node*", 3L)))
    // representative is the lexicographic min of the cluster
    assert(r(1).getString(2) == "error 404 on node17")
  }

  test("reduce by tolerates a with() options clause") {
    assert(run("logs | reduce by msg with (threshold=0.5)").count() == 2)
  }

  // ── facet ──

  test("facet by stacks per-column distributions") {
    val r = run(
      """kv | extend parity = iff(id % 2 == 0, 'even', 'odd')
        | | facet by parity
        | | sort by value asc""".stripMargin).collect()
    assert(r.map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSeq
      == Seq(("parity", "even", 2L), ("parity", "odd", 2L)))
  }

  test("facet by several columns unions the distributions") {
    val df = run("t | facet by name, id")
    assert(df.count() == 12) // 6 names + 6 ids
    assert(df.columns.toSeq == Seq("facet_column", "value", "count_"))
  }

  test("facet with-subquery is rejected with guidance") {
    val e = intercept[KqlParseException] {
      run("t | facet by name with (t | count)")
    }
    assert(e.getMessage.contains("facet with"))
  }

  // ── binary scalars / countof regex / take_anyif / series_outliers ──

  test("binary scalar family") {
    val r = run(
      """t | where id == 1
        | | project a = binary_and(12, 10), o = binary_or(12, 10),
        |           x = binary_xor(12, 10), n = binary_not(0),
        |           sl = binary_shift_left(1, 10),
        |           sr = binary_shift_right(0 - 8, 1),
        |           c = bitset_count_ones(255)""".stripMargin).collect().head
    assert(r.getLong(0) == 8L)
    assert(r.getLong(1) == 14L)
    assert(r.getLong(2) == 6L)
    assert(r.getLong(3) == -1L)
    assert(r.getLong(4) == 1024L)
    assert(r.getLong(5) == -4L) // arithmetic shift keeps the sign
    assert(r.getLong(6) == 8L)
  }

  test("countof kind=regex counts non-overlapping matches") {
    val r = run(
      """t | where id == 1
        | | project a = countof('a1b22c333', '[0-9]+', 'regex'),
        |           b = countof('aaa', 'aa'),
        |           c = countof('abc', '[x]+', 'regex')""".stripMargin)
      .collect().head
    assert(r.getLong(0) == 3L)
    assert(r.getLong(1) == 2L) // literal form counts OVERLAPPING (Kusto)
    assert(r.getLong(2) == 0L)
  }

  test("take_anyif picks the stable minimum of matching rows") {
    val r = run(
      "t | summarize a = take_anyif(name, id > 3), n = take_anyif(name, id > 99)")
      .collect().head
    assert(r.getString(0) == "d")
    assert(r.isNullAt(1)) // no matching rows
  }

  test("series_outliers scores Tukey-fence outliers, zero inside") {
    val r = run(
      """t | where id == 1
        | | project s = series_outliers(pack_array(
        |     10.0, 11.0, 10.5, 10.2, 11.1, 10.8, 100.0, 10.4))""".stripMargin)
      .collect().head.getSeq[Double](0)
    assert(r(6) > 1.0)          // the spike scores high
    assert(r.take(6).forall(_ == 0.0))
    assert(r(7) == 0.0)
  }

  // ── fork ──

  test("fork stacks branch results with provenance") {
    val r = run(
      """t | fork high = (where val >= 40.0 | summarize n = count())
        |          low = (where val < 40.0 | summarize n = count())
        | | sort by fork_table asc""".stripMargin).collect()
    assert(r.map(x => (x.getString(1), x.getLong(0))).toSeq ==
      Seq(("high", 3L), ("low", 3L)))
  }

  test("fork branches bag-union by name; unnamed branches get fork_N") {
    val df = run(
      """t | fork (project id) (project name | extend extra = 1)""".stripMargin)
    assert(df.columns.toSet == Set("id", "fork_table", "name", "extra"))
    val r = df.collect()
    assert(r.count(_.getString(df.columns.indexOf("fork_table")) == "fork_0") == 6)
    assert(r.count(_.getString(df.columns.indexOf("fork_table")) == "fork_1") == 6)
    // fork_0 rows have null name/extra (missing-column null fill)
    assert(r.filter(_.getString(df.columns.indexOf("fork_table")) == "fork_0")
      .forall(_.isNullAt(df.columns.indexOf("name"))))
  }

  test("fork branches may lead with a pipe") {
    val df = run("t | fork ( | where id > 3 | count ) ( | count )")
    assert(df.count() == 2)
  }

  // ── make_list variants / array_split / format_bytes ──

  test("make_list_if and make_set_if collect only matching rows") {
    val r = run(
      """t | summarize l = make_list_if(name, id > 4),
        |             s = make_set_if(name, id > 4)
        | | project l = strcat_array(l, ','), s = strcat_array(s, ',')""".stripMargin)
      .collect().head
    assert(r.getString(0) == "e,f")
    assert(r.getString(1) == "e,f")
  }

  test("make_list_with_nulls keeps null elements") {
    val c2 = new Catalog(spark)
    import spark.implicits._
    c2.register("n", Seq(Some("a"), None, Some("b")).toDF("v"))
    val r = Kql.run(spark, c2,
      "n | summarize l = make_list_with_nulls(v)").collect().head
    val l = r.getSeq[String](0)
    assert(l.length == 3)
    assert(l.count(_ == null) == 1)
    val plain = Kql.run(spark, c2,
      "n | summarize l = make_list(v)").collect().head.getSeq[String](0)
    assert(plain.length == 2) // make_list drops nulls
  }

  test("array_split at single and multiple indices, negative from end") {
    def get(expr: String): Seq[Seq[Long]] =
      run(s"t | where id == 1 | project r = $expr")
        .collect().head.getSeq[Seq[Long]](0)
    assert(get("array_split(pack_array(1, 2, 3, 4, 5), 2)") ==
      Seq(Seq(1L, 2L), Seq(3L, 4L, 5L)))
    assert(get("array_split(pack_array(1, 2, 3, 4, 5), pack_array(1, 3))") ==
      Seq(Seq(1L), Seq(2L, 3L), Seq(4L, 5L)))
    assert(get("array_split(pack_array(1, 2, 3, 4, 5), -2)") ==
      Seq(Seq(1L, 2L, 3L), Seq(4L, 5L)))
    assert(get("array_split(pack_array(1, 2), 9)") ==
      Seq(Seq(1L, 2L), Seq())) // clamped
  }

  test("format_bytes picks power-of-1024 units") {
    val r = run(
      """t | where id == 1
        | | project a = format_bytes(1024), b = format_bytes(0),
        |           c = format_bytes(1537, 1), d = format_bytes(1073741824),
        |           e = format_bytes(500)""".stripMargin).collect().head
    assert(r.getString(0) == "1 KB")
    assert(r.getString(1) == "0 Bytes")
    assert(r.getString(2) == "1.5 KB")
    assert(r.getString(3) == "1 GB")
    assert(r.getString(4) == "500 Bytes")
  }

  test("sample and reduce are rejected inside partition by") {
    assertThrows[KqlParseException] {
      run("t | partition by name ( sample 1 )")
    }
    assertThrows[KqlParseException] {
      run("logs | partition by msg ( reduce by msg )")
    }
  }
}
