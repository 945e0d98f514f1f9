package graft.kql

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Ports of the remaining reference expand tests (`miso-workflow/src/
  * tests.rs:1471-1700`): multi-field zip with null padding, null-value
  * pass-through, struct-Object expansion, mixed array+object zip — plus
  * the project-away/project-keep sugar and nested join keys added this
  * round.
  *
  * Note on struct objects: entry values unify as strings/JSON (a Spark map
  * has one value type; the reference's Values are dynamic) — asserted as
  * such below.
  */
class ExpandZipSpec extends AnyFunSuite {
  import TestSpark.spark

  private def logs(json: String*): DataFrame = {
    import spark.implicits._
    spark.read.json(spark.createDataset(json))
  }

  private def runOn(data: DataFrame, kql: String): DataFrame = {
    val c = new Catalog(spark)
    c.register("test.c", data)
    Kql.run(spark, c, kql)
  }

  // round-8 `limit N`: caps expanded rows per input row; pass-through
  // rows (no elements → null index) survive; user item index keeps
  // reporting the element index
  test("mv-expand limit caps rows per input row") {
    val d = logs(
      """{"id": 1, "a": [10, 20, 30, 40]}""",
      """{"id": 2, "a": [7]}""",
      """{"id": 3, "a": null}""")
    val got = runOn(d,
      """test.c | mv-expand with_itemindex=ix a limit 2
        | | project id, ix, a | sort by id asc, ix asc""".stripMargin)
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(got.toSeq == Seq(
      (1L, Some(0L), Some(10L)), (1L, Some(1L), Some(20L)),
      (2L, Some(0L), Some(7L)), (3L, None, None)))
    // without a user index the internal one is dropped again
    val cols = runOn(d, "test.c | mv-expand a limit 2").columns.toSeq
    assert(cols.sorted == Seq("a", "id"))
  }

  // expand_zip (tests.rs:1486): shorter array pads with null
  test("multi-field zip pads the shorter array with null") {
    val d = logs("""{"a": 1, "b": ["x", "y"], "c": [5, 4, 3]}""")
    val got = runOn(d, "test.c | mv-expand b, c | project b, c | sort by c desc")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSeq
    assert(got == Seq((Some("x"), 5L), (Some("y"), 4L), (None, 3L)))
  }

  // ADVICE: a NULL array in a multi-field zip must not drop the row —
  // the non-null arrays expand, the null field stays null
  test("multi-field zip with one null array expands the other") {
    val d = logs(
      """{"id": 1, "b": null, "c": [5, 4, 3]}""",
      """{"id": 2, "b": ["p"], "c": [9]}""")
    val got = runOn(d, "test.c | mv-expand b, c | project id, b, c | sort by id, c")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2))).toSeq
    assert(got == Seq(
      (1L, None, 3L), (1L, None, 4L), (1L, None, 5L), (2L, Some("p"), 9L)))
  }

  // ADVICE: a NULL map row passes through unchanged instead of dropping
  test("null map passes through mv-expand unchanged") {
    import spark.implicits._
    val d = Seq((1L, Map("k" -> "v")), (2L, null.asInstanceOf[Map[String, String]]))
      .toDF("id", "m")
    val got = runOn(d, "test.c | mv-expand m | project id | sort by id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L))
  }

  // expand_object (tests.rs:1523) over a STRUCT column: one-entry objects
  test("bag expand of a struct yields one-entry objects") {
    val d = logs("""{"id": 1, "metadata": {"env": "prod", "region": "us-east"}}""")
    val got = runOn(d, "test.c | mv-expand metadata")
      .collect().map(r => r.getMap[String, String](1).toMap).sortBy(_.keys.head)
    assert(got.toSeq == Seq(Map("env" -> "prod"), Map("region" -> "us-east")))
  }

  // expand_object_array_kind_with_numbers (tests.rs:1618): alternating
  // key/value rows (values stringified in the static-schema model)
  test("array-kind expand of a struct alternates keys and values") {
    val d = logs("""{"id": 1, "config": {"retries": 3, "timeout": 30}}""")
    val got = runOn(d, "test.c | mv-expand kind=array config")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("retries", "3", "timeout", "30"))
  }

  // expand_object_array_kind_with_nested_values (tests.rs:1633): composite
  // entry values render as JSON
  test("array-kind expand renders nested struct values as JSON") {
    val d = logs("""{"id": 1, "data": {"name": "test", "options": {"nested": true}}}""")
    val got = runOn(d, "test.c | mv-expand kind=array data")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("name", "test", "options", """{"nested":true}"""))
  }

  // r02 advice: composite MAP values must render as JSON like the struct
  // path, not as Spark's struct-literal text
  test("expand of a map with struct values renders them as JSON") {
    import org.apache.spark.sql.functions._
    val base = logs("""{"id": 1, "inner": {"nested": true}}""")
      .select(col("id"),
        map(lit("opts"), col("inner")).as("m"))
    val arr = runOn(base, "test.c | mv-expand kind=array m")
      .collect().map(_.getString(1)).toSeq
    assert(arr == Seq("opts", """{"nested":true}"""))
    val bag = runOn(base, "test.c | mv-expand m")
      .collect().map(_.getMap[String, String](1).toMap).toSeq
    assert(bag == Seq(Map("opts" -> """{"nested":true}""")))
  }

  // expand_mixed_array_and_object (tests.rs:1576): arrays and objects zip
  test("mixed array and object fields zip together") {
    val d = logs(
      """{"id": 1, "items": ["a", "b"], "metadata": {"env": "prod", "version": "2.0"}}""")
    val got = runOn(d, "test.c | mv-expand items, metadata | project items, metadata")
      .collect().map(r => (r.getString(0), r.getMap[String, String](1).toMap)).toSeq
      .sortBy(_._1)
    assert(got == Seq(
      ("a", Map("env" -> "prod")),
      ("b", Map("version" -> "2.0"))))
  }

  // expand_object_zip_unequal_lengths (tests.rs:1589): object zip pads null
  test("object zip with unequal entry counts pads with null") {
    val d = logs("""{"id": 1, "tags": {"a": 1, "b": 2, "c": 3}, "flags": {"x": true}}""")
    val rows = runOn(d, "test.c | mv-expand tags, flags | project tags, flags")
      .collect()
    assert(rows.length == 3)
    assert(rows.count(_.isNullAt(1)) == 2, "flags null-padded on rows 2-3")
    val tagKeys = rows.map(_.getMap[String, String](0).keys.head).toSet
    assert(tagKeys == Set("a", "b", "c"))
  }

  // expand_deeply_nested_path (tests.rs:1500)
  test("deeply nested array path expands in place") {
    val d = logs("""{"a": {"b": {"c": {"d": {"e": [1, 2]}}}}}""")
    val got = runOn(d, "test.c | mv-expand a.b.c.d.e | project v = a.b.c.d.e | sort by v")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L))
  }

  // expand_object_array_kind_zip_with_regular_array (tests.rs:1677):
  // the flattened object entries zip against the plain array
  test("array-kind object zips against a regular array with null padding") {
    val d = logs("""{"id": 1, "metadata": {"a": 1, "b": 2}, "items": ["x", "y", "z"]}""")
    val got = runOn(d, "test.c | mv-expand kind=array metadata, items | project metadata, items")
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)))).toSeq
    assert(got == Seq(
      (Some("a"), Some("x")), (Some("1"), Some("y")),
      (Some("b"), Some("z")), (Some("2"), None)))
  }

  // ───────── project-away / project-keep sugar ─────────

  test("project-away drops listed columns, keeps the rest") {
    val d = logs("""{"a": 1, "b": 2, "c": 3}""")
    val got = runOn(d, "test.c | project-away b")
    assert(got.columns.toSeq == Seq("a", "c"))
    assert(runOn(d, "test.c | project-away b, missing").columns.toSeq == Seq("a", "c"))
  }

  test("project-keep keeps columns in schema order regardless of list order") {
    val d = logs("""{"a": 1, "b": 2, "c": 3}""")
    val got = runOn(d, "test.c | project-keep c, a")
    assert(got.columns.toSeq == Seq("a", "c"))
  }

  // ───────── nested join keys ─────────

  test("join on a nested struct key resolves and drops missing keys") {
    val left = logs(
      """{"id": 1, "k": {"v": "x"}}""",
      """{"id": 2, "k": {"v": "y"}}""",
      """{"id": 3, "k": {"v": null}}""")
    val right = logs(
      """{"rid": 10, "k": {"v": "x"}}""",
      """{"rid": 11, "k": {"v": "z"}}""")
    val c = new Catalog(spark)
    c.register("test.l", left)
    c.register("test.r", right)
    val got = Kql.run(spark, c,
      "test.l | join kind=inner (test.r) on $left.k.v == $right.k.v | project id, rid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 10L)))
  }

  test("join on an array-indexed key works via null-safe element access") {
    val left = logs("""{"id": 1, "ks": ["x", "q"]}""", """{"id": 2, "ks": []}""")
    val right = logs("""{"rid": 10, "t": "x"}""")
    val c = new Catalog(spark)
    c.register("test.l", left)
    c.register("test.r", right)
    val got = Kql.run(spark, c,
      "test.l | join kind=inner (test.r) on $left.ks[0] == $right.t | project id, rid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 10L)))
  }
}
