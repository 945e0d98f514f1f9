package graft.kql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, parse_json}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Schemaless-column (VariantType) semantics — the closest Spark analog of
  * miso's fully-dynamic `Log` model (SURVEY §1.1): heterogeneous rows in one
  * column, missing ≠ JSON-null, cross-type access without declared schema.
  */
class VariantSpec extends AnyFunSuite {
  import TestSpark.spark

  private def varTable(json: String*): DataFrame = {
    import spark.implicits._
    spark.createDataset(json).toDF("raw")
      .withColumn("v", parse_json(col("raw")))
      .drop("raw")
  }

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("dyn", varTable(
      """{"id": 1, "k": 10, "tag": "a", "nested": {"x": 1.5, "ys": [7, 8]}}""",
      """{"id": 2, "k": 60, "tag": "b"}""",
      """{"id": 3, "k": null, "tag": "c"}""",
      """{"id": 4, "tag": "d"}""",
      """{"id": 5, "k": "not-a-number", "tag": "e"}"""
    ))
    c
  }

  private def run(kql: String): DataFrame = Kql.run(spark, cat, kql)

  test("numeric comparison through a variant path; bad values drop") {
    // k>=50: id2 only (null k, missing k, non-numeric k all drop)
    val got = run("dyn | where v.k >= 50 | project id = toint(v.id)")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L))
  }

  test("exists() distinguishes JSON null from missing key") {
    // miso: a present key with null value EXISTS; a missing key does not
    assert(run("dyn | where exists(v.k) | count").collect()(0).getLong(0) == 4L)
    assert(run("dyn | where not(exists(v.k)) | count").collect()(0).getLong(0) == 1L)
  }

  test("nested variant paths incl. array index") {
    val got = run("dyn | where v.nested.x > 1 | project y = toint(v.nested.ys[1])")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(8L))
  }

  test("string predicates through variant") {
    assert(run("dyn | where v.tag startswith 'a' | count").collect()(0).getLong(0) == 1L)
  }

  test("summarize over variant paths: sum skips non-numeric values (→ 0.0)") {
    // all-non-numeric groups sum to 0.0, matching the reference's f64
    // accumulator starting state (summarize.rs:580-587); the group key
    // column carries the variant VALUE (reference semantics), so render it
    val got = run(
      "dyn | summarize n=count(), s=sum(v.k) by t=v.tag | sort by t | project ts=tostring(t), s")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got == Seq(("a", 10.0), ("b", 60.0), ("c", 0.0), ("d", 0.0), ("e", 0.0)))
  }

  test("variant group key groups by value") {
    val got = run("dyn | summarize n=count() by t=v.tag | sort by t | project ts=tostring(t), n")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 1L), ("b", 1L), ("c", 1L), ("d", 1L), ("e", 1L)))
  }

  test("arithmetic on variant values yields double; non-numeric drops") {
    val got = run("dyn | where v.k / 2 >= 5 | project id = toint(v.id)")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }

  test("variant truthiness: numbers, strings, null, missing") {
    // truthy: k=10, k=60, k="not-a-number" (non-empty string);
    // falsy: k=null (json null), k missing
    assert(run("dyn | where v.k | count").collect()(0).getLong(0) == 3L)
  }

  test("variant truthiness: string '0'/'false' are truthy (non-empty)") {
    // reference to_bool: any non-empty string ⇒ true — "0" must not be
    // coerced to a falsy number/boolean
    val c2 = new Catalog(spark)
    c2.register("tv", varTable(
      """{"id": 1, "s": "0"}""", """{"id": 2, "s": "false"}""",
      """{"id": 3, "s": ""}""", """{"id": 4, "s": 0}""",
      """{"id": 5, "s": true}"""))
    val got = Kql.run(spark, c2, "tv | where v.s | project i = toint(v.id)")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 5L))
  }

  test("variant min/max compare numerically, not lexicographically") {
    val c2 = new Catalog(spark)
    c2.register("mm", varTable(
      """{"k": 2}""", """{"k": 100}""", """{"k": 99}"""))
    val r = Kql.run(spark, c2, "mm | summarize mn=min(v.k), mx=max(v.k)").collect()(0)
    assert(r.getDouble(0) == 2.0 && r.getDouble(1) == 100.0)
  }

  // ── sort_by_type ports (tests.rs:895-934): per-type ordering under the
  //    reference's total order (value/mod.rs:146-209) ──

  private def sortByType(rows: Seq[String]): Seq[String] = {
    val c2 = new Catalog(spark)
    c2.register("st", varTable(rows: _*))
    Kql.run(spark, c2, "st | sort by v.x asc | project s = tostring(v.x)")
      .collect().map(r => Option(r.getString(0)).getOrElse("∅")).toSeq
  }

  test("sort_by_type: bool (false < true)") {
    assert(sortByType(Seq("""{"x": true}""", """{"x": false}""", """{"x": true}"""))
      == Seq("false", "true", "true"))
  }

  test("sort_by_type: string") {
    assert(sortByType(Seq("""{"x": "zebra"}""", """{"x": "apple"}""", """{"x": "banana"}"""))
      == Seq("apple", "banana", "zebra"))
  }

  test("sort_by_type: float") {
    assert(sortByType(Seq("""{"x": 3.14}""", """{"x": 1.41}""", """{"x": 2.72}"""))
      == Seq("1.41", "2.72", "3.14"))
  }

  test("sort_by_type: array") {
    assert(sortByType(Seq("""{"x": [3,2,1]}""", """{"x": [1]}""", """{"x": [2,1]}"""))
      == Seq("[1]", "[2,1]", "[3,2,1]"))
  }

  test("sort_by_type: object") {
    assert(sortByType(Seq("""{"x": {"z":1}}""", """{"x": {"a":1}}""", """{"x": {"m":1}}"""))
      == Seq("""{"a":1}""", """{"m":1}""", """{"z":1}"""))
  }

  test("cross-type sort: Bool < numbers < String < Array < Object, nulls last") {
    // numbers interleave across int/float ("10" would sort before "9"
    // under the old stringly order); the default nulls placement is LAST
    // (reference NullsOrder::default), overriding Null's position as the
    // total order's minimum
    val got = sortByType(Seq(
      """{"x": {"a":1}}""", """{"x": "s"}""", """{"x": 10}""", """{"x": 9.5}""",
      """{"x": true}""", """{"x": [1]}""", """{"x": null}""", """{"x": false}"""))
    assert(got == Seq("false", "true", "9.5", "10", "s", "[1]", """{"a":1}""", "∅"))
  }

  test("arrays order element-wise recursively, not by JSON text") {
    // JSON text would put "[10]" before "[2]" and "[2,0]" before "[2]";
    // the reference's Vec<Value>::cmp orders [2] < [2,0] < [10] < [[1]]
    // (numbers before arrays at the element level too)
    assert(sortByType(Seq(
      """{"x": [10]}""", """{"x": [2]}""", """{"x": [[1]]}""", """{"x": [2,0]}"""))
      == Seq("[2]", "[2,0]", "[10]", "[[1]]"))
  }

  test("objects order by key-sorted (key, value) tuples, not by JSON text") {
    // text order: {"a":10} < {"a":2}; BTreeMap order compares the values:
    // {"a":2} < {"a":10} < {"a":10,"b":1} < {"b":0} (key "a" < key "b")
    assert(sortByType(Seq(
      """{"x": {"b":0}}""", """{"x": {"a":10}}""", """{"x": {"a":2}}""",
      """{"x": {"a":10,"b":1}}"""))
      == Seq("""{"a":2}""", """{"a":10}""", """{"a":10,"b":1}""", """{"b":0}"""))
  }

  test("nested JSON null is the order minimum inside containers") {
    // [null] < [false] < [0] — Value::Null sorts below every other element
    assert(sortByType(Seq(
      """{"x": [0]}""", """{"x": [null]}""", """{"x": [false]}"""))
      == Seq("[null]", "[false]", "[0]"))
  }

  test("element-wise-equal arrays group together across int/float spellings") {
    val c2 = new Catalog(spark)
    c2.register("ga", varTable(
      """{"x": [1, 2]}""", """{"x": [1.0, 2.0]}""", """{"x": [1, 3]}"""))
    val got = Kql.run(spark, c2,
      "ga | summarize n = count() by k = v.x | project n | sort by n desc")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L, 1L)) // {[1,2], [1.0,2.0]} merge; [1,3] apart
  }

  test("cross-type group: int and float of equal value merge; string stays apart") {
    val c2 = new Catalog(spark)
    c2.register("gt", varTable(
      """{"x": 1}""", """{"x": 1.0}""", """{"x": "1"}""", """{"x": 2}"""))
    val got = Kql.run(spark, c2,
      "gt | summarize n = count() by k = v.x | project n | sort by n desc")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L, 1L, 1L)) // {1, 1.0}, {"1"}, {2}
  }
}
