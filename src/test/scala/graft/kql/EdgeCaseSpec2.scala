package graft.kql

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Second batch of reference workflow-test ports (`miso-workflow/src/
  * tests.rs`): total-order null comparisons, literal arithmetic in filters,
  * count-on-count, unions with aggregation, nested exists, all-null
  * aggregates — each with the reference's exact inputs and expectations.
  */
class EdgeCaseSpec2 extends AnyFunSuite {
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

  // null_in_lte_operator: null <= 5 is TRUE under the total order
  test("null in lte keeps the null row; gte drops it") {
    val d = logs("""{"x": 10}""", """{"x": 5}""", """{"x": null}""", """{"x": 3}""")
    assert(runOn(d, "test.c | where x <= 5").count() == 3)
    assert(runOn(d, "test.c | where x >= 5").count() == 2)
    assert(runOn(d, "test.c | where x < 3").count() == 1) // only null
    assert(runOn(d, "test.c | where x > 10").count() == 0)
  }

  // in_operator_with_null_in_list (tests.rs:1954)
  test("in-list with null matches null values") {
    val d = logs("""{"x": 1}""", """{"x": 2}""", """{"x": null}""", """{"x": 3}""")
    assert(runOn(d, "test.c | where x in (1, null, 3)").count() == 3)
  }

  // between_null_endpoints (tests.rs:1964)
  test("between with null lower endpoint") {
    val d = logs("""{"x": 5}""", """{"x": 15}""")
    val got = runOn(d, "test.c | where x between (null .. 10)")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(5L))
  }

  // filter_eq_null: x == null matches explicit nulls
  test("equality against null literal") {
    val d = logs("""{"x": 1}""", """{"x": null}""")
    assert(runOn(d, "test.c | where x == null").count() == 1)
    assert(runOn(d, "test.c | where x != null").count() == 1)
  }

  // filter_add_sub / filter_mul_div (tests.rs:639-657)
  test("literal arithmetic in filters") {
    val d1 = logs("""{"world": 1}""", """{"world": 2}""")
    assert(runOn(d1, "test.c | where world == 3 + 2 - 4").count() == 1)
    val d2 = logs("""{"world": 1.5}""", """{"world": 2}""")
    assert(runOn(d2, "test.c | where world == 3 * 2 / 4").count() == 1)
  }

  // filter_gt_now (tests.rs:629)
  test("now() compares against datetime literals") {
    val d = logs("""{"x": 1}""", """{"x": 2}""")
    assert(runOn(d, "test.c | where now() > datetime(1980-01-01)").count() == 2)
  }

  // mixed_int_uint_arithmetic (tests.rs:1864)
  test("mixed-sign cast arithmetic") {
    val d = logs("""{"result": 2}""", """{"result": 3}""")
    assert(runOn(d, "test.c | where result == toint(5) + toint(-3)").count() == 1)
  }

  // count_on_count (tests.rs:1373)
  test("count of a count is one") {
    val d = logs("""{"world": 3}""", """{"test": 1}""", """{"world": 2}""", """{"world": 4}""")
    val got = runOn(d, "test.c | count | count").collect()
    assert(got.length == 1 && got(0).getLong(0) == 1L)
  }

  // union_summarize (tests.rs:1430) — exact reference inputs/expectations
  test("union then summarize matches reference values") {
    val c = new Catalog(spark)
    c.register("test.x", logs(
      """{"x": 3, "y": 3}""", """{"x": 5, "y": 6}""",
      """{"x": 1, "y": 3}""", """{"x": 9, "y": 6}"""))
    c.register("test.y", logs(
      """{"x": 6, "y": 3}""", """{"x": 9, "y": 6}""",
      """{"x": 7, "y": 3}""", """{"x": 2, "y": 6}"""))
    val got = Kql.run(spark, c,
      "test.x | union (test.y) | summarize max_x=max(x), min_x=min(x), sum_x=sum(x), c=count() by y | sort by y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toSeq
    assert(got == Seq((3L, 7L, 1L, 17.0, 4L), (6L, 9L, 2L, 25.0, 4L)))
  }

  // union_count (tests.rs:1458): 3 + 10×4 = 43
  test("ten chained unions count 43") {
    val c = new Catalog(spark)
    c.register("test.x", logs("""{"x": 0}""", """{"x": 1}""", """{"x": 2}"""))
    c.register("test.y", logs("""{"x": 3}""", """{"x": 4}""", """{"x": 5}""", """{"x": 6}"""))
    val q = "test.x" + " | union (test.y)" * 10 + " | count"
    assert(Kql.run(spark, c, q).collect()(0).getLong(0) == 43L)
  }

  // exists_missing_nested_path (tests.rs:1941)
  test("exists on a deep nested path") {
    val d = logs(
      """{"a": {"b": {"c": 1}}, "id": 1}""",
      """{"a": {"x": 1}, "id": 2}""",
      """{"a": null, "id": 3}""",
      """{"id": 4}""")
    assert(runOn(d, "test.c | where exists(a.b.c)").count() == 1)
  }

  // project_nonexistent_field_arithmetic (tests.rs:1924): missing + 5 → null
  test("arithmetic over a missing field yields null, not an error") {
    val d = logs("""{"id": 1}""", """{"id": 2}""")
    val got = runOn(d, "test.c | project result = id0 + 5")
    assert(got.count() == 2)
    assert(got.collect().forall(_.isNullAt(0)))
  }

  // summarize_min_max_all_nulls (tests.rs:2020)
  test("min/max over all-null groups stay null") {
    val d = logs(
      """{"x": null, "y": "a"}""", """{"x": null, "y": "a"}""", """{"x": null, "y": "b"}""")
    val got = runOn(d, "test.c | summarize min_x=min(x), max_x=max(x) by y | sort by y").collect()
    assert(got.length == 2)
    assert(got.forall(r => r.isNullAt(1) && r.isNullAt(2)))
  }

  // summarize_avg_single_value (tests.rs:2036)
  test("avg over one group") {
    val d = logs("""{"x": 10, "y": "a"}""", """{"x": 20, "y": "a"}""")
    val got = runOn(d, "test.c | summarize avg_x=avg(x) by y").collect()
    assert(got.length == 1 && got(0).getDouble(got(0).fieldIndex("avg_x")) == 15.0)
  }

  // filter_eq_fields / filter_not_eq_fields: field-to-field comparison
  test("field == field and field != field") {
    val d = logs("""{"a": 1, "b": 1}""", """{"a": 1, "b": 2}""", """{"a": null, "b": null}""")
    assert(runOn(d, "test.c | where a == b").count() == 2)   // null==null true
    assert(runOn(d, "test.c | where a != b").count() == 1)
    assert(runOn(d, "test.c | where not(a == b)").count() == 1)
  }

  // filter_eq_float / filter_eq_bool
  test("equality on float and bool values") {
    val d = logs("""{"f": 1.5, "b": true}""", """{"f": 2.5, "b": false}""")
    assert(runOn(d, "test.c | where f == 1.5").count() == 1)
    assert(runOn(d, "test.c | where b == true").count() == 1)
    assert(runOn(d, "test.c | where b == false").count() == 1)
  }

  // sort_asc_then_desc
  test("multi-key sort asc then desc") {
    val d = logs(
      """{"a": 1, "b": 9}""", """{"a": 1, "b": 3}""", """{"a": 0, "b": 5}""")
    val got = runOn(d, "test.c | sort by a asc, b desc | project a, b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 5L), (1L, 9L), (1L, 3L)))
  }

  // project_filter: filter referencing only projected-in fields
  test("project then filter on the computed field") {
    val d = logs("""{"x": 2}""", """{"x": 5}""")
    val got = runOn(d, "test.c | project doubled = x * 2 | where doubled > 5")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(10L))
  }

  // expand_object (tests.rs): object → one-entry bags
  test("mv-expand bag kind unrolls a map into single-entry maps") {
    import spark.implicits._
    val d = Seq((1L, Map("env" -> "prod", "region" -> "us-east")))
      .toDF("id", "metadata")
    val got = runOn(d, "test.c | mv-expand metadata")
      .collect().map(r => (r.getLong(0), r.getMap[String, String](1).toMap)).toSeq
      .sortBy(_._2.keys.head)
    assert(got == Seq(
      (1L, Map("env" -> "prod")),
      (1L, Map("region" -> "us-east"))))
  }

  // expand_object_array_kind (tests.rs): object → alternating k,v rows
  test("mv-expand array kind flattens a map into alternating key/value rows") {
    import spark.implicits._
    val d = Seq((1L, Map("env" -> "prod", "region" -> "us-east")))
      .toDF("id", "metadata")
    val got = runOn(d, "test.c | mv-expand kind=array metadata")
      .collect().map(_.getString(1)).toSet
    assert(got == Set("env", "prod", "region", "us-east"))
    assert(runOn(d, "test.c | mv-expand kind=array metadata").count() == 4)
  }

  // expand_empty_object: empty map → row dropped (nothing to unroll)
  test("mv-expand of an empty map emits no rows") {
    import spark.implicits._
    val d = Seq((1L, Map.empty[String, String])).toDF("id", "metadata")
    assert(runOn(d, "test.c | mv-expand metadata").count() == 0)
  }

  // summarize_countif_all_false
  test("countif that never fires is zero") {
    val d = logs("""{"x": 1}""", """{"x": 2}""")
    assert(runOn(d, "test.c | summarize c=countif(x > 99)").collect()(0).getLong(0) == 0L)
  }
}
