package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.CountOfUtil
import org.apache.spark.unsafe.types.UTF8String

/** Pins for the round-6 advisor findings: empty-needle countof, fuzzy
  * union's error selectivity, buildschema alternatives merging,
  * mv-expand `to typeof(dynamic)`, and series_fit_line_dynamic's
  * whole-result null on null elements.
  */
class AdviceR6Spec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("t", Seq(
      (1L, "abc", """{"a": 1}"""),
      (2L, "", """{"b": 2}"""),
      (3L, "aaa", """"str"""")).toDF("id", "s", "j"))
    c
  }

  private def run(kql: String) = Kql.run(spark, cat, kql)

  test("countof with a computed empty needle terminates and returns 0") {
    // the parser rejects an empty LITERAL; a computed "" must not hang
    assert(CountOfUtil.overlapping(
      UTF8String.fromString("abc"), UTF8String.fromString("")) == 0L)
    assert(CountOfUtil.overlapping(
      UTF8String.fromString(""), UTF8String.fromString("")) == 0L)
    val r = run("t | project id, c = countof(s, substring(s, 0, 0)) | sort by id asc")
      .collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(0L, 0L, 0L))
    // overlapping semantics intact
    assert(CountOfUtil.overlapping(
      UTF8String.fromString("aaa"), UTF8String.fromString("aa")) == 2L)
  }

  test("fuzzy union tolerates ONLY unknown sources, not broken branches") {
    // unknown source: branch dropped, left side passes through
    assert(run("t | union isfuzzy=true (no_such_table) | count")
      .collect().head.getLong(0) == 3L)
    // known source but semantically broken branch: must still fail
    val e = intercept[KqlParseException] {
      run("t | union isfuzzy=true (t | extend z = no_such_fn(s)) | count").collect()
    }
    assert(!e.isInstanceOf[UnknownSourceException])
  }

  test("buildschema unions object keys even beside a scalar alternative") {
    val r = run(
      """t | extend d = todynamic(j) | summarize s = buildschema(d)
        | | project s = tostring(s)""".stripMargin).collect()
    val s = r.head.getString(0)
    // {"a":long}, {"b":2} and "str" merge to one object + the scalar
    assert(s.contains(""""a":"long""""), s)
    assert(s.contains(""""b":"long""""), s)
    assert(s.contains(""""string""""), s)
    // the two object shapes merged into ONE alternative, not two
    assert(s.indexOf("\"a\"") >= 0 && s.indexOf("\"b\"") >= 0)
    assert(!s.replaceAll("\\s", "").contains("""{"a":"long"},{"b":"long"}"""), s)
  }

  test("mv-expand to typeof(dynamic) keeps the element a variant") {
    val r = run(
      """t | extend arr = todynamic('[{"x": 5}, {"x": 6}]')
        | | mv-expand arr to typeof(dynamic)
        | | project id, x = toint(arr.x)
        | | sort by id asc, x asc""".stripMargin).collect()
    // field paths on the expanded element still work (no string cast)
    assert(r.map(_.getLong(1)).toSeq == Seq(5L, 6L, 5L, 6L, 5L, 6L))
  }

  test("series_fit_line_dynamic: any null element nulls the whole bag") {
    val r = run(
      """print fl = series_fit_line_dynamic(todynamic('[1, null, 3]'))""")
      .collect()
    assert(r.head.isNullAt(0))
    // and a clean series still fits
    val ok = run(
      """print fl = series_fit_line_dynamic(pack_array(1, 2, 3))
        | | project s = todouble(fl.slope)""".stripMargin).collect()
    assert(math.abs(ok.head.getDouble(0) - 1.0) < 1e-12)
  }
}
