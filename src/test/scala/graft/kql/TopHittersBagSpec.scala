package graft.kql

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** `top-hitters`, `sample-distinct`, and `evaluate bag_unpack` — the
  * round-5 Kusto-surface additions (all beyond the reference's step set).
  */
class TopHittersBagSpec extends AnyFunSuite {
  import TestSpark.spark

  private def logs(json: String*): DataFrame = {
    import spark.implicits._
    spark.read.json(spark.createDataset(json))
  }

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("test.hits", logs(
      """{"u":"a","v":1}""",
      """{"u":"a","v":2}""",
      """{"u":"a","v":3}""",
      """{"u":"b","v":10}""",
      """{"u":"b","v":20}""",
      """{"u":"c","v":100}""",
      """{"u":"d","v":1}"""
    ))
    // bags with heterogeneous keys and a nested object
    c.register("test.bags", logs(
      """{"id":1,"props":"{\"x\":1,\"y\":\"p\"}"}""",
      """{"id":2,"props":"{\"x\":2,\"z\":true}"}""",
      """{"id":3,"props":"{\"nested\":{\"inner\":7}}"}"""
    ))
    c
  }

  private def run(kql: String): DataFrame = Kql.run(spark, cat, kql)

  // ───────── top-hitters ─────────

  test("top-hitters by count with Kusto column naming and value tiebreak") {
    val df = run("test.hits | top-hitters 2 of u")
    assert(df.columns.toSeq == Seq("u", "approximate_count_u"))
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 3L), ("b", 2L)))
    // c and d tie at 1 — value-ascending tiebreak makes rank 3 'c'
    val df3 = run("test.hits | top-hitters 3 of u")
    assert(df3.collect().map(_.getString(0)).toSeq == Seq("a", "b", "c"))
  }

  test("top-hitters by sum") {
    val df = run("test.hits | top-hitters 2 of u by v")
    assert(df.columns.toSeq == Seq("u", "approximate_sum_v"))
    assert(df.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("c", 100.0), ("b", 30.0)))
  }

  // ───────── sample-distinct ─────────

  test("sample-distinct is a reproducible subset of the distinct values") {
    val a = run("test.hits | sample-distinct 2 of u").collect().map(_.getString(0)).toSeq
    val b = run("test.hits | sample-distinct 2 of u").collect().map(_.getString(0)).toSeq
    assert(a == b, "same data must sample the same values")
    assert(a.toSet.subsetOf(Set("a", "b", "c", "d")) && a.size == 2)
    // asking for >= cardinality returns the whole distinct set
    val all = run("test.hits | sample-distinct 10 of u").collect().map(_.getString(0))
    assert(all.toSet == Set("a", "b", "c", "d"))
  }

  test("sample-distinct order matches the xxhash64 rank") {
    import org.apache.spark.sql.functions._
    val expect = run("test.hits | distinct u")
      .orderBy(xxhash64(col("u")), col("u")).limit(3)
      .collect().map(_.getString(0)).toSeq
    val got = run("test.hits | sample-distinct 3 of u")
      .collect().map(_.getString(0)).toSeq
    assert(got == expect)
  }

  // ───────── bag_unpack ─────────

  test("bag_unpack expands merged keys, drops the bag, keeps other columns") {
    val df = run("test.bags | extend d = todynamic(props) | project id, d" +
      " | evaluate bag_unpack(d) | sort by id asc")
    assert(df.columns.toSeq == Seq("id", "nested", "x", "y", "z"))
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // x: BIGINT with nulls where absent
    assert(rows.map(r => Option(r.get(r.fieldIndex("x")))).toSeq ==
      Seq(Some(1L), Some(2L), None))
    assert(rows(0).getString(rows(0).fieldIndex("y")) == "p")
    assert(rows(1).getBoolean(rows(1).fieldIndex("z")))
  }

  test("bag_unpack prefix and nested bag stays re-unpackable") {
    val df = run("test.bags | extend d = todynamic(props) | project id, d" +
      " | evaluate bag_unpack(d, 'p_') | sort by id asc")
    assert(df.columns.toSeq == Seq("id", "p_nested", "p_x", "p_y", "p_z"))
    // the nested object survived as a variant → unpack again
    val df2 = run("test.bags | extend d = todynamic(props) | project id, d" +
      " | evaluate bag_unpack(d) | project id, nested" +
      " | evaluate bag_unpack(nested) | where exists(inner) | project id, inner")
    assert(df2.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((3L, 7L)))
  }

  test("bag_unpack on non-object values fails loudly") {
    val e = intercept[KqlParseException] {
      run("test.hits | extend d = todynamic(tostring(v)) | evaluate bag_unpack(d)")
    }
    assert(e.getMessage.contains("non-object"))
  }
}
