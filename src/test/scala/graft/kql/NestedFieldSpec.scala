package graft.kql

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Nested-object and array-index access — the hdfs.logs-shaped fixture from
  * the reference (`tests/resources/hdfs.logs.10.json`, FIXTURES.md §2):
  * `resource.service`, `attributes.class`, plus `a.b[0].c` paths and raw().
  */
class NestedFieldSpec extends AnyFunSuite {
  import TestSpark.spark

  private def logs(json: String*): DataFrame = {
    import spark.implicits._
    spark.read.json(spark.createDataset(json))
  }

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("hdfs.logs", logs(
      """{"timestamp":1700000000,"severity_text":"INFO","body":"Verification succeeded","resource":{"service":"datanode"},"attributes":{"class":"DataXceiver"},"tenant_id":50}""",
      """{"timestamp":1700000060,"severity_text":"WARN","body":"Slow block","resource":{"service":"datanode"},"attributes":{"class":"PacketResponder"},"tenant_id":51}""",
      """{"timestamp":1700000120,"severity_text":"INFO","body":"Received block","resource":{"service":"namenode"},"attributes":{"class":"FSNamesystem"},"tenant_id":52}"""
    ))
    c.register("arr", logs(
      """{"id":1,"xs":[10,20,30],"m":{"pos":[{"lat":1.5},{"lat":2.5}]}}""",
      """{"id":2,"xs":[40],"m":{"pos":[{"lat":9.5}]}}"""
    ))
    c
  }

  test("nested struct field in filter and project") {
    val got = Kql.run(spark, cat,
      "hdfs.logs | where resource.service == 'datanode' | project attributes.class | sort by attributes.class")
    // project default name for a field path is its rendered path
    assert(got.columns.toSeq == Seq("attributes.class"))
    assert(got.collect().map(_.getString(0)).toSeq == Seq("DataXceiver", "PacketResponder"))
  }

  test("nested field as group key and agg input") {
    val got = Kql.run(spark, cat,
      "hdfs.logs | summarize n=count(), mn=min(tenant_id) by svc=resource.service | sort by svc")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("datanode", 2L, 50L), ("namenode", 1L, 52L)))
  }

  test("array index access a.b[0] and deep paths") {
    val got = Kql.run(spark, cat,
      "arr | project id, first=xs[0], lat0=m.pos[0].lat | sort by id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 10L, 1.5), (2L, 40L, 9.5)))
  }

  test("out-of-bounds array index is null (missing), filtered by exists") {
    val got = Kql.run(spark, cat,
      "arr | where exists(xs[2]) | project id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L))
  }

  test("project-rename moves a nested field to top level") {
    val got = Kql.run(spark, cat,
      "hdfs.logs | project-rename svc = resource.service | where svc == 'namenode' | count")
    assert(got.collect()(0).getLong(0) == 1L)
    val df = Kql.run(spark, cat, "hdfs.logs | project-rename svc = resource.service")
    assert(df.columns.contains("svc"))
    // move, not copy: `service` was resource's only field, so the emptied
    // parent struct is dropped entirely
    assert(!df.columns.contains("resource"))
  }

  test("project-rename edge cases: rename onto parent name, deep cascade, case-insensitive") {
    val c2 = new Catalog(spark)
    c2.register("deep", logs(
      """{"a": {"b": {"c": 7}}, "r": {"s": 1}, "multi": {"x": 1, "y": 2}}"""))
    // renaming the sole field of a depth-3 chain cascades: a.b.c → whole `a` drops
    val d1 = Kql.run(spark, c2, "deep | project-rename v = a.b.c")
    assert(d1.columns.contains("v") && !d1.columns.contains("a"))
    assert(d1.select("v").collect()(0).getLong(0) == 7L)
    // rename onto the parent's own name: value survives, struct replaced
    val d2 = Kql.run(spark, c2, "deep | project-rename r = r.s")
    assert(d2.select("r").collect()(0).getLong(0) == 1L)
    // multi-field parent with target = parent name
    val d3 = Kql.run(spark, c2, "deep | project-rename multi = multi.x")
    assert(d3.select("multi").collect()(0).getLong(0) == 1L)
    // case-insensitive source resolution (Spark analyzer semantics)
    val d4 = Kql.run(spark, c2, "deep | project-rename rr = R.s")
    assert(d4.columns.contains("rr") && !d4.columns.contains("r"))
  }

  test("raw() passes native Spark SQL through the catalog") {
    val c = new Catalog(spark)
    import spark.implicits._
    c.register("t", Seq((1, "a"), (2, "b")).toDF("id", "s"))
    val got = Kql.run(spark, c,
      "raw(\"SELECT id * 10 AS x FROM t\") | where x > 10 | count")
    assert(got.collect()(0).getLong(0) == 1L)
  }

  test("timestamp epoch column with bin over seconds width") {
    val got = Kql.run(spark, cat,
      "hdfs.logs | summarize n=count() by b=bin(timestamp, 100) | sort by b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1700000000L, 2L), (1700000100L, 1L)))
  }
}
