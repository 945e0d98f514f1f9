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

  test("sample and reduce are rejected inside partition by") {
    assertThrows[KqlParseException] {
      run("t | partition by name ( sample 1 )")
    }
    assertThrows[KqlParseException] {
      run("logs | partition by msg ( reduce by msg )")
    }
  }
}
