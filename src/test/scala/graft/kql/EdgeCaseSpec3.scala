package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Edge cases for the round-6 session-2 operators: empty inputs, nulls
  * in the hot path, degenerate shapes.
  */
class EdgeCaseSpec3 extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("t", Seq((1L, "a", 1.0), (2L, null: String, 2.0))
      .toDF("id", "s", "v"))
    c.register("empty",
      Seq.empty[(Long, String)].toDF("id", "s"))
    c
  }

  private def run(kql: String) = Kql.run(spark, cat, kql)

  test("sample / reduce / facet / fork on an empty table") {
    assert(run("empty | sample 5").count() == 0)
    assert(run("empty | reduce by s").count() == 0)
    assert(run("empty | facet by s").count() == 0)
    assert(run("empty | fork a = (count) b = (count)").count() == 2)
    // each fork count-branch reports 0
    assert(run("empty | fork a = (count) | project Count")
      .collect().head.getLong(0) == 0L)
  }

  test("reduce by folds null values into the null pattern group") {
    val r = run("t | reduce by s | sort by Pattern asc nulls first").collect()
    // null strings: pattern null, representative null, counted
    assert(r.length == 2)
    assert(r.exists(x => x.isNullAt(0) && x.getLong(1) == 1L))
  }

  test("parse-kv on null and non-matching sources yields nulls") {
    val r = run(
      """t | parse-kv s as (k: string)
        |   with (pair_delimiter=';', kv_delimiter='=')
        | | sort by id asc""".stripMargin).collect()
    assert(r.forall(_.isNullAt(3))) // no k= anywhere, incl. the null row
  }

  test("project-reorder with a wildcard matching nothing is a no-op") {
    assert(run("t | project-reorder zz*").columns.toSeq ==
      Seq("id", "s", "v"))
  }

  test("facet stringifies null values into a countable group") {
    val r = run("t | facet by s | sort by value asc nulls first").collect()
    assert(r.length == 2)
    assert(r.exists(x => x.isNullAt(1) && x.getLong(2) == 1L))
  }

  test("tdigest of an empty group estimates null") {
    val r = run(
      """t | where id > 99 | summarize td = tdigest(v)
        | | project p = percentile_tdigest(td, 50)""".stripMargin).collect()
    assert(r.length == 1 && r.head.isNullAt(0))
  }

  test("series_outliers of empty / all-null arrays") {
    val r = run(
      """t | where id == 1
        | | project a = series_outliers(pack_array(v) ),
        |           n = array_length(series_outliers(pack_array(1.0)))""".stripMargin)
      .collect().head
    // single element: IQR 0 → score 0.0
    assert(r.getSeq[Double](0) == Seq(0.0))
    assert(r.getLong(1) == 1L)
  }

  test("array_split with empty array and index 0") {
    val r = run(
      """t | where id == 1
        | | extend sp = array_split(pack_array(1, 2), 0)
        | | project a = array_length(sp), s = strcat_array(sp[0], ',')""".stripMargin)
      .collect().head
    assert(r.getLong(0) == 2L) // ["", [1,2]] — empty head slice + all
    assert(r.getString(1) == "")
  }

  test("row_window_session handles a single row and null ts") {
    val c2 = new Catalog(spark)
    c2.register("one", Seq(
      (1L, Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))),
      (2L, None: Option[java.sql.Timestamp])
    ).toDF("id", "at"))
    val r = Kql.run(spark, c2,
      """one | sort by at asc nulls first
        | | extend s = row_window_session(at, 1h, 10m)
        | | sort by id asc""".stripMargin).collect()
    assert(r(0).getTimestamp(2) != null)
  }
}
