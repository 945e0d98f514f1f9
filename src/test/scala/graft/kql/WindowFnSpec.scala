package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Serialized window scalars: row_number/prev/next/row_cumsum, valid only
  * after a sort (KQL's serialize model — the sort keys define the window
  * order).
  */
class WindowFnSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("t", Seq(
      (3L, 30L), (1L, 10L), (2L, 20L), (4L, 40L)
    ).toDF("id", "v"))
    c
  }

  test("row_number follows the sort order, starting at 1") {
    val rows = Kql.run(spark, cat,
      "t | sort by id asc | extend rn = row_number() | project id, rn | sort by id asc")
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)))
  }

  test("row_number takes a starting index") {
    val rows = Kql.run(spark, cat,
      "t | sort by id asc | extend rn = row_number(10) | project rn | sort by rn asc")
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(10L, 11L, 12L, 13L))
  }

  test("prev/next with defaults and offsets") {
    val rows = Kql.run(spark, cat,
      """t | sort by id asc
        |  | extend p = prev(v), p0 = prev(v, 1, 0), n2 = next(v, 2)
        |  | project id, p, p0, n2 | sort by id asc""".stripMargin).collect()
    assert(rows(0).isNullAt(1))           // no previous row
    assert(rows(0).getLong(2) == 0L)      // default fills it
    assert(rows(0).getLong(3) == 30L)     // next-next value
    assert(rows(3).isNullAt(3))           // no next-next at the tail
    assert(rows(2).getLong(1) == 20L)
  }

  test("row_cumsum accumulates in sort order and keeps integer typing") {
    val rows = Kql.run(spark, cat,
      "t | sort by id asc | extend c = row_cumsum(v) | project c | sort by c asc").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(10L, 30L, 60L, 100L))
  }

  test("window scalars without a preceding sort are rejected") {
    val e = intercept[KqlParseException] {
      Kql.run(spark, cat, "t | extend rn = row_number()")
    }
    assert(e.getMessage.contains("serialized"))
  }

  test("where/project preserve serialization; summarize destroys it") {
    // filter between sort and window: still serialized
    val rows = Kql.run(spark, cat,
      """t | sort by id asc | where id != 2
        |  | extend rn = row_number() | project id, rn | sort by id asc""".stripMargin).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 1L), (3L, 2L), (4L, 3L)))
    val e = intercept[KqlParseException] {
      Kql.run(spark, cat,
        """t | sort by id asc | summarize n = count() by v
          |  | extend rn = row_number()""".stripMargin)
    }
    assert(e.getMessage.contains("serialized"))
  }

  test("dropping or redefining a sort key de-serializes the input") {
    // project away the key: window must be rejected, not silently random
    val e1 = intercept[KqlParseException] {
      Kql.run(spark, cat, "t | sort by v asc | project id | extend rn = row_number()")
    }
    assert(e1.getMessage.contains("serialized"))
    // overwrite the key: same
    val e2 = intercept[KqlParseException] {
      Kql.run(spark, cat,
        "t | sort by v asc | extend v = 0 - v | extend rn = row_number()")
    }
    assert(e2.getMessage.contains("serialized"))
    // projecting the key THROUGH keeps serialization
    val ok = Kql.run(spark, cat,
      "t | sort by v asc | project id, v | extend rn = row_number() | sort by rn asc")
      .collect()
    assert(ok.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("prev/next default fills only out-of-bounds rows, not real nulls") {
    val c2 = new Catalog(spark)
    import spark.implicits._
    c2.register("u", Seq(
      (1L, Some(10L)), (2L, None: Option[Long]), (3L, Some(30L))
    ).toDF("id", "v"))
    val rows = Kql.run(spark, c2,
      """u | sort by id asc | extend p = prev(v, 1, 0 - 1)
        |  | project id, p | sort by id asc""".stripMargin).collect()
    assert(rows(0).getLong(1) == -1L) // no previous row: default
    assert(rows(1).getLong(1) == 10L)
    assert(rows(2).isNullAt(1))       // previous row EXISTS, value is null
  }

  test("descending sort keys order the window the same way") {
    val rows = Kql.run(spark, cat,
      "t | sort by id desc | extend rn = row_number() | project id, rn | sort by rn asc")
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((4L, 1L), (3L, 2L), (2L, 3L), (1L, 4L)))
  }
}
