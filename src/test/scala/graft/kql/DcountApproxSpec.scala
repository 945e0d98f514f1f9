package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** The HLL++ fast mode of dcount: close to exact on real cardinalities,
  * same null-counts-as-one-distinct semantics, same default naming shape.
  */
class DcountApproxSpec extends AnyFunSuite {
  import TestSpark.spark

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("events", Tables.load(spark, TestSpark.sf, "events"))
    c
  }

  test("dcount_approx tracks exact dcount within HLL tolerance") {
    val exact = Kql.run(spark, cat,
      "events | summarize d=dcount(user_id) by event_type | sort by event_type asc")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val approx = Kql.run(spark, cat,
      "events | summarize d=dcount_approx(user_id) by event_type | sort by event_type asc")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty)
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      // approx_count_distinct default rsd = 5%; allow 3 sigma plus slack
      // for tiny groups
      assert(math.abs(ap - ex) <= math.max(3, 0.15 * ex),
        s"group $k: exact $ex vs approx $ap")
    }
  }

  test("dcount_approx counts an explicit null as one distinct value") {
    import spark.implicits._
    val c = new Catalog(spark)
    c.register("t", Seq[(java.lang.Long, String)](
      (1L, "g"), (1L, "g"), (null, "g"), (null, "g"), (2L, "g"))
      .toDF("x", "g"))
    val got = Kql.run(spark, c, "t | summarize d=dcount_approx(x) by g")
      .collect().head.getLong(1)
    assert(got == 3L) // {1, 2} + the null bucket, per the reference's dcount
  }

  test("default output name follows the dcount_<field> convention") {
    val df = Kql.run(spark, cat,
      "events | summarize dcount_approx(user_id)")
    assert(df.columns.contains("dcount_approx_user_id"))
  }
}
