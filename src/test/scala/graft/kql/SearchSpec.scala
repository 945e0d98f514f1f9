package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The `search` step: free-text filtering across all string columns. */
class SearchSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("logs", Seq(
      (1L, "GET /index", "ok"),
      (2L, "POST /login", "Error: denied"),
      (3L, "GET /error-page", "ok"),
      (4L, "PUT /data", "ok")
    ).toDF("id", "msg", "status"))
    c
  }

  test("search matches any string column, case-insensitively") {
    val got = Kql.run(spark, cat, """logs | search "error" | project id | sort by id asc""")
      .as[Long].collect().toSeq
    assert(got == Seq(2L, 3L)) // status "Error:" and msg "/error-page"
  }

  test("kind=case_sensitive restricts to exact case") {
    val got = Kql.run(spark, cat,
      """logs | search kind=case_sensitive "Error" | project id""")
      .as[Long].collect().toSeq
    assert(got == Seq(2L))
  }

  test("numeric columns do not participate") {
    val got = Kql.run(spark, cat, """logs | search "1" | count""")
      .as[Long].head()
    assert(got == 0L) // id=1 is numeric; no string column contains "1"
  }

  test("search over variant columns sees the JSON text") {
    val c2 = new Catalog(spark)
    c2.register("ev", Seq(
      (1L, """{"kind":"payment","ok":true}"""),
      (2L, """{"kind":"refund","ok":false}""")
    ).toDF("id", "props").selectExpr("id", "parse_json(props) AS props"))
    val got = Kql.run(spark, c2, """ev | search "refund" | project id""")
      .as[Long].collect().toSeq
    assert(got == Seq(2L))
  }

  test("search survives projected columns with dots in their names") {
    // `project props.k` default-names the output column literally
    // "props.k"; search must treat that as one column, not struct access
    val c2 = new Catalog(spark)
    c2.register("t", Seq((1L, "hello"), (2L, "world"))
      .toDF("id", "a").selectExpr("id", "a AS `a.b`"))
    val got = Kql.run(spark, c2, """t | search "wor" | project id""")
      .as[Long].collect().toSeq
    assert(got == Seq(2L))
  }

  test("a bare search term is a parse error with position info") {
    val e = intercept[KqlParseException] {
      Kql.run(spark, cat, "logs | search unquoted")
    }
    assert(e.getMessage.contains("quoted term"))
  }
}
