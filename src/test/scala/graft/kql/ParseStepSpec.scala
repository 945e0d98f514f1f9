package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The `parse` step: pattern-split extraction into typed columns. */
class ParseStepSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("access", Seq(
      (1L, "GET /index.html HTTP/1.1 200"),
      (2L, "POST /login HTTP/1.1 401"),
      (3L, "malformed line")
    ).toDF("id", "msg"))
    c
  }

  test("parse splits literals and captures, typed capture casts") {
    val got = Kql.run(spark, cat,
      """access
        | | parse msg with verb " " path " HTTP/1.1 " code:long
        | | project id, verb, path, code
        | | sort by id asc""".stripMargin)
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)), Option(r.getString(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(got(0) == ((1L, Some("GET"), Some("/index.html"), Some(200L))))
    assert(got(1) == ((2L, Some("POST"), Some("/login"), Some(401L))))
    // non-matching row keeps null captures, never errors
    assert(got(2) == ((3L, None, None, None)))
  }

  test("regex metacharacters in literals are quoted, not interpreted") {
    val c = new Catalog(spark)
    c.register("t", Seq((1L, "a+b=c [x]")).toDF("id", "s"))
    val got = Kql.run(spark, c,
      """t | parse s with "a+b=" rhs " [" tag "]" | project rhs, tag""")
      .as[(String, String)].head()
    assert(got == (("c", "x")))
  }

  test("middle captures are non-greedy, the last is greedy") {
    val c = new Catalog(spark)
    c.register("t", Seq((1L, "k=v1;k=v2;rest")).toDF("id", "s"))
    val got = Kql.run(spark, c,
      """t | parse s with "k=" first ";" tail | project first, tail""")
      .as[(String, String)].head()
    assert(got == (("v1", "k=v2;rest")))
  }

  test("parse without a capture is a parse error") {
    val e = intercept[KqlParseException] {
      Kql.run(spark, cat, """access | parse msg with "GET """")
    }
    assert(e.getMessage.contains("at least one capture"))
  }

  test("explain renders the parse step back as parseable KQL") {
    val rendered = Kql.explain(spark, cat,
      """access | parse msg with verb " " code:long | count""")
    assert(rendered.contains("parse msg with verb ' ' code:long"))
  }

  test("a matching row with an EMPTY capture keeps empty, not null") {
    val c = new Catalog(spark)
    c.register("t", Seq((1L, "a=;done"), (2L, "no match here"))
      .toDF("id", "s"))
    val got = Kql.run(spark, c,
      """t | parse s with "a=" v ";" rest | project id, v, rest | sort by id asc""")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), Option(r.getString(2))))
    assert(got(0) == ((1L, Some(""), Some("done")))) // matched, v empty
    assert(got(1) == ((2L, None, None)))             // unmatched: nulls
  }

  test("a capture named after the source still extracts later captures") {
    val c = new Catalog(spark)
    c.register("t", Seq((1L, "a;b")).toDF("id", "s"))
    val got = Kql.run(spark, c,
      """t | parse s with s ";" rest | project s, rest""")
      .as[(String, String)].head()
    assert(got == (("a", "b")))
  }

  test("values spanning newlines still match (DOTALL)") {
    val c = new Catalog(spark)
    c.register("t", Seq((1L, "start: line1\nline2 end")).toDF("id", "s"))
    val got = Kql.run(spark, c,
      """t | parse s with "start: " body " end" | project body""")
      .as[String].head()
    assert(got == "line1\nline2")
  }

  test("a capture named after a sort key invalidates the serialized order") {
    // parse preserves row order, but a capture REDEFINES the column it is
    // named after — a following window must fail loudly instead of
    // silently ordering by the re-extracted values (ADVICE round-4)
    val c = new Catalog(spark)
    c.register("t", Seq((1L, "k=9;x"), (2L, "k=1;y")).toDF("id", "s"))
    val e = intercept[KqlParseException] {
      Kql.run(spark, c,
        """t | extend k = id | sort by k asc
          | | parse s with "k=" k ";" rest
          | | extend rn = row_number()""".stripMargin).collect()
    }
    assert(e.getMessage.contains("sort"))
    // a capture NOT touching the sort keys keeps the serialization
    val ok = Kql.run(spark, c,
      """t | sort by id desc
        | | parse s with "k=" kv ";" rest
        | | extend rn = row_number() | project id, rn""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(ok == Seq((2L, 1L), (1L, 2L)))
  }
}
