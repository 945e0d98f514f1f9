package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The string scalar surface: strlen/tolower/toupper/trim/substring/
  * replace_string, with KQL's 0-based substring semantics.
  */
class StrFnSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("t", Seq(
      (1L, "  Hello World  "),
      (2L, "abc"),
      (3L, "")
    ).toDF("id", "s"))
    c
  }

  private def one(kql: String): org.apache.spark.sql.Row =
    Kql.run(spark, cat, kql).collect().head

  test("strlen, tolower, toupper, trim") {
    val r = one(
      """t | where id == 1
        | | project n = strlen(s), lo = tolower(s), up = toupper(s), tr = trim(s)""".stripMargin)
    assert(r.getLong(0) == 15L)
    assert(r.getString(1) == "  hello world  ")
    assert(r.getString(2) == "  HELLO WORLD  ")
    assert(r.getString(3) == "Hello World")
  }

  test("substring is 0-based; omitted length runs to the end") {
    val r = one(
      """t | where id == 2
        | | project a = substring(s, 0, 2), b = substring(s, 1), c = substring(s, 2, 99)""".stripMargin)
    assert(r.getString(0) == "ab")
    assert(r.getString(1) == "bc")
    assert(r.getString(2) == "c")
  }

  test("substring clamps negative starts and survives out-of-range") {
    val r = one(
      """t | where id == 2
        | | project a = substring(s, -5, 2), b = substring(s, 10, 3)""".stripMargin)
    assert(r.getString(0) == "ab") // negative start clamps to 0
    assert(r.getString(1) == "")   // past the end: empty, not error
  }

  test("replace_string replaces literally, not as regex") {
    val c2 = new Catalog(spark)
    c2.register("u", Seq((1L, "a.b.a.b")).toDF("id", "s"))
    val r = Kql.run(spark, c2,
      """u | project out = replace_string(s, "a.b", "X")""").collect().head
    assert(r.getString(0) == "X.X") // "." matched literally
  }

  test("datetime scalars: truncation and field extraction in UTC") {
    val c2 = new Catalog(spark)
    c2.register("e", Seq(
      (1L, java.sql.Timestamp.valueOf("2024-03-15 17:45:30")))
      .toDF("id", "ts"))
    val r = Kql.run(spark, c2,
      """e | project d = startofday(ts), sh = startofhour(ts),
        |    h = hourofday(ts), dom = dayofmonth(ts), m = monthofyear(ts)""".stripMargin)
      .collect().head
    assert(r.getTimestamp(0) == java.sql.Timestamp.valueOf("2024-03-15 00:00:00"))
    assert(r.getTimestamp(1) == java.sql.Timestamp.valueOf("2024-03-15 17:00:00"))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((17L, 15L, 3L)))
  }

  test("strlen of empty is 0; functions compose with where/summarize") {
    val n = Kql.run(spark, cat,
      "t | where strlen(trim(s)) == 0 | count").as[Long].head()
    assert(n == 1L) // only the empty string row
  }

  test("countof counts OVERLAPPING occurrences (Kusto's plain kind)") {
    val r = Kql.run(spark, cat,
      """t | where id == 1
        | | project a = countof(s, 'l'), b = countof(s, 'lo'), c = countof(s, 'zz')""".stripMargin)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 1L, 0L)))
  }

  test("tohex is lowercase; base64 round-trips") {
    val r = Kql.run(spark, cat,
      """t | where id == 2
        | | project h = tohex(255), h2 = tohex(id),
        |           b = base64_encode_tostring(s),
        |           rt = base64_decode_tostring(base64_encode_tostring(s))""".stripMargin)
      .collect().head
    assert(r.getString(0) == "ff")
    assert(r.getString(1) == "2")
    assert(r.getString(2) == "YWJj") // "abc"
    assert(r.getString(3) == "abc")
  }

  test("extract_all: full matches without groups, group 1 with") {
    val c2 = new Catalog(spark)
    c2.register("u", Seq("a1 b22 c333").toDF("s"))
    val r = Kql.run(spark, c2,
      """u | project a = extract_all('[a-z]\\d+', s),
        |    b = extract_all('[a-z](\\d+)', s)""".stripMargin).collect().head
    assert(r.getSeq[String](0) == Seq("a1", "b22", "c333"))
    assert(r.getSeq[String](1) == Seq("1", "22", "333"))
  }

  test("matches regex filters; negation inverts") {
    val c2 = new Catalog(spark)
    c2.register("u", Seq("code=7", "code=x", "none").toDF("s"))
    val hit = Kql.run(spark, c2,
      "u | where s matches regex 'code=\\\\d+' | count").as[Long].head()
    assert(hit == 1L)
    val miss = Kql.run(spark, c2,
      "u | where s !matches regex 'code=' | count").as[Long].head()
    assert(miss == 1L)
  }

  test("bin_at anchors numeric and datetime bins") {
    val c2 = new Catalog(spark)
    import java.sql.Timestamp
    c2.register("e", Seq((23.0, Timestamp.valueOf("2024-03-15 10:37:00")))
      .toDF("x", "ts"))
    val r = Kql.run(spark, c2,
      """e | project a = bin_at(x, 10.0, 5.0),
        |    b = bin_at(ts, 1h, datetime(2024-03-15 00:30:00))""".stripMargin)
      .collect().head
    assert(r.getDouble(0) == 15.0)
    assert(r.getTimestamp(1) == Timestamp.valueOf("2024-03-15 10:30:00"))
  }

  test("bin_at on a datetime: integer width means seconds, stays a timestamp") {
    // mirror bin(): the generic numeric branch would silently try_cast the
    // timestamp to double and return a double (ADVICE round-4 finding)
    val c2 = new Catalog(spark)
    import java.sql.Timestamp
    c2.register("e", Seq((1L, Timestamp.valueOf("2024-03-15 10:37:00")))
      .toDF("id", "ts"))
    val r = Kql.run(spark, c2,
      "e | project b = bin_at(ts, 3600, datetime(2024-03-15 00:30:00))")
      .collect().head
    assert(r.getTimestamp(0) == Timestamp.valueOf("2024-03-15 10:30:00"))
    val e = intercept[KqlParseException] {
      Kql.run(spark, c2, "e | project b = bin_at(ts, id, datetime(2024-03-15 00:30:00))")
        .collect()
    }
    assert(e.getMessage.contains("bin_at"))
  }

  test("countof rejects an empty search string at parse time") {
    val e = intercept[KqlParseException] {
      Kql.run(spark, cat, "t | project n = countof(s, '')").collect()
    }
    assert(e.getMessage.contains("non-empty"))
  }

  test("literal-bound scalar lets work in literal-required positions") {
    val c2 = new Catalog(spark)
    c2.register("u", Seq(("hello", 23.0)).toDF("s", "x"))
    val r = Kql.run(spark, c2,
      """let sub = 'l'; let w = 10.0; let a = 5.0;
        |u | project n = countof(s, sub), b = bin_at(x, w, a)""".stripMargin)
      .collect().head
    assert(r.getLong(0) == 2L)
    assert(r.getDouble(1) == 15.0)
  }
}
