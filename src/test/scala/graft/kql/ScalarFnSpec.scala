package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The round-4 scalar/aggregate surface: null/empty fns, math fns (the
  * libm-backed ones are pinned HERE, not in the DuckDB gate — their last
  * ulp is libm-specific), split/indexof/array_length/strcat_delim, the
  * extended datetime fns (Sunday-start weeks, boundary-crossing
  * datetime_diff), and make_list/make_set/arg_max/arg_min/stdev/variance.
  */
class ScalarFnSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("t", Seq(
      (1L, "a,b,,c", Some("x"), 4.0, "g1"),
      (2L, "", None: Option[String], 16.0, "g1"),
      (3L, "no-commas", Some(""), 25.0, "g2")
    ).toDF("id", "s", "opt", "x", "g"))
    c.register("ts", Seq(
      // 2024-01-07 is a Sunday; 2024-01-08 a Monday
      (1L, java.sql.Timestamp.valueOf("2024-01-08 13:45:30")),
      (2L, java.sql.Timestamp.valueOf("2024-01-07 00:00:00")),
      (3L, java.sql.Timestamp.valueOf("2024-01-13 23:59:59"))
    ).toDF("id", "at"))
    c
  }

  private def one(kql: String): org.apache.spark.sql.Row =
    Kql.run(spark, cat, kql).collect().head

  // ── null/empty ──

  test("isnull / isnotnull / isempty / isnotempty") {
    val r = one(
      """t | where id == 2
        | | project a = isnull(opt), b = isnotnull(s), c = isempty(s), d = isnotempty(s)""".stripMargin)
    assert(r.getBoolean(0))  // opt is null
    assert(r.getBoolean(1))  // s is "" — not null
    assert(r.getBoolean(2))  // "" is empty
    assert(!r.getBoolean(3))
  }

  test("isempty treats null and empty string alike") {
    val r = one("t | where id == 3 | project a = isempty(opt)")
    assert(r.getBoolean(0)) // Some("") — empty string
  }

  test("coalesce skips empty strings, not just nulls") {
    val r = one(
      """t | where id == 3
        | | project a = coalesce(opt, s), b = coalesce(opt, '', 'fallback')""".stripMargin)
    assert(r.getString(0) == "no-commas") // opt is "" → skipped
    assert(r.getString(1) == "fallback")
  }

  // ── math ──

  test("libm-backed math fns match the JVM values") {
    val r = one(
      """t | where id == 2
        | | project a = log(x), b = log2(x), c = log10(x), d = sqrt(x),
        |           e = exp(0.0), f = pow(x, 0.5)""".stripMargin)
    assert(r.getDouble(0) == math.log(16.0))
    assert(r.getDouble(1) == 4.0)
    assert(r.getDouble(2) == math.log10(16.0))
    assert(r.getDouble(3) == 4.0)
    assert(r.getDouble(4) == 1.0)
    assert(r.getDouble(5) == 4.0)
  }

  test("abs keeps int-ness; round takes an optional precision; sign") {
    val r = one(
      """t | where id == 1
        | | project a = abs(0 - 7), b = round(2.567, 2), c = round(2.5),
        |           d = sign(0.0 - 3.5), e = sign(0.0)""".stripMargin)
    assert(r.getLong(0) == 7L)
    assert(r.getDouble(1) == 2.57)
    assert(r.getDouble(2) == 3.0) // positive halves round up
    assert(r.getDouble(3) == -1.0)
    assert(r.getDouble(4) == 0.0)
  }

  test("trig family matches the JVM values") {
    val r = one(
      """t | where id == 2
        | | project a = sin(1.0), b = cos(1.0), c = tan(1.0),
        |           d = asin(0.5), e = acos(0.5), f = atan(1.0),
        |           g = atan2(1.0, 2.0), h = cot(1.0)""".stripMargin)
    assert(r.getDouble(0) == math.sin(1.0))
    assert(r.getDouble(1) == math.cos(1.0))
    assert(r.getDouble(2) == math.tan(1.0))
    assert(r.getDouble(3) == math.asin(0.5))
    assert(r.getDouble(4) == math.acos(0.5))
    assert(r.getDouble(5) == math.atan(1.0))
    assert(r.getDouble(6) == math.atan2(1.0, 2.0))
    assert(r.getDouble(7) == 1.0 / math.tan(1.0))
  }

  test("degrees/radians/pi/exp2/exp10 round-trip") {
    val r = one(
      """t | where id == 2
        | | project a = degrees(pi()), b = radians(180.0),
        |           c = exp2(10.0), d = exp10(3.0)""".stripMargin)
    assert(r.getDouble(0) == 180.0)
    assert(r.getDouble(1) == math.Pi)
    assert(r.getDouble(2) == 1024.0)
    assert(r.getDouble(3) == 1000.0)
  }

  test("ceiling keeps the argument's numeric class") {
    val r = one(
      """t | where id == 2
        | | project a = ceiling(1.1), b = ceiling(0.0 - 1.1), c = ceiling(id)""".stripMargin)
    assert(r.getDouble(0) == 2.0)
    assert(r.getDouble(1) == -1.0)
    assert(r.getLong(2) == 2L) // long in → long out, no float detour
  }

  test("asin out of domain is NaN, not an error") {
    val r = one("t | where id == 2 | project a = asin(2.0)")
    assert(r.getDouble(0).isNaN)
  }

  test("% modulo: C-style dividend sign, int stays int, mod-0 is null") {
    val r = one(
      """t | where id == 1
        | | project a = 7 % 3, b = (0 - 7) % 3, c = 7.5 % 2,
        |           d = 7 % 0, e = id % 2""".stripMargin)
    assert(r.getLong(0) == 1L)
    assert(r.getLong(1) == -1L) // sign follows the dividend
    assert(r.getDouble(2) == 1.5)
    assert(r.isNullAt(3)) // row error ⇒ null
    assert(r.getLong(4) == 1L)
  }

  // ── moment aggregates ──

  test("stdevp/variancep use the n denominator") {
    val r = one(
      """t | summarize vp = variancep(x), sp = stdevp(x), v = variance(x)""")
    val xs = Seq(4.0, 16.0, 25.0)
    val mean = xs.sum / 3
    val pop = xs.map(v => (v - mean) * (v - mean)).sum / 3
    assert(math.abs(r.getDouble(0) - pop) < 1e-9)
    assert(math.abs(r.getDouble(1) - math.sqrt(pop)) < 1e-9)
    assert(math.abs(r.getDouble(2) - pop * 3 / 2) < 1e-9)
  }

  test("covariance/covariancep over pairwise rows") {
    val r = one(
      """t | summarize cv = covariance(id, x), cp = covariancep(id, x)""")
    val ids = Seq(1.0, 2.0, 3.0); val xs = Seq(4.0, 16.0, 25.0)
    val mi = ids.sum / 3; val mx = xs.sum / 3
    val cross = ids.zip(xs).map { case (a, b) => (a - mi) * (b - mx) }.sum
    assert(math.abs(r.getDouble(0) - cross / 2) < 1e-9)
    assert(math.abs(r.getDouble(1) - cross / 3) < 1e-9)
  }

  // ── array/string ──

  test("split keeps interior and trailing empties; literal delimiter") {
    val r = one("t | where id == 1 | project n = array_length(split(s, ','))")
    assert(r.getLong(0) == 4L) // a, b, "", c
    val r2 = one("t | where id == 3 | project n = array_length(split(s, ','))")
    assert(r2.getLong(0) == 1L) // no delimiter: whole string
  }

  test("split with index is 0-based; out of range is null not error") {
    val r = one(
      """t | where id == 1
        | | project a = split(s, ',', 0), b = split(s, ',', 2), c = split(s, ',', 9)""".stripMargin)
    assert(r.getString(0) == "a")
    assert(r.getString(1) == "")
    assert(r.isNullAt(2))
  }

  test("indexof is 0-based with -1 for absent") {
    val r = one(
      """t | where id == 1
        | | project a = indexof(s, 'b'), b = indexof(s, 'zz')""".stripMargin)
    assert(r.getLong(0) == 2L)
    assert(r.getLong(1) == -1L)
  }

  test("strcat_delim skips nulls entirely (concat_ws semantics)") {
    val r = one(
      """t | where id == 2
        | | project a = strcat_delim('-', 'x', opt, 'y')""".stripMargin)
    assert(r.getString(0) == "x-y") // null middle arg: no doubled delimiter
  }

  // ── datetime ──

  test("startofweek truncates to the preceding SUNDAY (KQL convention)") {
    val mon = one("ts | where id == 1 | project w = startofweek(at), dw = dayofweek(at)")
    assert(mon.getTimestamp(0) ==
      java.sql.Timestamp.valueOf("2024-01-07 00:00:00"))
    assert(mon.getLong(1) == 1L) // Monday = 1 (Sunday = 0)
    val sun = one("ts | where id == 2 | project w = startofweek(at), dw = dayofweek(at)")
    assert(sun.getTimestamp(0) ==
      java.sql.Timestamp.valueOf("2024-01-07 00:00:00")) // Sunday is its own week start
    assert(sun.getLong(1) == 0L)
  }

  test("startofmonth / startofyear / endofday / weekofyear") {
    val r = one(
      """ts | where id == 1
        | | project m = startofmonth(at), y = startofyear(at), e = endofday(at), wy = weekofyear(at)""".stripMargin)
    assert(r.getTimestamp(0) == java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    assert(r.getTimestamp(1) == java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    assert(r.getTimestamp(2).toInstant ==
      java.time.Instant.parse("2024-01-08T23:59:59.999999Z"))
    assert(r.getLong(3) == 2L) // ISO week 2
  }

  test("datetime_diff counts period BOUNDARIES crossed, not elapsed units") {
    val r = one(
      """ts | where id == 3
        | | project y = datetime_diff('year', at, datetime(2023-12-31)),
        |           d = datetime_diff('day', at, datetime(2024-01-13 23:00:00)),
        |           h = datetime_diff('hour', at, datetime(2024-01-13 23:00:00)),
        |           mo = datetime_diff('month', at, datetime(2023-11-15))""".stripMargin)
    assert(r.getLong(0) == 1L) // one year boundary despite <1 elapsed year
    assert(r.getLong(1) == 0L) // same day
    assert(r.getLong(2) == 0L) // same hour
    assert(r.getLong(3) == 2L) // Nov → Jan crosses two month boundaries
  }

  // ── aggregates ──

  test("make_list sorts and drops nulls; make_set dedups") {
    val df = Kql.run(spark, cat,
      "t | summarize l = make_list(opt), s2 = make_set(g)")
    val r = df.collect().head
    assert(r.getSeq[String](0) == Seq("", "x")) // null dropped, sorted
    assert(r.getSeq[String](1) == Seq("g1", "g2"))
  }

  test("arg_max / arg_min with a total tie rule") {
    val c2 = new Catalog(spark)
    c2.register("u", Seq(
      ("a", 10.0, 1L), ("a", 10.0, 5L), ("a", 3.0, 9L),
      ("b", 2.0, 7L)
    ).toDF("k", "v", "ret"))
    val r = Kql.run(spark, c2,
      """u | summarize am = arg_max(v, ret), an = arg_min(v, ret) by k
        |  | sort by k asc""".stripMargin).collect()
    assert(r(0).getLong(1) == 5L) // max v=10 twice → larger ret wins
    assert(r(0).getLong(2) == 9L) // min v=3 unique
    assert(r(1).getLong(1) == 7L)
  }

  test("stdev / variance are the sample (n-1) forms") {
    val r = one("t | summarize sd = stdev(x), va = variance(x)")
    // values 4, 16, 25: mean 15, var = ((-11)^2 + 1 + 10^2)/2 = 111
    assert(math.abs(r.getDouble(1) - 111.0) < 1e-9)
    assert(math.abs(r.getDouble(0) - math.sqrt(111.0)) < 1e-9)
  }

  test("conditional aggregates skip non-matching rows") {
    val c2 = new Catalog(spark)
    c2.register("u", Seq(
      ("a", 10L), ("a", 20L), ("b", 30L), ("b", 40L), ("b", 40L)
    ).toDF("k", "v"))
    val r = Kql.run(spark, c2,
      """u | summarize s = sumif(v, k == 'a'), av = avgif(v, k == 'b'),
        |             mn = minif(v, k == 'b'), mx = maxif(v, k == 'a'),
        |             dc = dcountif(v, k == 'b'),
        |             zero = sumif(v, k == 'zzz'), none = maxif(v, k == 'zzz')""".stripMargin)
      .collect().head
    assert(r.getDouble(0) == 30.0)
    assert(r.getDouble(1) == 110.0 / 3.0)
    assert(r.getLong(2) == 30L)
    assert(r.getLong(3) == 20L)
    assert(r.getLong(4) == 2L)   // distinct {30, 40}
    assert(r.getDouble(5) == 0.0) // sumif over nothing: 0.0, not null
    assert(r.isNullAt(6))         // maxif over nothing: null
  }

  test("getschema emits one metadata row per column") {
    val rows = Kql.run(spark, cat,
      "t | getschema | sort by ColumnOrdinal asc").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getString(3))).toSeq ==
      Seq(("id", 0L, "long"), ("s", 1L, "string"), ("opt", 2L, "string"),
        ("x", 3L, "real"), ("g", 4L, "string")))
  }

  test("evaluate pivot rotates listed values into aggregated columns") {
    val c2 = new Catalog(spark)
    c2.register("u", Seq(
      ("a", "x", 1L), ("a", "x", 2L), ("a", "y", 5L),
      ("b", "y", 7L)
    ).toDF("k", "typ", "v"))
    val rows = Kql.run(spark, c2,
      """u | evaluate pivot(typ, s = sum(v), 'x', 'y')
        |  | sort by k asc""".stripMargin).collect()
    assert(rows.map(r => (r.getString(0),
      if (r.isNullAt(1)) null else r.getDouble(1),
      if (r.isNullAt(2)) null else r.getDouble(2))).toSeq ==
      Seq(("a", 3.0, 5.0), ("b", null, 7.0)))
  }

  test("parse-where drops rows that miss the pattern") {
    val c2 = new Catalog(spark)
    c2.register("logs", Seq(
      "code=200 ok", "code=404 missing", "no code here"
    ).toDF("line"))
    val rows = Kql.run(spark, c2,
      """logs | parse-where line with "code=" code:long " " word
        |     | sort by code asc""".stripMargin).collect()
    assert(rows.length == 2)
    assert(rows.map(r => (r.getLong(1), r.getString(2))).toSeq ==
      Seq((200L, "ok"), (404L, "missing")))
  }

  test("serialize is a validated no-op: legal after sort, rejected cold") {
    val rn = Kql.run(spark, cat,
      "t | sort by id asc | serialize | extend rn = row_number() | project rn")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(rn == Seq(1L, 2L, 3L))
    val e = intercept[KqlParseException] {
      Kql.run(spark, cat, "t | serialize | extend rn = row_number()")
    }
    assert(e.getMessage.contains("sort"))
  }

  test("union withsource stamps each branch with its scan name") {
    val c2 = new Catalog(spark)
    c2.register("alpha", Seq(1L, 2L).toDF("v"))
    c2.register("beta", Seq(3L).toDF("v"))
    val rows = Kql.run(spark, c2,
      "alpha | union withsource=origin (beta) | sort by v asc").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "alpha"), (2L, "alpha"), (3L, "beta")))
  }

  test("chained union withsource labels each row's true origin") {
    // a row that arrived via an EARLIER `union beta` must be labeled
    // 'beta', not the pipeline head 'alpha' (ADVICE round-4 finding)
    val c2 = new Catalog(spark)
    c2.register("alpha", Seq(1L).toDF("v"))
    c2.register("beta", Seq(2L).toDF("v"))
    c2.register("gamma", Seq(3L).toDF("v"))
    val rows = Kql.run(spark, c2,
      "alpha | union (beta) | union withsource=origin (gamma) | sort by v asc")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
  }

  test("plain chained unions leave no provenance column behind") {
    val c2 = new Catalog(spark)
    c2.register("alpha", Seq(1L).toDF("v"))
    c2.register("beta", Seq(2L).toDF("v"))
    val df = Kql.run(spark, c2, "alpha | union (beta)")
    assert(df.columns.toSeq == Seq("v"))
    // and distinct across branches is unaffected by hidden state
    val c3 = new Catalog(spark)
    c3.register("a1", Seq(7L).toDF("v"))
    c3.register("a2", Seq(7L).toDF("v"))
    assert(Kql.run(spark, c3, "a1 | union (a2) | distinct v").count() == 1L)
  }

  test("a column shadows a scalar let of the same name (innermost scope)") {
    // Kusto resolves the innermost scope: after `extend x = …` the name x
    // is the COLUMN, not the let binding (ADVICE round-4 finding)
    val c2 = new Catalog(spark)
    c2.register("u", Seq((1L, 10.0), (2L, 2.0)).toDF("id", "y"))
    val rows = Kql.run(spark, c2,
      """let x = 5;
        |u | extend x = y | where x > 3 | project id, x2 = x * 2
        |  | sort by id asc""".stripMargin).collect()
    // let-wins would compare 5 > 3 (keeps both rows) and emit x2 = 10
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq == Seq((1L, 20.0)))
    // where no column of that name exists, the let still applies
    val r2 = Kql.run(spark, c2,
      "let x = 5; u | where y > x | project id").collect()
    assert(r2.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("scalar let bindings substitute into expressions") {
    val r = one(
      """let lo = 2; let cap = strcat('v', '!');
        |t | where id >= lo | project a = id * lo, b = cap
        |  | sort by a asc""".stripMargin)
    assert(r.getLong(0) == 4L)
    assert(r.getString(1) == "v!")
  }

  test("scalar lets compose with query lets and shadow columns") {
    val rows = Kql.run(spark, cat,
      """let thresh = 10.0;
        |let big = (t | where x >= thresh);
        |big | project id | sort by id asc""".stripMargin).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 3L)) // x = 16, 25
  }

  test("multi-key join matches conjunctively and drops any-null keys") {
    val c2 = new Catalog(spark)
    c2.register("l", Seq(
      (1L, "a", 10L), (1L, "b", 20L), (2L, "a", 30L)
    ).toDF("k1", "k2", "lv"))
    c2.register("r", Seq(
      (1L, "a", 100L), (1L, "b", 200L), (9L, "a", 900L)
    ).toDF("k1", "k2", "rv"))
    val rows = Kql.run(spark, c2,
      """l | join kind=inner (r) on $left.k1 == $right.k1, $left.k2 == $right.k2
        |  | project k1, k2, lv, rv | sort by k1 asc, k2 asc""".stripMargin)
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3))).toSeq ==
      Seq((1L, "a", 10L, 100L), (1L, "b", 20L, 200L)))
  }

  test("datatable builds a typed inline table") {
    val rows = Kql.run(spark, new Catalog(spark),
      """datatable (k: string, v: long, w: real, ok: bool, at: datetime)
        |  ['a', 1, 1.5, true, datetime(2024-01-01),
        |   'b', -2, 0.5, false, datetime(2024-02-01)]
        | | sort by k asc""".stripMargin).collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "a")
    assert(rows(0).getLong(1) == 1L)
    assert(rows(0).getDouble(2) == 1.5)
    assert(rows(0).getBoolean(3))
    assert(rows(1).getLong(1) == -2L)
    assert(rows(1).getTimestamp(4) ==
      java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
  }

  test("datatable value-count mismatch is a parse error") {
    val e = intercept[KqlParseException] {
      Kql.run(spark, new Catalog(spark),
        "datatable (a: long, b: long) [1, 2, 3] | count")
    }
    assert(e.getMessage.contains("multiple"))
  }

  test("datatable type mismatches fail at compile, not in the executor") {
    for (bad <- Seq(
      "datatable (a: long) ['x'] | count",
      "datatable (a: long) [1.5] | count",
      "datatable (d: datetime) [5] | count")) {
      val e = intercept[KqlParseException] {
        Kql.run(spark, new Catalog(spark), bad).collect()
      }
      assert(e.getMessage.contains("does not fit"), bad)
    }
  }

  test("range rejects mixed bound types and mismatched steps") {
    for (bad <- Seq(
      "range x from 0 to datetime(2024-01-01) step 1",
      "range x from datetime(2024-01-01) to datetime(2024-01-02) step 1",
      "range x from 1 to 10 step 1h")) {
      intercept[KqlParseException] { Kql.run(spark, cat, bad) }
    }
  }

  test("pivot with conditional/arg aggregates keeps group granularity") {
    val c2 = new Catalog(spark)
    c2.register("u", Seq(
      ("a", "x", 1L), ("a", "x", -2L), ("a", "y", 5L), ("b", "y", 7L)
    ).toDF("k", "typ", "v"))
    val rows = Kql.run(spark, c2,
      """u | evaluate pivot(typ, s = sumif(v, v > 0), 'x', 'y')
        |  | sort by k asc""".stripMargin).collect()
    // v must leave the group-by: one row per k, not per (k, v)
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "a" && rows(0).schema.fieldNames.toSeq ==
      Seq("k", "x", "y"))
    assert(rows(0).getDouble(1) == 1.0 && rows(0).getDouble(2) == 5.0)
  }

  test("union withsource labels are immune to joins inside branches") {
    val c2 = new Catalog(spark)
    c2.register("alpha", Seq((1L, 1L)).toDF("v", "k"))
    c2.register("beta", Seq((2L, 1L)).toDF("v", "k"))
    c2.register("gamma", Seq(1L).toDF("k"))
    val rows = Kql.run(spark, c2,
      """alpha
        | | join kind=inner (gamma) on k
        | | union withsource=src (beta | join kind=inner (gamma) on k)
        | | sort by v asc""".stripMargin).collect()
    val srcIdx = rows.head.schema.fieldIndex("src")
    assert(rows.map(_.getString(srcIdx)).toSeq == Seq("alpha", "beta"))
  }

  test("=~ / !~ / in~ compare case-insensitively") {
    val c2 = new Catalog(spark)
    c2.register("u", Seq("Alpha", "BETA", "gamma").toDF("s"))
    assert(Kql.run(spark, c2, "u | where s =~ 'alpha' | count")
      .as[Long].head() == 1L)
    assert(Kql.run(spark, c2, "u | where s !~ 'ALPHA' | count")
      .as[Long].head() == 2L)
    assert(Kql.run(spark, c2, "u | where s in~ ('beta', 'GAMMA') | count")
      .as[Long].head() == 2L)
  }

  test("has_any / has_all are whole-phrase, case-insensitive") {
    val c2 = new Catalog(spark)
    c2.register("u", Seq(
      "the Spark engine", "a window function", "sparkle and win"
    ).toDF("s"))
    assert(Kql.run(spark, c2,
      "u | where s has_any ('spark', 'window') | count").as[Long].head() == 2L)
    val all = Kql.run(spark, c2,
      "u | where s has_all ('spark', 'engine') | count").as[Long].head()
    assert(all == 1L) // 'sparkle' is not the phrase 'spark'
  }

  test("todynamic parses JSON text into a variant; bad input is null") {
    val c2 = new Catalog(spark)
    c2.register("u", Seq(
      (1L, """{"a": 5, "b": {"c": "x"}}"""), (2L, "not json")
    ).toDF("id", "j"))
    val rows = Kql.run(spark, c2,
      """u | extend d = todynamic(j)
        |  | project id, a = toint(d.a), c = tostring(d.b.c), ok = exists(d)
        |  | sort by id asc""".stripMargin).collect()
    assert(rows(0).getLong(1) == 5L)
    assert(rows(0).getString(2) == "x")
    assert(rows(0).getBoolean(3))
    assert(rows(1).isNullAt(1) && !rows(1).getBoolean(3))
  }

  test("lookup defaults to a left-outer dimension join") {
    val c2 = new Catalog(spark)
    c2.register("facts", Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v"))
    c2.register("dim", Seq((1L, "one"), (2L, "two")).toDF("k", "name"))
    val rows = Kql.run(spark, c2,
      "facts | lookup (dim) on k | project v, name | sort by v asc").collect()
    assert(rows.length == 3)
    assert(rows(2).isNullAt(1)) // unmatched fact survives with null name
  }

  test("lookup keeps null-key rows, drops right key cols, limits kinds") {
    val c2 = new Catalog(spark)
    c2.register("facts", Seq(
      (Some(1L), 10L), (None: Option[Long], 99L)).toDF("k", "v"))
    c2.register("dim", Seq((1L, "one")).toDF("dk", "name"))
    val df = Kql.run(spark, c2,
      """facts | lookup (dim) on $left.k == $right.dk
        |      | sort by v asc""".stripMargin)
    // right key column dk is dropped from the output (KQL lookup)
    assert(df.columns.toSeq == Seq("k", "v", "name"))
    val rows = df.collect()
    assert(rows.length == 2)       // the null-key fact SURVIVES…
    assert(rows(1).isNullAt(2))    // …unmatched
    intercept[KqlParseException] { // and exotic kinds are rejected
      Kql.run(spark, c2, "facts | lookup kind=rightanti (dim) on $left.k == $right.dk")
    }
  }

  test("!~ and !in~ keep null rows (null-safe like != / !in)") {
    val c2 = new Catalog(spark)
    c2.register("u", Seq(Some("Alpha"), None: Option[String]).toDF("s"))
    // the null row is NOT equal to 'alpha', so negation keeps it
    assert(Kql.run(spark, c2, "u | where s !~ 'alpha' | count")
      .as[Long].head() == 1L)
    assert(Kql.run(spark, c2, "u | where s !in~ ('alpha') | count")
      .as[Long].head() == 1L)
  }

  test("render round-trips the new functions") {
    import Expr._
    assert(Render.expr(NullFn("coalesce", Seq(Field(FieldPath.simple("a")),
      StrLit("z")))) == "coalesce(a, 'z')")
    assert(Render.expr(MathFn("pow", Seq(IntLit(2), IntLit(8)))) == "pow(2, 8)")
    assert(Render.expr(DtDiff("day", Field(FieldPath.simple("a")),
      Field(FieldPath.simple("b")))) == "datetime_diff('day', a, b)")
    assert(Render.agg(Aggregation.ArgMax(FieldPath.simple("v"),
      FieldPath.simple("r"))) == "arg_max(v, r)")
  }
}
