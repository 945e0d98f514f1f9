package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Round-6 scalar batches: IPv4 family, hash(), datetime batch 3
  * (getters + period ends), string batch 3 (reverse/strrep/regex trims).
  */
class Round6FnSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("t1", Seq(Tuple1(1L)).toDF("one"))
    c
  }

  private def scalar(expr: String): Any =
    Kql.run(spark, cat, s"t1 | project r = $expr").collect()(0).get(0)

  test("parse_ipv4: dotted quad, malformed forms null") {
    assert(scalar("parse_ipv4('192.168.1.1')") == 3232235777L)
    assert(scalar("parse_ipv4('0.0.0.0')") == 0L)
    assert(scalar("parse_ipv4('255.255.255.255')") == 4294967295L)
    assert(scalar("parse_ipv4('256.1.1.1')") == null)   // octet > 255
    assert(scalar("parse_ipv4('1.2.3')") == null)       // 3 fields
    assert(scalar("parse_ipv4('1.2.3.4.5')") == null)   // 5 fields
    assert(scalar("parse_ipv4('a.b.c.d')") == null)
    assert(scalar("parse_ipv4('')") == null)
  }

  test("format_ipv4 round-trips longs and dotted strings") {
    assert(scalar("format_ipv4(3232235777)") == "192.168.1.1")
    assert(scalar("format_ipv4('10.1.2.3')") == "10.1.2.3")
    assert(scalar("format_ipv4(4294967296)") == null) // > 32 bits
    assert(scalar("format_ipv4(-1)") == null)
  }

  test("round-8: ipv4_is_in_any_range, has_ipv4 family, replace_strings") {
    assert(scalar(
      "ipv4_is_in_any_range('10.8.1.2', '192.168.0.0/16', '10.8.0.0/13')")
      == true)
    assert(scalar(
      "ipv4_is_in_any_range('10.16.0.0', '192.168.0.0/16', '10.8.0.0/13')")
      == false)
    assert(scalar(
      "ipv4_is_in_any_range('10.8.1.2', 'junk', '10.8.0.0/13')") == null)
    // delimited-term rule: digits/dots on either side disqualify
    assert(scalar("has_ipv4('src=1.2.3.4 end', '1.2.3.4')") == true)
    assert(scalar("has_ipv4('x=11.2.3.4', '1.2.3.4')") == false)
    assert(scalar("has_ipv4('x=1.2.3.45', '1.2.3.4')") == false)
    assert(scalar("has_ipv4('x=1.2.3.4.5', '1.2.3.4')") == false)
    assert(scalar("has_ipv4('ip 999.2.3.4 here', '999.2.3.4')") == false)
    assert(scalar(
      "has_any_ipv4('a 8.8.8.8 b', '1.1.1.1', '8.8.8.8')") == true)
    assert(scalar(
      "has_any_ipv4('a 8.8.8.8 b', '1.1.1.1', '9.9.9.9')") == false)
    assert(scalar("has_ipv4_prefix('src=10.20.30.40', '10.20.')") == true)
    assert(scalar("has_ipv4_prefix('src=110.20.30.40', '10.20.')") == false)
    // ADX delimiters are NON-ALPHANUMERIC: letters disqualify too
    assert(scalar("has_ipv4('abc1.2.3.4def', '1.2.3.4')") == false)
    assert(scalar("has_ipv4('abc 1.2.3.4 def', '1.2.3.4')") == true)
    assert(scalar("has_ipv4_prefix('x10.20.30.40', '10.20.')") == false)
    // a prefix with regex metacharacters is an invalid ipv4 prefix →
    // false, never a regex compile error
    assert(scalar("has_ipv4_prefix('src=10.20.30.40', '10.(')") == false)
    assert(scalar("has_ipv4_prefix('a[+b', '[+')") == false)
    // sequential left-to-right; later pairs see earlier rewrites
    assert(scalar(
      "replace_strings('A_B_C', pack_array('A', 'X_B'), " +
        "pack_array('X', 'Y'))") == "Y_C")
    assert(scalar(
      "replace_strings('abc', pack_array('a', 'b'), pack_array('x'))")
      == null) // length mismatch
  }

  test("ipv4_is_in_range: prefix math, default /32, invalid → null") {
    assert(scalar("ipv4_is_in_range('10.8.1.2', '10.8.0.0/13')") == true)
    assert(scalar("ipv4_is_in_range('10.15.255.255', '10.8.0.0/13')") == true)
    assert(scalar("ipv4_is_in_range('10.16.0.0', '10.8.0.0/13')") == false)
    assert(scalar("ipv4_is_in_range('1.2.3.4', '1.2.3.4')") == true)   // /32
    assert(scalar("ipv4_is_in_range('1.2.3.5', '1.2.3.4')") == false)
    assert(scalar("ipv4_is_in_range('1.2.3.4', '0.0.0.0/0')") == true) // /0
    assert(scalar("ipv4_is_in_range('bad', '10.0.0.0/8')") == null)
    assert(scalar("ipv4_is_in_range('1.2.3.4', '10.0.0.0/33')") == null)
  }

  test("ipv4_is_private: RFC1918 blocks") {
    assert(scalar("ipv4_is_private('10.200.3.4')") == true)
    assert(scalar("ipv4_is_private('172.16.0.1')") == true)
    assert(scalar("ipv4_is_private('172.31.255.255')") == true)
    assert(scalar("ipv4_is_private('172.32.0.1')") == false)
    assert(scalar("ipv4_is_private('192.168.0.1')") == true)
    assert(scalar("ipv4_is_private('192.169.0.1')") == false)
    assert(scalar("ipv4_is_private('8.8.8.8')") == false)
    assert(scalar("ipv4_is_private('nope')") == null)
  }

  test("hash(): xxhash64 with optional non-negative mod") {
    import org.apache.spark.sql.functions.{lit, xxhash64}
    val expect = spark.range(1).select(xxhash64(lit(7L))).collect()(0).getLong(0)
    assert(scalar("hash(tolong(7))") == expect)
    val m = scalar("hash(tolong(7), 5)").asInstanceOf[Long]
    assert(m == ((expect % 5) + 5) % 5 && m >= 0)
    // strings hash too (engine-side only; the gate oracles the long path)
    assert(scalar("hash('abc')").isInstanceOf[Long])
  }

  test("datetime getters: getyear/getmonth/dayofyear") {
    assert(scalar("getyear(datetime(2024-02-29 10:00:00))") == 2024L)
    assert(scalar("getmonth(datetime(2024-02-29 10:00:00))") == 2L)
    assert(scalar("dayofyear(datetime(2024-02-29 10:00:00))") == 60L)
    assert(scalar("dayofyear(datetime(2023-12-31 23:59:59))") == 365L)
  }

  test("startofquarter / endofmonth / endofyear / endofweek") {
    def ts(e: String): String = String.valueOf(scalar(s"tostring($e)"))
    assert(ts("startofquarter(datetime(2024-05-15 12:00:00))")
      .startsWith("2024-04-01 00:00:00"))
    // endofmonth of Jan 31 is Jan 31's own last tick — the add_months
    // clamp (Jan 31 + 1mo → Feb 29) must not skip into March
    assert(ts("endofmonth(datetime(2024-01-31 05:00:00))")
      .startsWith("2024-01-31 23:59:59"))
    assert(ts("endofmonth(datetime(2024-02-10 05:00:00))")
      .startsWith("2024-02-29 23:59:59"))
    assert(ts("endofyear(datetime(2024-12-31 00:00:01))")
      .startsWith("2024-12-31 23:59:59"))
    // 2024-05-15 is a Wednesday; KQL weeks end Saturday
    assert(ts("endofweek(datetime(2024-05-15 12:00:00))")
      .startsWith("2024-05-18 23:59:59"))
  }

  test("reverse and strrep") {
    assert(scalar("reverse('abc')") == "cba")
    assert(scalar("strrep('ab', 3)") == "ababab")
    assert(scalar("strrep('ab', 3, '-')") == "ab-ab-ab")
    assert(scalar("strrep('ab', 1, '-')") == "ab")
    assert(scalar("strrep('ab', 0)") == "")
  }

  test("array shifts: fill defaults to null, negative counts reverse direction") {
    def arr(e: String): Seq[Any] =
      Kql.run(spark, cat, s"t1 | project r = $e").collect()(0).getSeq[Any](0)
    assert(arr("array_shift_left(pack_array(1, 2, 3, 4), 1)") ==
      Seq(2L, 3L, 4L, null))
    assert(arr("array_shift_left(pack_array(1, 2, 3, 4), -1, 9)") ==
      Seq(9L, 1L, 2L, 3L))
    assert(arr("array_shift_right(pack_array(1, 2, 3, 4), 2, 0)") ==
      Seq(0L, 0L, 1L, 2L))
    assert(arr("array_shift_left(pack_array(1, 2), 5)") == Seq(null, null))
  }

  test("array rotations wrap circularly, negative counts reverse") {
    def arr(e: String): Seq[Any] =
      Kql.run(spark, cat, s"t1 | project r = $e").collect()(0).getSeq[Any](0)
    assert(arr("array_rotate_left(pack_array(1, 2, 3, 4), 1)") ==
      Seq(2L, 3L, 4L, 1L))
    assert(arr("array_rotate_right(pack_array(1, 2, 3, 4), 1)") ==
      Seq(4L, 1L, 2L, 3L))
    assert(arr("array_rotate_left(pack_array(1, 2, 3), 5)") ==
      Seq(3L, 1L, 2L))
    assert(arr("array_rotate_left(pack_array(1, 2, 3), -1)") ==
      Seq(3L, 1L, 2L))
  }

  test("array_iff: element-wise pick, scalar broadcast, short-array null pad") {
    def arr(e: String): Seq[Any] =
      Kql.run(spark, cat, s"t1 | project r = $e").collect()(0).getSeq[Any](0)
    assert(arr("array_iff(pack_array(true, false, true), pack_array(1, 2, 3), pack_array(7, 8, 9))") ==
      Seq(1L, 8L, 3L))
    // scalar branches broadcast per element
    assert(arr("array_iff(pack_array(true, false), 5, 6)") == Seq(5L, 6L))
    // when_true shorter than cond: out-of-bounds picks null
    assert(arr("array_iff(pack_array(true, true, false), pack_array(1), pack_array(7, 8, 9))") ==
      Seq(1L, null, 9L))
  }

  test("min_of/max_of: variadic extrema, nulls ignored, integral stays long") {
    assert(scalar("min_of(3, 1, 2)") == 1L)
    assert(scalar("max_of(3, 1, 2)") == 3L)
    assert(scalar("min_of(3.5, 1)") == 1.0)
    assert(scalar("min_of(toint('x'), 5)") == 5L) // null ignored
  }

  test("isnan / isinf / isfinite partition the double line") {
    // NaN via pow(-1, 0.5) — log(-1) is null in this engine (error-drop)
    assert(scalar("isnan(pow(-1.0, 0.5))") == true)
    assert(scalar("isnan(1.5)") == false)
    assert(scalar("isinf(1.0 / 0)") == false) // our ÷0 is null, not inf
    assert(scalar("isinf(exp(1000.0))") == true)
    assert(scalar("isfinite(2.5)") == true)
    assert(scalar("isfinite(pow(-1.0, 0.5))") == false)
    assert(scalar("isfinite(toint('x'))") == false) // null → not finite
    assert(scalar("isnan(toint('x'))") == false)
  }

  test("repeat / zip / scalar range / set_has_element / bag_has_key") {
    def arr(e: String): Seq[Any] =
      Kql.run(spark, cat, s"t1 | project r = $e").collect()(0).getSeq[Any](0)
    assert(arr("repeat(7, 3)") == Seq(7L, 7L, 7L))
    assert(arr("repeat('x', 0)") == Seq())
    assert(arr("repeat('x', -2)") == Seq()) // negative count → empty, no throw
    assert(scalar("strrep('ab', -1)") == "")
    assert(arr("range(2, 8, 3)") == Seq(2L, 5L, 8L)) // inclusive stop
    assert(arr("range(1, 3)") == Seq(1L, 2L, 3L))
    assert(arr("range(3, 1, -1)") == Seq(3L, 2L, 1L)) // descending
    // direction mismatch → empty (never a thrown job); zero step → null
    assert(arr("range(5, 1, 1)") == Seq())
    assert(scalar("range(1, 5, 0)") == null)
    assert(scalar("range(toint('x'), 5)") == null)
    assert(arr("zip(pack_array(1, 2), pack_array(7, 8))") ==
      Seq(Seq(1L, 7L), Seq(2L, 8L)))
    // shorter array null-pads to the longest
    assert(arr("zip(pack_array(1, 2, 3), pack_array(7))") ==
      Seq(Seq(1L, 7L), Seq(2L, null), Seq(3L, null)))
    assert(scalar("set_has_element(pack_array(1, 2, 3), 2)") == true)
    assert(scalar("set_has_element(pack_array(1, 2, 3), 9)") == false)
    assert(scalar("bag_has_key(bag_pack('a', 1, 'b', 2), 'b')") == true)
    assert(scalar("bag_has_key(bag_pack('a', 1), 'z')") == false)
  }

  test("arg_max multi-return and star expand the winning row") {
    val q = """datatable (k: string, a: long, b: long, c: string)
      [ 'x', 1, 10, 'p', 'x', 5, 20, 'q', 'y', 3, 30, 'r' ]"""
    val multi = Kql.run(spark, cat,
      s"$q | summarize arg_max(a, b, c) by k | sort by k asc")
    assert(multi.columns.toSeq == Seq("k", "b", "c"))
    assert(multi.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq(("x", 20L, "q"), ("y", 30L, "r")))
    val star = Kql.run(spark, cat,
      s"$q | summarize arg_min(a, *) by k | sort by k asc")
    assert(star.columns.toSeq == Seq("k", "a", "b", "c"))
    assert(star.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq ==
      Seq(("x", 1L, 10L, "p"), ("y", 3L, 30L, "r")))
    // single-return form is untouched (named output, total tie rule)
    val one = Kql.run(spark, cat,
      s"$q | summarize m = arg_max(a, c) by k | sort by k asc")
    assert(one.columns.toSeq == Seq("k", "m"))
  }

  test("parse_version packs up to four parts into a comparable long") {
    assert(scalar("parse_version('1.2.3.4')") == 1000200030004L)
    assert(scalar("parse_version('1.2')") == 1000200000000L) // missing → 0
    assert(scalar("parse_version('10')") == 10000000000000L)
    // ordering: 1.10.0 > 1.9.3
    assert(scalar("parse_version('1.10.0') > parse_version('1.9.3')") == true)
    assert(scalar("parse_version('1.2.3.4.5')") == null) // five parts
    assert(scalar("parse_version('1.x')") == null)
    assert(scalar("parse_version('')") == null)
    assert(scalar("parse_version('1.10000')") == null) // part > 9999
  }

  test("column_ifexists resolves against the schema, else the default") {
    assert(scalar("column_ifexists(one, -5)") == 1L)     // t1 has `one`
    assert(scalar("column_ifexists('one', -5)") == 1L)   // string form
    assert(scalar("column_ifexists(nosuch, -5)") == -5L)
    assert(scalar("column_ifexists('nosuch', 'd')") == "d")
    // composes inside expressions
    assert(scalar("column_ifexists(nosuch, 2) + column_ifexists(one, 0)") == 3L)
  }

  test("make_bag merges bags shallowly with a deterministic winner") {
    val q = """datatable (g: long, j: string) [
      1, '{"a": 5, "b": 1}', 1, '{"a": 40, "c": 2}', 1, '[9]',
      2, '{"z": 0}' ]"""
    val df = Kql.run(spark, cat,
      s"""$q | extend b = todynamic(j)
         | | summarize m = make_bag(b) by g
         | | project g, ms = tostring(m) | sort by g asc""".stripMargin)
    val got = df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // key 'a' collides: '{"a":40,…' < '{"a":5,…' in text order → 40 wins;
    // the non-object [9] is skipped; keys come out sorted
    assert(got == Seq((1L, """{"a":40,"b":1,"c":2}"""), (2L, """{"z":0}""")))
  }

  test("make_bag_if filters; all-filtered group yields an empty bag") {
    val q = """datatable (g: long, j: string) [
      1, '{"a": 1}', 1, '{"b": 2}', 2, '{"c": 3}' ]"""
    val df = Kql.run(spark, cat,
      s"""$q | extend b = todynamic(j)
         | | summarize m = make_bag_if(b, g == 1) by g
         | | project g, ms = tostring(m) | sort by g asc""".stripMargin)
    val got = df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, """{"a":1,"b":2}"""), (2L, "{}")))
  }

  test("make_bag output composes with field paths and bag_keys") {
    val q = """datatable (g: long, j: string) [ 1, '{"a": 7}' ]"""
    val df = Kql.run(spark, cat,
      s"""$q | extend b = todynamic(j)
         | | summarize m = make_bag(b) by g
         | | project v = tolong(m.a), ks = strcat_array(bag_keys(m), ',')""".stripMargin)
    val r = df.collect()(0)
    assert(r.getLong(0) == 7L && r.getString(1) == "a")
  }

  test("row_rank_dense / row_rank_min rank equal-value runs") {
    val q = """datatable (i: long, t: string)
      [ 1, 'a', 2, 'a', 3, 'b', 4, 'b', 5, 'b', 6, 'a' ]"""
    val df = Kql.run(spark, cat,
      s"""$q | sort by i asc
         | | extend d = row_rank_dense(t), m = row_rank_min(t)
         | | project i, d, m""".stripMargin)
    val got = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // runs: a a | b b b | a — a NEW run restarts the rank even for a
    // previously seen value (run semantics, Kusto's serialized model)
    assert(got == Seq((1L, 1L, 1L), (2L, 1L, 1L), (3L, 2L, 3L),
      (4L, 2L, 3L), (5L, 2L, 3L), (6L, 3L, 6L)))
    val e = intercept[KqlParseException](Kql.run(spark, cat,
      s"$q | extend d = row_rank_dense(t)"))
    assert(e.getMessage.contains("serialized"))
  }

  test("todatetime and totimespan casts") {
    assert(String.valueOf(scalar(
      "tostring(todatetime('2024-02-29 10:30:00'))"))
      .startsWith("2024-02-29 10:30:00"))
    assert(scalar("todatetime('not a date')") == null)
    // timespan text forms → micros-backed timespan; render via division
    assert(scalar("totimespan('01:30:00') / 1m") == 90.0)
    assert(scalar("totimespan('1.02:00:00') / 1h") == 26.0)
    assert(scalar("totimespan('00:00:01.5') / 1ms") == 1500.0)
    assert(scalar("totimespan('90m') / 1h") == 1.5)
    assert(scalar("totimespan('2d') / 1d") == 2.0)
    assert(scalar("totimespan('1.5') / 1d") == 1.5) // plain numeric = days
    assert(scalar("totimespan('junk')") == null)
    // an existing timespan passes through unchanged
    assert(scalar("totimespan(1h) / 1m") == 60.0)
    // the result composes with datetime arithmetic
    assert(String.valueOf(scalar(
      "tostring(todatetime('2024-01-01') + totimespan('1.00:00:00'))"))
      .startsWith("2024-01-02 00:00:00"))
  }

  test("series fills: const, forward, backward") {
    def arr(e: String): Seq[Any] =
      Kql.run(spark, cat, s"t1 | project r = $e").collect()(0).getSeq[Any](0)
    val s = "pack_array(tolong(''), 1, tolong(''), tolong(''), 4, tolong(''))"
    assert(arr(s"series_fill_const($s, -1)") ==
      Seq(-1L, 1L, -1L, -1L, 4L, -1L))
    // forward: leading nulls stay (nothing before); runs carry the last
    assert(arr(s"series_fill_forward($s)") ==
      Seq(null, 1L, 1L, 1L, 4L, 4L))
    // backward: trailing nulls stay; runs take the next
    assert(arr(s"series_fill_backward($s)") ==
      Seq(1L, 1L, 4L, 4L, 4L, null))
    // composition closes every gap deterministically
    assert(arr(s"series_fill_const(series_fill_forward($s), -1)") ==
      Seq(-1L, 1L, 1L, 1L, 4L, 4L))
  }

  test("parse_url decomposes into Kusto's component bag") {
    val s = String.valueOf(scalar(
      "tostring(parse_url('https://u:pw@www.ex.com:8080/a/b?x=1&y=2#frag'))"))
    assert(s ==
      """{"Fragment":"frag","Host":"www.ex.com","Password":"pw",""" +
      """"Path":"/a/b","Port":"8080",""" +
      """"Query Parameters":{"x":"1","y":"2"},""" +
      """"Scheme":"https","Username":"u"}""")
    // missing components are empty strings; no query → empty bag
    val s2 = String.valueOf(scalar(
      "tostring(parse_url('http://h.io/p'))"))
    assert(s2 ==
      """{"Fragment":"","Host":"h.io","Password":"","Path":"/p",""" +
      """"Port":"","Query Parameters":{},"Scheme":"http","Username":""}""")
    // the result is a real variant: field paths and bag_keys compose
    val comp = Kql.run(spark, cat,
      """t1 | extend b = parse_url('https://h/p?k=7')
        | | project sch = tostring(b.Scheme),
        |     ks = strcat_array(bag_keys(b), '|')""".stripMargin).collect()(0)
    assert(comp.getString(0) == "https")
    assert(comp.getString(1) ==
      "Fragment|Host|Password|Path|Port|Query Parameters|Scheme|Username")
  }

  test("evaluate narrow() transposes rows into (Row, Column, Value)") {
    val q = """datatable (a: long, s: string) [ 1, 'x', 2, 'y' ]"""
    val df = Kql.run(spark, cat,
      s"$q | sort by a asc | evaluate narrow() | sort by Row asc, Column asc")
    assert(df.columns.toSeq == Seq("Row", "Column", "Value"))
    assert(df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((0L, "a", "1"), (0L, "s", "x"), (1L, "a", "2"), (1L, "s", "y")))
    // unserialized input is rejected loudly
    val e = intercept[KqlParseException](Kql.run(spark, cat,
      s"$q | evaluate narrow()"))
    assert(e.getMessage.contains("serialized"))
  }

  test("arg_max output collisions and non-summarize star are rejected") {
    val q = "datatable (k: string, a: long, b: long) [ 'x', 1, 2 ]"
    // a star expansion re-emitting the group key collides
    val e = intercept[KqlParseException](Kql.run(spark, cat,
      s"$q | summarize arg_max(a, b, b) by k"))
    assert(e.getMessage.contains("more than once"))
    val e2 = intercept[KqlParseException](Kql.run(spark, cat,
      s"$q | make-series m = arg_max(a, *) on a step 1"))
    assert(e2.getMessage.contains("summarize-only"))
  }

  test("gettype names types at runtime, per variant row") {
    assert(scalar("gettype(1)") == "long")
    assert(scalar("gettype(1.5)") == "real")
    assert(scalar("gettype('s')") == "string")
    assert(scalar("gettype(true)") == "bool")
    assert(scalar("gettype(1h)") == "timespan")
    assert(scalar("gettype(datetime(2024-01-01))") == "datetime")
    assert(scalar("gettype(pack_array(1))") == "array")
    assert(scalar("gettype(toint('x'))") == "null")
    // variant rows dispatch individually
    assert(scalar("gettype(todynamic('{\"a\":1}'))") == "dictionary")
    assert(scalar("gettype(todynamic('[1,2]'))") == "array")
    assert(scalar("gettype(todynamic('3'))") == "long")
    assert(scalar("gettype(todynamic('3.5'))") == "real")
    assert(scalar("gettype(todynamic('\"t\"'))") == "string")
    assert(scalar("gettype(todynamic('null'))") == "null")
  }

  test("translate maps characters; short replacement lists delete") {
    assert(scalar("translate('ab', 'xy', 'abcba')") == "xycyx")
    assert(scalar("translate('abc', 'x', 'aabbcc')") == "xx") // b, c deleted
    assert(scalar("translate('a', 'x', '')") == "")
  }

  test("strcmp returns -1/0/1 with null pass-through") {
    assert(scalar("strcmp('a', 'b')") == -1L)
    assert(scalar("strcmp('b', 'a')") == 1L)
    assert(scalar("strcmp('a', 'a')") == 0L)
    assert(scalar("strcmp('abc', 'abd')") == -1L)
    assert(scalar("strcmp(tostring(toint('x')), 'a')") == null)
  }

  test("regex trim family removes one anchored match per side") {
    assert(scalar("trim('[^\\\\w]+', '-- hi $')") == "hi")
    assert(scalar("trim_start('[A-Z]+', 'ABCdefABC')") == "defABC")
    assert(scalar("trim_end('[0-9]+', 'v1x23')") == "v1x")
    // no match → unchanged; plain 1-arg trim stays whitespace trim
    assert(scalar("trim_start('[0-9]+', 'abc')") == "abc")
    assert(scalar("trim('  pad  ')") == "pad")
  }

  test("indexof_regex: 0-based first match, -1 absent") {
    assert(scalar("indexof_regex('abcde', 'c.')") == 2L)
    assert(scalar("indexof_regex('abcde', '[0-9]+')") == -1L)
    assert(scalar("indexof_regex('a1b22', '[0-9]{2}')") == 3L)
  }

  test("string_size is bytes, strlen is characters") {
    assert(scalar("string_size('abc')") == 3L)
    assert(scalar("string_size('héllo')") == 6L) // é is 2 bytes in UTF-8
    assert(scalar("strlen('héllo')") == 5L)
  }

  test("regex_quote escapes metacharacters to a literal matcher") {
    assert(scalar("regex_quote('a.b*c')") == "a\\.b\\*c")
    assert(scalar("regex_quote('x(1)[2]{3}')") == "x\\(1\\)\\[2\\]\\{3\\}")
    assert(scalar("regex_quote('plain')") == "plain")
    assert(scalar("regex_quote('a\\\\b')") == "a\\\\b")
  }

  test("parse_csv splits one record, honoring quotes") {
    assert(scalar("strcat_array(parse_csv('a,b,c'), '|')") == "a|b|c")
    assert(scalar("strcat_array(parse_csv('a,\"b,c\",d'), '|')") == "a|b,c|d")
    assert(scalar("strcat_array(parse_csv('a,\"say \"\"hi\"\"\",z'), '|')")
      == "a|say \"hi\"|z")
    assert(scalar("array_length(parse_csv('x,,y'))") == 3L)
  }

  test("endofquarter and datetime_part") {
    assert(scalar("tostring(endofquarter(datetime(2024-02-15)))")
      .toString.startsWith("2024-03-31 23:59:59"))
    assert(scalar("datetime_part('quarter', datetime(2024-05-01))") == 2L)
    assert(scalar("datetime_part('minute', datetime(2024-05-01 10:42:17))") == 42L)
    assert(scalar("datetime_part('millisecond', datetime(2024-05-01 00:00:00.123))") == 123L)
    assert(scalar("datetime_part('week_of_year', datetime(2024-01-08))") == 2L)
  }

  test("datetime_utc_to_local / local_to_utc round-trip") {
    // 2024-01-15 12:00 UTC is 07:00 in New York (EST, UTC-5)
    assert(scalar(
      "tostring(datetime_utc_to_local(datetime(2024-01-15 12:00:00), 'America/New_York'))")
      .toString.startsWith("2024-01-15 07:00:00"))
    assert(scalar(
      """tostring(datetime_local_to_utc(
        |  datetime_utc_to_local(datetime(2024-07-04 03:30:00), 'Asia/Tokyo'),
        |  'Asia/Tokyo'))""".stripMargin)
      .toString.startsWith("2024-07-04 03:30:00"))
    assertThrows[KqlParseException] {
      scalar("datetime_utc_to_local(now(), 'Not/AZone')")
    }
  }

  test("bag_merge: leftmost bag wins each key") {
    assert(scalar(
      """tostring(bag_merge(todynamic('{"a":1,"b":2}'),
        |                   todynamic('{"b":99,"c":3}')))""".stripMargin)
      == """{"a":1,"b":2,"c":3}""")
    // non-bag args are skipped
    assert(scalar(
      """tostring(bag_merge(todynamic('{"a":1}'), todynamic('[1,2]')))""")
      == """{"a":1}""")
  }

  test("bag_remove_keys drops top-level keys; non-object is null") {
    assert(scalar(
      """tostring(bag_remove_keys(todynamic('{"a":1,"b":2,"c":3}'),
        |                         pack_array('b', 'zz')))""".stripMargin)
      == """{"a":1,"c":3}""")
    assert(scalar(
      """tostring(bag_remove_keys(todynamic('[1,2]'), pack_array('a')))""")
      == null)
  }

  test("codec scalars: round-trips and fixed decompress vectors") {
    assert(scalar(
      "gzip_decompress_from_base64_string(gzip_compress_to_base64_string('hello world'))")
      == "hello world")
    assert(scalar(
      "zlib_decompress_from_base64_string(zlib_compress_to_base64_string('héllo €'))")
      == "héllo €")
    // fixed vectors produced by CPython's zlib/gzip — decompression is
    // the cross-implementation contract
    assert(scalar(
      "zlib_decompress_from_base64_string('eJzLSM3JyQcABiwCFQ==')") == "hello")
    assert(scalar(
      "gzip_decompress_from_base64_string('H4sIAAAAAAACA8tIzcnJBwCGphA2BQAAAA==')")
      == "hello")
    // corrupt input is a row error ⇒ null
    assert(scalar("zlib_decompress_from_base64_string('not-base64!!')") == null)
    assert(scalar("gzip_decompress_from_base64_string('aGVsbG8=')") == null)
  }

  test("extract_json pulls typed variants by JSONPath") {
    assert(scalar(
      """toint(extract_json('$.a.b', '{"a":{"b":7}}'))""") == 7L)
    assert(scalar(
      """tostring(extract_json('$.xs[1]', '{"xs":[10,20,30]}'))""") == "20")
    assert(scalar("""extract_json('$.nope', '{"a":1}')""") == null)
  }

  test("parse_path decomposes unix and windows paths") {
    // field access composes through an extend (path access binds to
    // field paths, not call results)
    def part(path: String, field: String): Any =
      Kql.run(spark, cat,
        s"t1 | extend p = parse_path('$path') | project r = tostring(p.$field)")
        .collect()(0).get(0)
    assert(part("/home/user/data/file.tar.gz", "Filename") == "file.tar.gz")
    assert(part("/home/user/data/file.tar.gz", "Extension") == "gz")
    assert(part("/home/user/data/file.tar.gz", "DirectoryPath") == "/home/user/data")
    assert(part("/home/user/data/file.tar.gz", "DirectoryName") == "data")
    assert(part("/home/user/data/file.tar.gz", "RootPath") == "/")
    assert(part("C:\\\\Users\\\\x\\\\doc.txt", "RootPath") == "C:")
    assert(part("C:\\\\Users\\\\x\\\\doc.txt:hidden", "AlternateDataStreamName") == "hidden")
    assert(part("C:\\\\Users\\\\x\\\\doc.txt:hidden", "Filename") == "doc.txt")
  }

  test("has_any_index: first term hit wins, -1 when absent") {
    assert(scalar(
      "has_any_index('the quick brown fox', pack_array('zz', 'brown', 'quick'))")
      == 1L)
    assert(scalar(
      "has_any_index('the quick brown fox', pack_array('nope', 'nada'))")
      == -1L)
    // term semantics: substrings inside words do NOT match
    assert(scalar(
      "has_any_index('the quick brown fox', pack_array('row'))") == -1L)
  }

  test("parse_ipv6 canonicalizes compressed and embedded-IPv4 forms") {
    assert(scalar("parse_ipv6('::1')") ==
      "0000:0000:0000:0000:0000:0000:0000:0001")
    assert(scalar("parse_ipv6('2001:db8::8a2e:370:7334')") ==
      "2001:0db8:0000:0000:0000:8a2e:0370:7334")
    assert(scalar("parse_ipv6('::ffff:192.168.1.1')") ==
      "0000:0000:0000:0000:0000:ffff:c0a8:0101")
    assert(scalar("parse_ipv6('192.168.1.1')") ==
      "0000:0000:0000:0000:0000:ffff:c0a8:0101") // v4 → mapped
    assert(scalar("parse_ipv6('1::2::3')") == null)  // two ::
    assert(scalar("parse_ipv6('abcde::')") == null)  // 5-digit group
    assert(scalar("parse_ipv6('1:2:3')") == null)    // too few groups
  }

  test("ipv6_compare / ipv6_is_match / ipv6_is_in_range") {
    assert(scalar("ipv6_compare('::1', '0:0:0:0:0:0:0:1')") == 0L)
    assert(scalar("ipv6_compare('::1', '::2')") == -1L)
    assert(scalar("ipv6_compare('ffff::', '::ffff')") == 1L)
    assert(scalar(
      "ipv6_is_match('2001:db8::1', '2001:db8::ff', 112)") == true)
    assert(scalar(
      "ipv6_is_match('2001:db8::1', '2001:db9::1', 32)") == false)
    assert(scalar("ipv6_is_match('::1', '::1')") == true) // default /128
    assert(scalar(
      "ipv6_is_in_range('2001:db8::42', '2001:db8::/32')") == true)
    assert(scalar(
      "ipv6_is_in_range('2001:db9::42', '2001:db8::/32')") == false)
    assert(scalar("ipv6_is_in_range('x', '::/0')") == null)
  }

  test("format_timespan renders component patterns") {
    // 1d 02:03:04.5 = 93784500000 micros
    assert(scalar("format_timespan(1d + 2h + 3m + 4s + 500ms, 'd.hh:mm:ss.fff')")
      == "1.02:03:04.500")
    assert(scalar("format_timespan(90s, 'mm:ss')") == "01:30")
    assert(scalar("format_timespan(0s - 90s, 'mm:ss')") == "-01:30")
    assert(scalar("format_timespan(25h, 'd h')") == "1 1")
  }

  test("url_encode family: form vs component spaces, decode round-trip") {
    assert(scalar("url_encode('a b&c')") == "a+b%26c")
    assert(scalar("url_encode_component('a b&c')") == "a%20b%26c")
    assert(scalar("url_decode('a+b%26c')") == "a b&c")
    assert(scalar("url_decode(url_encode('x=1&y=2 z'))") == "x=1&y=2 z")
  }
}
