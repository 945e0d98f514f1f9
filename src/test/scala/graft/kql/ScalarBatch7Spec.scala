package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Round-6 scalar batch 7: datetime/timespan constructors and the epoch
  * converter family.
  */
class ScalarBatch7Spec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("t1", Seq(Tuple1(1L)).toDF("one"))
    c
  }

  private def scalar(expr: String): Any =
    Kql.run(spark, cat, s"t1 | project r = $expr").collect()(0).get(0)

  private def micros(expr: String): Long = scalar(expr) match {
    case t: java.sql.Timestamp =>
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    case i: java.time.Instant =>
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case other => fail(s"expected timestamp, got $other")
  }

  test("make_datetime: 3/5/6-arg forms, fractional seconds") {
    assert(micros("make_datetime(1970, 1, 1)") == 0L)
    assert(micros("make_datetime(1970, 1, 2, 3, 4)") ==
      86400000000L + 3L * 3600000000L + 4L * 60000000L)
    assert(micros("make_datetime(1970, 1, 1, 0, 0, 1.5)") == 1500000L)
    assert(micros("make_datetime(2021, 3, 14, 6, 45, 30.25)") ==
      micros("datetime(2021-03-14T06:45:30.25Z)"))
  }

  test("make_datetime: invalid calendar components → null") {
    assert(scalar("make_datetime(2021, 13, 1)") == null)
    assert(scalar("make_datetime(2021, 2, 30)") == null)
    assert(scalar("make_datetime(2021, 0, 1)") == null)
  }

  test("make_timespan: 2/3/4-arg forms → long micros") {
    assert(scalar("make_timespan(1, 30)") == 5400000000L)
    assert(scalar("make_timespan(0, 0, 1.5)") == 1500000L)
    assert(scalar("make_timespan(1, 2, 3, 4.5)") ==
      86400000000L + 2L * 3600000000L + 3L * 60000000L + 4500000L)
  }

  test("unixtime converters: all four granularities agree") {
    val want = 1600000000000000L // 2020-09-13T12:26:40Z in micros
    assert(micros("unixtime_seconds_todatetime(1600000000)") == want)
    assert(micros("unixtime_milliseconds_todatetime(1600000000000)") == want)
    assert(micros("unixtime_microseconds_todatetime(1600000000000000)") == want)
    assert(micros("unixtime_nanoseconds_todatetime(1600000000000000000)") == want)
  }

  test("unixtime converters: fractional seconds/millis round to micros") {
    assert(micros("unixtime_seconds_todatetime(1.5)") == 1500000L)
    assert(micros("unixtime_milliseconds_todatetime(1.25)") == 1250L)
  }

  test("unixtime converters: non-numeric input nulls out") {
    assert(scalar("unixtime_seconds_todatetime(tostring('x'))") == null)
    assert(scalar("unixtime_nanoseconds_todatetime(tostring('x'))") == null)
  }

  test("hash digests: known vectors, lowercase hex") {
    assert(scalar("hash_sha256('abc')") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(scalar("hash_sha1('abc')") ==
      "a9993e364706816aba3e25717850c26c9cd0d89d")
    assert(scalar("hash_md5('abc')") == "900150983cd24fb0d6963f7d28e17f72")
  }

  test("toguid: accepted forms normalize, junk nulls") {
    val want = "ab7e3356-2ecf-47a0-94f4-4b51c9f712e5"
    assert(scalar("toguid('{AB7E3356-2ECF-47A0-94F4-4B51C9F712E5}')") == want)
    assert(scalar("toguid('(ab7e3356-2ecf-47a0-94f4-4b51c9f712e5)')") == want)
    assert(scalar("toguid('ab7e33562ecf47a094f44b51c9f712e5')") == want)
    assert(scalar("toguid('AB7E3356-2ECF-47A0-94F4-4B51C9F712E5')") == want)
    assert(scalar("toguid('ab7e3356-2ecf47a0-94f4-4b51c9f712e5')") == null)
    assert(scalar("toguid('zz7e3356-2ecf-47a0-94f4-4b51c9f712e5')") == null)
    assert(scalar("toguid('notaguid')") == null)
  }

  test("isascii: multi-byte chars flip it") {
    assert(scalar("isascii('plain ascii 123!')") == true)
    assert(scalar("isascii('')") == true)
    assert(scalar("isascii('café')") == false)
  }

  test("codepoints: astral chars are ONE codepoint, round-trip") {
    assert(scalar("unicode_codepoints_from_string('ab')") ==
      Seq(97L, 98L))
    // U+1D11E musical G clef — a surrogate pair in UTF-16
    assert(scalar("unicode_codepoints_from_string('a𝄞b')") ==
      Seq(97L, 119070L, 98L))
    assert(scalar("unicode_codepoints_to_string(97, 98)") == "ab")
    assert(scalar(
      "unicode_codepoints_to_string(pack_array(104, 105))") == "hi")
    assert(scalar("unicode_codepoints_to_string(119070)") == "𝄞")
    // mixed variadic: scalars and arrays interleave
    assert(scalar(
      "unicode_codepoints_to_string(104, pack_array(105, 33))") == "hi!")
    // invalid scalar values null out
    assert(scalar("unicode_codepoints_to_string(1114112)") == null)
    assert(scalar("unicode_codepoints_to_string(55296)") == null) // D800
  }

  test("series elementwise math: exp/log/sign (Spark uses StrictMath)") {
    assert(scalar("series_exp(pack_array(0, 1))") ==
      Seq(1.0, StrictMath.exp(1.0)))
    assert(scalar("series_log(pack_array(1, 10))") ==
      Seq(0.0, StrictMath.log(10.0)))
    assert(scalar("series_sign(pack_array(-5, 0, 3))") ==
      Seq(-1.0, 0.0, 1.0))
    assert(scalar("series_floor(pack_array(1.5, -1.5))") == Seq(1.0, -2.0))
    assert(scalar("series_ceiling(pack_array(1.5, -1.5))") == Seq(2.0, -1.0))
  }

  test("series binary ops: scalar broadcast both sides, zip on arrays") {
    assert(scalar("series_pow(pack_array(2, 3), 2)") == Seq(4.0, 9.0))
    assert(scalar("series_greater(pack_array(1, 5), 3)") ==
      Seq(false, true))
    assert(scalar("series_greater(3, pack_array(1, 5))") ==
      Seq(true, false))
    assert(scalar(
      "series_equals(pack_array(1, 2), pack_array(1, 3))") ==
      Seq(true, false))
    // shorter side null-pads, comparisons against null stay null
    assert(scalar(
      "series_less(pack_array(1, 2), pack_array(9))") == Seq(true, null))
  }

  test("series reductions: dot/magnitude/cosine/pearson") {
    assert(scalar(
      "series_dot_product(pack_array(1, 2, 3), pack_array(4, 5, 6))") == 32.0)
    assert(scalar("series_magnitude(pack_array(3, 4))") == 5.0)
    assert(scalar(
      "series_cosine_similarity(pack_array(1, 0), pack_array(0, 1))") == 0.0)
    assert(scalar(
      "series_cosine_similarity(pack_array(2, 0), pack_array(5, 0))") == 1.0)
    // zero vector → null, not NaN
    assert(scalar(
      "series_cosine_similarity(pack_array(0, 0), pack_array(1, 2))") == null)
    val pc = scalar(
      "series_pearson_correlation(pack_array(1, 2, 3), pack_array(2, 4, 6))")
    assert(math.abs(pc.asInstanceOf[Double] - 1.0) < 1e-12)
    // constant series has zero variance → null
    assert(scalar(
      "series_pearson_correlation(pack_array(1, 1), pack_array(1, 2))") == null)
    // length mismatch poisons the fold → null (documented deviation)
    assert(scalar(
      "series_dot_product(pack_array(1, 2), pack_array(1))") == null)
  }

  test("series_fit_line_dynamic: perfect line and flat line") {
    // y = 2x + 1 over x = 0,1,2 → slope 2, interception 1, rsquare 1
    val r = Kql.run(TestSpark.spark, cat,
      """t1 | extend f = series_fit_line_dynamic(pack_array(1, 3, 5))
        | | project s = todouble(f.slope), i = todouble(f.interception),
        |     r2 = todouble(f.rsquare), rv = todouble(f.rvariance)""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) == 2.0 && r.getDouble(1) == 1.0)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 0.0)
    // flat input: variance 0 → rsquare null, slope 0
    val f = Kql.run(TestSpark.spark, cat,
      """t1 | extend f = series_fit_line_dynamic(pack_array(4, 4, 4))
        | | project s = todouble(f.slope), r2 = f.rsquare""".stripMargin)
      .collect()(0)
    assert(f.getDouble(0) == 0.0 && f.isNullAt(1))
    // fewer than 2 points → null bag
    assert(scalar(
      "tostring(series_fit_line_dynamic(pack_array(7)))") == null)
  }

  test("ipv4_compare / ipv4_is_match: least-prefix rule") {
    assert(scalar("ipv4_compare('1.2.3.4', '1.2.3.4')") == 0L)
    assert(scalar("ipv4_compare('1.2.3.4', '1.2.3.5')") == -1L)
    assert(scalar("ipv4_compare('1.2.3.5', '1.2.3.4')") == 1L)
    // third arg masks the difference away
    assert(scalar("ipv4_compare('1.2.3.4', '1.2.3.5', 24)") == 0L)
    // suffix inside either string lowers the effective prefix
    assert(scalar("ipv4_compare('10.1.0.0/16', '10.1.255.255')") == 0L)
    assert(scalar("ipv4_is_match('192.168.1.1', '192.168.1.255', 24)") == true)
    assert(scalar("ipv4_is_match('192.168.1.1', '192.168.2.1', 24)") == false)
    assert(scalar("ipv4_is_match('10.0.0.1/8', '10.255.0.1')") == true)
    assert(scalar("ipv4_is_match('bad', '10.0.0.1')") == null)
  }

  test("ipv4_netmask_suffix and format_ipv4_mask") {
    assert(scalar("ipv4_netmask_suffix('10.1.2.3/24')") == 24L)
    assert(scalar("ipv4_netmask_suffix('10.1.2.3')") == 32L)
    assert(scalar("ipv4_netmask_suffix('10.1.2.3/33')") == null)
    assert(scalar("ipv4_netmask_suffix('junk/8')") == null)
    assert(scalar("format_ipv4_mask('192.168.1.77', 24)") == "192.168.1.0/24")
    assert(scalar("format_ipv4_mask('10.99.88.77', 8)") == "10.0.0.0/8")
    assert(scalar("format_ipv4_mask('1.2.3.4', 32)") == "1.2.3.4/32")
    assert(scalar("format_ipv4_mask('1.2.3.4', 33)") == null)
  }

  test("jaccard_index: distinct-element sets, empty-union null") {
    assert(scalar(
      "jaccard_index(pack_array(1, 2, 3), pack_array(2, 3, 4))") == 0.5)
    assert(scalar(
      "jaccard_index(pack_array(1, 1, 2), pack_array(1, 2))") == 1.0)
    assert(scalar(
      "jaccard_index(pack_array('a'), pack_array('b'))") == 0.0)
    assert(scalar(
      "jaccard_index(array_slice(pack_array(1), 1, 0)," +
        " array_slice(pack_array(1), 1, 0))") == null)
  }

  test("dynamic_to_json: recursive key sort, scalars render as JSON") {
    assert(scalar(
      """dynamic_to_json(todynamic('{"b":{"d":1,"c":[2,1]},"a":3}'))""") ==
      """{"a":3,"b":{"c":[2,1],"d":1}}""")
    assert(scalar("dynamic_to_json('hi')") == "\"hi\"")
    assert(scalar("dynamic_to_json(5)") == "5")
    assert(scalar("dynamic_to_json(pack_array(3, 1))") == "[3,1]")
  }

  test("bag_set_key: set, replace, null value, non-bag") {
    assert(scalar(
      """tostring(bag_set_key(todynamic('{"a":1}'), 'b', 2))""") ==
      """{"a":1,"b":2}""")
    assert(scalar(
      """tostring(bag_set_key(todynamic('{"a":1}'), 'a', 'x'))""") ==
      """{"a":"x"}""")
    assert(scalar(
      """tostring(bag_set_key(todynamic('{"a":1}'), 'n', null))""") ==
      """{"a":null,"n":null}""" ||
      scalar(
        """tostring(bag_set_key(todynamic('{"a":1}'), 'n', null))""") ==
        """{"a":1,"n":null}""")
    assert(scalar(
      """tostring(bag_set_key(todynamic('[1,2]'), 'k', 1))""") == null)
  }

  test("percentiles_array / percentilew / count_distinct aggregates") {
    val c2 = new Catalog(TestSpark.spark)
    c2.register("w", Seq(
      (1L, 10L, 1L), (1L, 20L, 0L), (1L, 30L, 3L),
      (2L, 5L, 1L), (2L, 7L, 1L)).toDF("k", "v", "w"))
    val rows = Kql.run(TestSpark.spark, c2,
      """w | summarize pa = percentiles_array(v, 0, 100),
        |     pw = percentilew(v, w, 50),
        |     cd = count_distinct(v),
        |     cdi = count_distinctif(v, v > 6)
        |     by k
        | | sort by k asc""".stripMargin).collect()
    val r1 = rows(0)
    assert(r1.getSeq[Double](1).map(_.toLong) == Seq(10L, 30L))
    // expanded multiset {10, 30, 30, 30} → median 30 (w=0 row excluded)
    assert(r1.getDouble(2) == 30.0)
    assert(r1.getLong(3) == 3L && r1.getLong(4) == 3L)
    val r2 = rows(1)
    // expanded {5, 7} → interpolated median 6
    assert(r2.getDouble(2) == 6.0)
    assert(r2.getLong(3) == 2L && r2.getLong(4) == 1L)
    // negative weights are row errors (weight 0), not query aborts
    val neg = Kql.run(TestSpark.spark, c2,
      "w | extend nw = 0 - w | summarize p = percentilew(v, nw, 50)")
      .collect()(0)
    assert(neg.isNullAt(0))
  }

  test("indexof: start/length/occurrence forms") {
    assert(scalar("indexof('abcabc', 'b')") == 1L)
    assert(scalar("indexof('abcabc', 'b', 2)") == 4L)
    assert(scalar("indexof('abcabc', 'b', 0, 1)") == -1L) // window too short
    assert(scalar("indexof('abcabc', 'b', 0, 2)") == 1L)
    assert(scalar("indexof('abcabc', 'b', 0, -1, 2)") == 4L)
    assert(scalar("indexof('abcabc', 'b', 0, -1, 3)") == -1L)
    // negative start counts from the end
    assert(scalar("indexof('abcabc', 'b', -3)") == 4L)
    assert(scalar("indexof('abcabc', 'zz', 1)") == -1L)
    assert(scalar("indexof('abcabc', '', 3)") == 3L)
    // multi-char lookup with occurrence
    assert(scalar("indexof('xabxabxab', 'ab', 0, -1, 3)") == 7L)
  }

  test("array_index_of: start/length/occurrence forms") {
    assert(scalar("array_index_of(pack_array(5, 6, 5, 6), 6)") == 1L)
    assert(scalar("array_index_of(pack_array(5, 6, 5, 6), 6, 2)") == 3L)
    assert(scalar("array_index_of(pack_array(5, 6, 5, 6), 6, 0, 1)") == -1L)
    assert(scalar("array_index_of(pack_array(5, 6, 5, 6), 6, 0, -1, 2)") == 3L)
    assert(scalar("array_index_of(pack_array(5, 6, 5, 6), 6, 0, -1, 3)") == -1L)
    assert(scalar("array_index_of(pack_array('a', 'b'), 'c', 0)") == -1L)
  }

  test("parse_xml: attrs, repeated siblings, mixed text, field paths") {
    assert(scalar("tostring(parse_xml('<a><b>1</b><b>2</b></a>'))") ==
      """{"a":{"b":["1","2"]}}""")
    assert(scalar(
      "tostring(parse_xml('<r id=\"7\">hi<c x=\"y\"/></r>'))") ==
      """{"r":{"#text":"hi","@id":"7","c":{"@x":"y"}}}""")
    assert(scalar("tostring(parse_xml('<e/>'))") == """{"e":null}""")
    // field paths descend into the parsed variant (via extend, like Kusto)
    val fp = Kql.run(TestSpark.spark, cat,
      """t1 | extend x = parse_xml('<doc><n>41</n></doc>')
        | | project r = toint(x.doc.n) + 1""".stripMargin).collect()(0)
    assert(fp.getLong(0) == 42L)
    assert(scalar("tostring(parse_xml('not xml <'))") == null)
    // DOCTYPE refused — no XXE, no local file reads
    assert(scalar("tostring(parse_xml('<!DOCTYPE foo [<!ENTITY x SYSTEM " +
      "\"file:///etc/passwd\">]><a>&x;</a>'))") == null)
  }

  test("evaluate basket: masks, thresholds, wildcards, column cap") {
    val c2 = new Catalog(TestSpark.spark)
    c2.register("b", Seq(
      ("x", "p"), ("x", "p"), ("x", "q"), ("y", "p"), ("y", "p"), ("y", "p"))
      .toDF("a", "b"))
    val rows = Kql.run(TestSpark.spark, c2,
      "b | evaluate basket(0.5)").collect()
    // N=6, threshold 3: b=p (5), a=x (3), a=y (3), a=y&b=p (3)
    val segs = rows.map(r => (Option(r.get(3)), Option(r.get(4)),
      r.getLong(1))).toSet
    assert(segs == Set(
      (None, Some("p"), 5L), (Some("x"), None, 3L),
      (Some("y"), None, 3L), (Some("y"), Some("p"), 3L)))
    // SegmentId ranks by count desc first
    assert(rows.head.getLong(1) == 5L && rows.head.getLong(0) == 1L)
    // Percent replays as 100·cnt/N
    assert(rows.head.getDouble(2) == 100.0 * 5 / 6)
    // column cap guards the 2^c expansion
    val wide = (1 to 11).map(i => s"c$i = $i").mkString(", ")
    val e = intercept[KqlParseException](Kql.run(TestSpark.spark, c2,
      s"b | extend $wide | evaluate basket(0.5)"))
    assert(e.getMessage.contains("project"))
  }

  test("buildschema: objects union keys, conflicts become alternatives") {
    val c2 = new Catalog(TestSpark.spark)
    c2.register("js", Seq(
      """{"a": 1, "b": "x"}""",
      """{"a": 2.5, "c": [1, 2]}""",
      """{"a": null}""").toDF("j"))
    val r = Kql.run(TestSpark.spark, c2,
      """js | extend d = todynamic(j)
        | | summarize s0 = buildschema(d)
        | | project s = tostring(s0)""".stripMargin)
      .collect()(0).getString(0)
    assert(r ==
      """{"a":["long","real"],"b":"string","c":{"`indexer`":"long"}}""")
    // an object shape and an array shape are ALTERNATIVES, not a key union
    val c3 = new Catalog(TestSpark.spark)
    c3.register("js2", Seq("""{"a": 1}""", """[1, "x"]""").toDF("j"))
    val r2 = Kql.run(TestSpark.spark, c3,
      """js2 | extend d = todynamic(j) | summarize s0 = buildschema(d)
        | | project s = tostring(s0)""".stripMargin).collect()(0).getString(0)
    assert(r2 == """[{"`indexer`":["long","string"]},{"a":"long"}]""")
  }

  test("stdevif / varianceif: conditional spread aggregates") {
    val c2 = new Catalog(TestSpark.spark)
    c2.register("sv", Seq(
      (1L, 2.0), (1L, 4.0), (1L, 100.0), (2L, 9.0)).toDF("k", "v"))
    val r = Kql.run(TestSpark.spark, c2,
      """sv | summarize s = stdevif(v, v < 50), va = varianceif(v, v < 50)
        |    by k | sort by k asc""".stripMargin).collect()
    // k=1 matching {2,4}: sample stdev = sqrt(2), variance 2
    assert(math.abs(r(0).getDouble(1) - math.sqrt(2.0)) < 1e-12)
    assert(r(0).getDouble(2) == 2.0)
    // k=2 has one matching row → sample forms are null
    assert(r(1).isNullAt(1) && r(1).isNullAt(2))
  }

  test("tostring renders timespans in clock shape") {
    assert(scalar("tostring(make_timespan(1, 2, 3, 4.5))") ==
      "1.02:03:04.5000000")
    assert(scalar("tostring(make_timespan(1, 2))") == "01:02:00")
    assert(scalar("tostring(make_timespan(0, 0, 0.25))") == "00:00:00.2500000")
    assert(scalar("tostring(make_timespan(-1, 0))") == "-01:00:00")
    assert(scalar("tostring(totimespan('2.03:04:05'))") == "2.03:04:05")
  }

  test("row_cumsum restart: truthy flag starts a new segment at that row") {
    val c2 = new Catalog(TestSpark.spark)
    c2.register("rc", Seq(
      (1L, 10L, false), (2L, 20L, false), (3L, 5L, true),
      (4L, 7L, false), (5L, 1L, true)).toDF("i", "v", "r"))
    val rows = Kql.run(TestSpark.spark, c2,
      """rc | sort by i asc | extend cs = row_cumsum(v, r)
        | | project i, cs""".stripMargin).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L), (2L, 30L), (3L, 5L), (4L, 12L), (5L, 1L)))
  }

  test("startof/endof period offsets shift calendar-aware") {
    assert(scalar("startofday(datetime(2024-03-15T10:30:00Z), -1)") ==
      java.sql.Timestamp.from(java.time.Instant.parse("2024-03-14T00:00:00Z")))
    assert(scalar("startofmonth(datetime(2024-03-15), 1)") ==
      java.sql.Timestamp.from(java.time.Instant.parse("2024-04-01T00:00:00Z")))
    // Jan 31 + 1 month clamps inside February; the month START is stable
    assert(scalar("startofmonth(datetime(2024-01-31), 1)") ==
      java.sql.Timestamp.from(java.time.Instant.parse("2024-02-01T00:00:00Z")))
    assert(scalar("endofday(datetime(2024-03-15), -1)") ==
      java.sql.Timestamp.from(
        java.time.Instant.parse("2024-03-14T23:59:59.999999Z")))
    assert(scalar("startofweek(datetime(2024-03-15), 1)") == // Fri → next Sun
      java.sql.Timestamp.from(java.time.Instant.parse("2024-03-17T00:00:00Z")))
  }

  test("extract 4-arg typeof and extract_groups") {
    assert(scalar("extract('v=([0-9]+)', 1, 'a v=42 b', typeof(long))") == 42L)
    assert(scalar("extract('v=([0-9.]+)', 1, 'v=1.5', typeof(real))") == 1.5)
    assert(scalar(
      "extract_groups('([a-z]+)=([0-9]+)', 'x foo=17 y')") ==
      Seq("foo", "17"))
    assert(scalar("extract_groups('([a-z]+)=([0-9]+)', 'nope')") == null)
    val e = intercept[KqlParseException](
      scalar("extract_groups('nogroups', 'x')"))
    assert(e.getMessage.contains("capture"))
  }

  test("treepath enumerates object paths, arrays merge elementwise") {
    assert(scalar(
      """treepath(todynamic('{"a":{"b":1,"c":[{"d":2},{"e":3}]},"f":4}'))""") ==
      Seq("['a']", "['a']['b']", "['a']['c']", "['a']['c']['d']",
        "['a']['c']['e']", "['f']"))
    assert(scalar("treepath(todynamic('5'))") == Seq())
  }

  test("parse kind=regex: raw regex fragments and flags") {
    val c2 = new Catalog(TestSpark.spark)
    c2.register("lg", Seq(
      "ERROR [svc1] code=17", "WARN  [svc2] code=3", "error [svc3] code=9")
      .toDF("line"))
    val rows = Kql.run(TestSpark.spark, c2,
      """lg | parse kind=regex line with '\\w+\\s+\\[' svc '\\] code=' c: long
        | | project svc, c | sort by svc asc""".stripMargin).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("svc1", 17L), ("svc2", 3L), ("svc3", 9L)))
    // flags=i case-insensitive literal regex
    val ci = Kql.run(TestSpark.spark, c2,
      """lg | parse-where kind=regex flags=i line with 'error \\[' svc '\\].*'
        | | project svc""".stripMargin).collect()
    assert(ci.map(_.getString(0)).toSeq.sorted == Seq("svc1", "svc3"))
    // kind=relaxed accepted (same lowering as simple)
    assert(Kql.run(TestSpark.spark, c2,
      "lg | parse kind=relaxed line with 'code=' c: long | project c")
      .collect().length == 3)
  }

  test("union: multi-source, head form, isfuzzy, withsource labels") {
    val c2 = new Catalog(TestSpark.spark)
    c2.register("ta", Seq(1L, 2L).toDF("x"))
    c2.register("tb", Seq(3L).toDF("x"))
    c2.register("tc", Seq(4L).toDF("x"))
    def q(s: String) = Kql.run(TestSpark.spark, c2, s).collect()
    // step form with a comma list
    assert(q("ta | union tb, tc | summarize n = count()")(0).getLong(0) == 4L)
    // head form
    assert(q("union ta, tb, tc | summarize n = count()")(0).getLong(0) == 4L)
    // withsource provenance in the head form
    val rows = q("union withsource=Src ta, tb | sort by x asc")
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "ta"), (2L, "ta"), (3L, "tb")))
    // single-source head with withsource → constant label
    assert(q("union withsource=Src ta | sort by x asc")(0).getString(1) == "ta")
    // isfuzzy tolerates a missing table; without it the query fails
    assert(q("union isfuzzy=true ta, no_such | summarize n = count()")(0)
      .getLong(0) == 2L)
    intercept[KqlParseException](q("union ta, no_such | count"))
    // kind=inner accepted (treated as the bag union, documented)
    assert(q("union kind=inner ta, tb | summarize n = count()")(0)
      .getLong(0) == 3L)
  }

  test("mv-expand / mv-apply 'to typeof' casts expanded elements") {
    val c2 = new Catalog(TestSpark.spark)
    c2.register("tj", Seq("""["1", "2", "x"]""").toDF("j"))
    // mv-expand: string elements cast to long; bad ones null (row kept)
    val rows = Kql.run(TestSpark.spark, c2,
      """tj | extend a = todynamic(j)
        | | mv-expand a to typeof(long)
        | | project a""".stripMargin).collect()
    assert(rows.map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq ==
      Seq(1L, 2L, null))
    // mv-apply: typed element feeds arithmetic in the subquery
    val s = Kql.run(TestSpark.spark, c2,
      """tj | extend a = todynamic(j)
        | | mv-apply e = a to typeof(long) on (
        |     where isnotnull(e) | summarize s = sum(e))
        | | project s""".stripMargin).collect()(0).getDouble(0)
    assert(s == 3.0)
  }

  test("evaluate autocluster: dominated segments drop") {
    val c2 = new Catalog(TestSpark.spark)
    c2.register("b2", Seq(
      ("x", "p"), ("x", "p"), ("x", "q"), ("y", "p"), ("y", "p"), ("y", "p"))
      .toDF("a", "b"))
    val rows = Kql.run(TestSpark.spark, c2,
      "b2 | evaluate autocluster(0.5, 0.9)").collect()
    val segs = rows.map(r => (Option(r.get(3)), Option(r.get(4)))).toSet
    // basket at 0.5 gives b=p(5), a=x(3), a=y(3), a=y&b=p(3); the
    // (a=y,b=p) segment explains 100% of a=y → a=y drops; the rest stay
    assert(segs == Set(
      (None, Some("p")), (Some("x"), None), (Some("y"), Some("p"))))
  }

  test("evaluate diffpatterns: per-side lattices, delta ranking") {
    val c2 = new Catalog(TestSpark.spark)
    c2.register("dp", Seq(
      ("A", "x"), ("A", "x"), ("A", "x"), ("A", "y"),
      ("B", "x"), ("B", "y"), ("B", "y"), ("B", "y"))
      .toDF("side", "v"))
    val rows = Kql.run(TestSpark.spark, c2,
      "dp | evaluate diffpatterns(0.25, side, 'A', 'B')").collect()
    // v=x: A 3/4=75%, B 1/4=25% → diff 50; v=y: 25% vs 75% → diff 50
    val m = rows.map(r => (r.getString(6),
      (r.getLong(1), r.getLong(2), r.getDouble(5)))).toMap
    assert(m("x") == (3L, 1L, 50.0) && m("y") == (1L, 3L, 50.0))
    // delta ties break by mask then value — x ranks before y
    assert(rows.head.getString(6) == "x" && rows.head.getLong(0) == 1L)
    // the split column leaves the attribute set entirely
    assert(!rows.head.schema.fieldNames.contains("side"))
  }

  test("replace_regex and has_ipv4") {
    assert(scalar("replace_regex('ab12cd34', '[0-9]+', '#')") == "ab#cd#")
    assert(scalar(
      "replace_regex('k=1;k=2', 'k=([0-9])', 'v:$1')") == "v:1;v:2")
    assert(scalar("has_ipv4('src 192.168.1.1 dst')") == true)
    assert(scalar("has_ipv4('at [10.0.0.255]:8080')") == true)
    assert(scalar("has_ipv4('version 256.1.1.1 invalid')") == false)
    assert(scalar("has_ipv4('1.2.3.4.5 is not an ip')") == false)
    assert(scalar("has_ipv4('no addresses here')") == false)
  }

  test("geo_point_in_polygon: interior, exterior, hole, invalid coords") {
    val poly = """'{"type":"Polygon","coordinates":""" +
      """[[[0,0],[10,0],[10,10],[0,10],[0,0]],""" +
      """[[4,4],[6,4],[5,6],[4,4]]]}'"""
    def in(x: Double, y: Double): Any =
      scalar(s"geo_point_in_polygon($x, $y, $poly)")
    assert(in(2.0, 2.5) == true)    // interior
    assert(in(-1.0, 5.5) == false)  // west of the square
    assert(in(11.0, 5.5) == false)  // east
    assert(in(5.0, 4.5) == false)   // inside the hole
    assert(in(5.0, 7.5) == true)    // above the hole, inside the square
    assert(in(200.0, 5.0) == null)  // invalid longitude
    val e = intercept[KqlParseException](
      scalar("geo_point_in_polygon(1.0, 1.0, 'not geojson')"))
    assert(e.getMessage.contains("GeoJSON"))
  }

  test("pivot auto-schema: distinct values discovered and sorted") {
    val c2 = new Catalog(TestSpark.spark)
    c2.register("pv", Seq(
      ("k1", "b", 1L), ("k1", "a", 2L), ("k2", "a", 3L), ("k2", "c", 4L))
      .toDF("k", "p", "v"))
    val df = Kql.run(TestSpark.spark, c2,
      "pv | evaluate pivot(p, sum(v)) | sort by k asc")
    // columns come out in sorted value order
    assert(df.columns.toSeq == Seq("k", "a", "b", "c"))
    val rows = df.collect()
    assert(rows(0).getDouble(1) == 2.0 && rows(0).getDouble(2) == 1.0 &&
      rows(0).isNullAt(3))
    assert(rows(1).getDouble(1) == 3.0 && rows(1).isNullAt(2) &&
      rows(1).getDouble(3) == 4.0)
  }

  test("consume executes and reports one stats row") {
    val c2 = new Catalog(TestSpark.spark)
    c2.register("cc", Seq(1L, 2L, 3L).toDF("x"))
    val rows = Kql.run(TestSpark.spark, c2,
      "cc | where x > 1 | consume").collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 2L)
    assert(Kql.run(TestSpark.spark, c2,
      "cc | consume decodeblocks=true").collect()(0).getLong(0) == 3L)
  }

  test("sort/top by expressions") {
    val c2 = new Catalog(TestSpark.spark)
    c2.register("se", Seq("bb", "a", "dddd", "ccc").toDF("s"))
    val rows = Kql.run(TestSpark.spark, c2,
      "se | sort by strlen(s) desc | project s").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("dddd", "ccc", "bb", "a"))
    val top = Kql.run(TestSpark.spark, c2,
      "se | top 2 by strlen(s) desc, s asc | project s").collect()
    assert(top.map(_.getString(0)).toSeq == Seq("dddd", "ccc"))
    // an expression key cannot anchor serialized windows
    val e = intercept[KqlParseException](Kql.run(TestSpark.spark, c2,
      "se | sort by strlen(s) | extend r = row_number()"))
    assert(e.getMessage.contains("serialized"))
  }

  test("tohex minDigits pads but never truncates") {
    assert(scalar("tohex(255, 4)") == "00ff")
    assert(scalar("tohex(255)") == "ff")
    assert(scalar("tohex(65535, 2)") == "ffff") // wider than the minimum
    assert(scalar("tohex(0, 3)") == "000")
  }

  test("base64 byte arrays: decode, round-trip, malformed → null") {
    assert(scalar("base64_decode_toarray('AQID')") == Seq(1L, 2L, 3L))
    assert(scalar("base64_encode_fromarray(pack_array(1, 2, 3))") == "AQID")
    assert(scalar(
      "base64_encode_fromarray(base64_decode_toarray('Z3JhZnQ='))") ==
      "Z3JhZnQ=")
    assert(scalar("base64_decode_toarray('!!bad!!')") == null)
    assert(scalar("base64_encode_fromarray(pack_array(256))") == null)
    assert(scalar("base64_encode_fromarray(pack_array(-1))") == null)
  }
}
