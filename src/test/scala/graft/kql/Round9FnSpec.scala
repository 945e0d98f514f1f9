package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Round-9 scalar batch: zlib/gzip codecs, ipv6 mask, special functions,
  * welch_test, around/assert/array_iif/bag_pack_columns edge cases.
  */
class Round9FnSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("t1", Seq(Tuple1(1L)).toDF("one"))
    c
  }

  private def scalar(expr: String): Any =
    Kql.run(spark, cat, s"t1 | project r = $expr").collect()(0).get(0)

  test("zlib/gzip: round-trips, unicode, empty, invalid input") {
    assert(scalar("zlib_decompress_from_base64_string(" +
      "zlib_compress_to_base64_string('héllo wörld 🎉'))") == "héllo wörld 🎉")
    assert(scalar("gzip_decompress_from_base64_string(" +
      "gzip_compress_to_base64_string(''))") == "")
    // invalid base64 AND valid-base64-but-not-a-stream both → null (the
    // engine's row-error policy)
    assert(scalar("zlib_decompress_from_base64_string('!!!')") == null)
    assert(scalar("gzip_decompress_from_base64_string('bm90IGd6aXA=')") == null)
    // cross-codec confusion is invalid input, not a crash
    assert(scalar("zlib_decompress_from_base64_string(" +
      "gzip_compress_to_base64_string('x'))") == null)
  }

  test("parse_ipv6_mask: boundaries, ipv4-mapped, invalid prefix") {
    assert(scalar("parse_ipv6_mask('2001:db8:ffff::ffff', 33)") ==
      "2001:0db8:8000:0000:0000:0000:0000:0000")
    assert(scalar("parse_ipv6_mask('2001:db8::1', 128)") ==
      "2001:0db8:0000:0000:0000:0000:0000:0001")
    assert(scalar("parse_ipv6_mask('192.168.1.77', 120)") ==
      "0000:0000:0000:0000:0000:ffff:c0a8:0100")
    assert(scalar("parse_ipv6_mask('2001:db8::1', 0)") == null)
    assert(scalar("parse_ipv6_mask('2001:db8::1', 129)") == null)
    assert(scalar("parse_ipv6_mask('junk', 64)") == null)
  }

  test("gamma/loggamma/erf through the KQL surface") {
    assert(math.abs(scalar("gamma(5.0)").asInstanceOf[Double] - 24.0) < 1e-9)
    assert(scalar("gamma(0.0)") == null) // pole
    assert(scalar("gamma(-3.0)") == null)
    assert(math.abs(scalar("erf(0.0)").asInstanceOf[Double]) < 1e-15)
    assert(math.abs(scalar("erfc(0.0)").asInstanceOf[Double] - 1.0) < 1e-15)
  }

  test("welch_test: null on degenerate inputs, symmetric in sides") {
    assert(scalar("welch_test(1.0, 1.0, 1, 0.0, 1.0, 2)") == null)
    assert(scalar("welch_test(1.0, -1.0, 2, 0.0, 1.0, 2)") == null)
    assert(scalar("welch_test(1.0, 0.0, 2, 1.0, 0.0, 2)") == null)
    val p1 = scalar("welch_test(3.0, 1.0, 5, 1.0, 2.0, 7)").asInstanceOf[Double]
    val p2 = scalar("welch_test(1.0, 2.0, 7, 3.0, 1.0, 5)").asInstanceOf[Double]
    assert(math.abs(p1 - p2) < 1e-15 && p1 > 0 && p1 < 1)
  }

  test("around: datetime form, assert failure raises") {
    assert(scalar("around(datetime(2024-01-01 00:00:30)," +
      " datetime(2024-01-01), 1m)") == true)
    assert(scalar("around(datetime(2024-01-01 00:02:30)," +
      " datetime(2024-01-01), 1m)") == false)
    val e = intercept[Exception](
      scalar("assert(1 > 2, 'math broke')"))
    assert(e.getMessage.contains("math broke"))
  }

  test("rand/new_guid: in-range, distinct per row (nondeterministic)") {
    import org.apache.spark.sql.functions.col
    val df = Kql.run(spark, cat,
      "t1 | extend a = rand(), b = rand(100), g = new_guid() " +
        "| project a, b, g")
    val r = df.collect()(0)
    val a = r.getDouble(0); val b = r.getLong(1); val g = r.getString(2)
    assert(a >= 0.0 && a < 1.0)
    assert(b >= 0L && b < 100L)
    assert(g.matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"))
    // two rows draw different guids
    val c2 = new Catalog(spark)
    c2.register("t2", spark.range(2).toDF("id"))
    val gs = Kql.run(spark, c2, "t2 | extend g = new_guid() | project g")
      .collect().map(_.getString(0)).toSet
    assert(gs.size == 2)
  }

  test("to_utf8: multibyte chars expand to their UTF-8 bytes") {
    assert(scalar("strcat_array(to_utf8('Aé'), ',')") == "65,195,169")
    assert(scalar("strcat_array(to_utf8(''), ',')") == "")
  }

  test("geo_point_to_geohash is the ADX name for geo_geohash") {
    assert(scalar("geo_point_to_geohash(-80.0, 25.0, 5)") ==
      scalar("geo_geohash(-80.0, 25.0, 5)"))
  }

  test("bag_pack_columns requires column refs") {
    val e = intercept[KqlParseException](
      scalar("bag_pack_columns(1 + 2)"))
    assert(e.getMessage.contains("column references"))
  }
}
