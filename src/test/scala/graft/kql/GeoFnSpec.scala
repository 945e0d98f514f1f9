package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.TestSpark

/** Geo scalar batch: spherical haversine distance (documented R=6371 km
  * deviation from Kusto's geodesic), point-in-circle, and the geohash
  * codec — plus encode/decode properties at every precision.
  */
class GeoFnSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("t1", Seq(Tuple1(1L)).toDF("one"))
    c
  }

  private def scalar(expr: String): Any =
    Kql.run(spark, cat, s"t1 | project r = $expr").collect()(0).get(0)

  test("geo_distance_2points: known city pair within haversine tolerance") {
    // Paris (2.3522, 48.8566) ↔ London (-0.1276, 51.5072): ~343.5 km
    val d = scalar(
      "geo_distance_2points(2.3522, 48.8566, -0.1276, 51.5072)")
      .asInstanceOf[Double]
    assert(d > 342000 && d < 345000)
    assert(scalar("geo_distance_2points(0.0, 0.0, 0.0, 0.0)") == 0.0)
    // out-of-range coordinates are a row error ⇒ null
    assert(scalar("geo_distance_2points(200.0, 0.0, 0.0, 0.0)") == null)
  }

  test("geo_point_in_circle") {
    assert(scalar(
      "geo_point_in_circle(2.36, 48.86, 2.3522, 48.8566, 1000.0)") == true)
    assert(scalar(
      "geo_point_in_circle(-0.1276, 51.5072, 2.3522, 48.8566, 100000.0)")
      == false)
  }

  test("geo_geohash matches the public test vectors") {
    // ezs42 is THE canonical geohash example (57.64911, 10.40744 → u4pruydqqvj)
    assert(scalar("geo_geohash(10.40744, 57.64911, 11)") == "u4pruydqqvj")
    assert(scalar("geo_geohash(-5.6, 42.6, 5)") == "ezs42")
    assert(scalar("geo_geohash(0.0, 0.0, 1)") == "s")
    // default precision 5
    assert(scalar("geo_geohash(10.40744, 57.64911)") == "u4pru")
    assert(scalar("geo_geohash(200.0, 0.0, 5)") == null)
  }

  test("geohash decode returns the cell center") {
    val lon = Kql.run(spark, cat,
      "t1 | extend p = geo_geohash_to_central_point('ezs42') | project r = toreal(p.lon)")
      .collect()(0).getDouble(0)
    val lat = Kql.run(spark, cat,
      "t1 | extend p = geo_geohash_to_central_point('ezs42') | project r = toreal(p.lat)")
      .collect()(0).getDouble(0)
    assert(math.abs(lon - (-5.603)) < 0.03)
    assert(math.abs(lat - 42.605) < 0.03)
    assert(scalar("geo_geohash_to_central_point('not a hash!')") == null)
  }

  test("property: encode→decode center stays inside the cell") {
    val coords = for {
      lon <- Gen.chooseNum(-179.99, 179.99)
      lat <- Gen.chooseNum(-89.99, 89.99)
      p <- Gen.chooseNum(1, 9)
    } yield (lon, lat, p)
    check(Prop.forAll(coords) { case (lon, lat, p) =>
      val enc = graft.functions.GeoHashUtil.encode(lon, lat, p)
      assert(enc != null && enc.numChars() == p)
      val center = graft.functions.GeoHashUtil.decodeCenter(enc).toString
      val lonC = "\"lon\":([-0-9.eE]+)".r.findFirstMatchIn(center).get.group(1).toDouble
      val latC = "\"lat\":([-0-9.eE]+)".r.findFirstMatchIn(center).get.group(1).toDouble
      // cell half-sizes at precision p (alternating 5-bit splits)
      val lonBits = (5 * p + 1) / 2
      val latBits = 5 * p / 2
      assert(math.abs(lonC - lon) <= 360.0 / (1L << lonBits))
      assert(math.abs(latC - lat) <= 180.0 / (1L << latBits))
      // re-encoding the center reproduces the hash (center is in-cell)
      assert(graft.functions.GeoHashUtil.encode(lonC, latC, p).toString ==
        enc.toString)
      true
    })
  }
}
