package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Geohash codec for the geo scalar batch. Standard base-32 geohash
  * (interleaved lon/lat bisection), precision 1..12 — the public
  * algorithm every implementation shares, so cells line up with any
  * other engine's geohashes. Distance math lives Column-side in the
  * compiler (spherical haversine — see the geo_distance_2points note).
  */
object GeoHashUtil {
  private val base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  def encode(lon: Double, lat: Double, precision: Int): UTF8String = {
    if (precision < 1 || precision > 12 ||
        lon < -180 || lon > 180 || lat < -90 || lat > 90) return null
    var (lonLo, lonHi) = (-180.0, 180.0)
    var (latLo, latHi) = (-90.0, 90.0)
    val sb = new java.lang.StringBuilder(precision)
    var evenBit = true
    var bit = 0
    var ch = 0
    while (sb.length < precision) {
      if (evenBit) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
        else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
        else { ch = ch << 1; latHi = mid }
      }
      evenBit = !evenBit
      bit += 1
      if (bit == 5) { sb.append(base32.charAt(ch)); bit = 0; ch = 0 }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Cell center as canonical JSON `{"lon":…,"lat":…}` (re-parsed to a
    * variant by the compiler). Invalid characters → null. */
  def decodeCenter(hash: UTF8String): UTF8String = {
    if (hash == null || hash.numChars() == 0) return null
    val s = hash.toString.toLowerCase
    var (lonLo, lonHi) = (-180.0, 180.0)
    var (latLo, latHi) = (-90.0, 90.0)
    var evenBit = true
    var i = 0
    while (i < s.length) {
      val ch = base32.indexOf(s.charAt(i))
      if (ch < 0) return null
      var b = 4
      while (b >= 0) {
        val bitSet = ((ch >> b) & 1) == 1
        if (evenBit) {
          val mid = (lonLo + lonHi) / 2
          if (bitSet) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (bitSet) latLo = mid else latHi = mid
        }
        evenBit = !evenBit
        b -= 1
      }
      i += 1
    }
    UTF8String.fromString(
      s"""{"lat":${(latLo + latHi) / 2},"lon":${(lonLo + lonHi) / 2}}""")
  }
}

/** (lon, lat) → geohash string at a fixed precision. */
case class GeoHashEncode(left: Expression, right: Expression, precision: Int)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(lon: Any, lat: Any): Any =
    GeoHashUtil.encode(lon.asInstanceOf[Double], lat.asInstanceOf[Double],
      precision)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lon, lat) => s"""
      ${ev.value} = graft.functions.GeoHashUtil.encode($lon, $lat, $precision);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GeoHashEncode =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "geo_geohash"
}

/** geohash → cell-center JSON text. */
case class GeoHashCenter(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    GeoHashUtil.decodeCenter(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.GeoHashUtil.decodeCenter($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): GeoHashCenter =
    copy(child = newChild)

  override def prettyName: String = "geo_geohash_to_central_point"
}
