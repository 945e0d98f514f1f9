package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** IPv6 scalar kernel: a strict textual parser (no java.net — nothing
  * that could ever resolve a hostname) producing the 128-bit address as
  * 16 bytes, plus the canonical full lowercase form
  * `xxxx:xxxx:…:xxxx` used for comparison and output. Accepts `::`
  * compression and the embedded dotted-quad tail (`::ffff:1.2.3.4`);
  * IPv4 literals are accepted as their ::ffff-mapped form (Kusto's
  * ipv6_* functions do the same). Malformed input → null.
  */
object Ipv6Util {
  /** 16 address bytes, or null when malformed. */
  def parse(s: String): Array[Byte] = {
    if (s == null) return null
    var t = s.trim
    if (t.isEmpty) return null
    // plain IPv4 → ::ffff:a.b.c.d
    if (!t.contains(':')) {
      if (!t.contains('.')) return null
      t = "::ffff:" + t
    }
    val dc = t.indexOf("::")
    if (dc >= 0 && t.indexOf("::", dc + 1) >= 0) return null // one :: max
    def groups(part: String): Array[String] =
      if (part.isEmpty) Array.empty else part.split(":", -1)
    val (headS, tailS) =
      if (dc >= 0) (t.substring(0, dc), t.substring(dc + 2)) else (t, "")
    val head = groups(headS)
    val tail = if (dc >= 0) groups(tailS) else Array.empty[String]
    if (head.exists(_.isEmpty) || tail.exists(_.isEmpty)) return null
    val out = new Array[Byte](16)
    // expand the optional dotted-quad in the LAST group
    def expand(gs: Array[String]): Array[Int] = {
      if (gs.isEmpty) return Array.empty
      val last = gs.last
      val init = gs.init
      val words = new scala.collection.mutable.ArrayBuffer[Int]
      for (g <- init) {
        if (g.length > 4 || !g.forall(c => Character.digit(c, 16) >= 0))
          return null
        words += Integer.parseInt(g, 16)
      }
      if (last.contains('.')) {
        val q = last.split("\\.", -1)
        if (q.length != 4) return null
        val bs = q.map { p =>
          if (p.isEmpty || p.length > 3 || !p.forall(_.isDigit)) return null
          val v = p.toInt
          if (v > 255 || (p.length > 1 && p.head == '0')) return null
          v
        }
        words += ((bs(0) << 8) | bs(1))
        words += ((bs(2) << 8) | bs(3))
      } else {
        if (last.length > 4 || last.isEmpty ||
            !last.forall(c => Character.digit(c, 16) >= 0)) return null
        words += Integer.parseInt(last, 16)
      }
      words.toArray
    }
    val h = if (headS.isEmpty) Array.empty[Int] else expand(head)
    val tl = if (tailS.isEmpty) Array.empty[Int] else expand(tail)
    if (h == null || tl == null) return null
    val total = h.length + tl.length
    if (dc >= 0) { if (total > 7) return null }
    else if (total != 8) return null
    var i = 0
    while (i < h.length) {
      out(2 * i) = (h(i) >> 8).toByte; out(2 * i + 1) = h(i).toByte; i += 1
    }
    i = 0
    while (i < tl.length) {
      val w = 8 - tl.length + i
      out(2 * w) = (tl(i) >> 8).toByte; out(2 * w + 1) = tl(i).toByte; i += 1
    }
    out
  }

  /** Canonical full lowercase form, or null. */
  def canonical(s: UTF8String): UTF8String = {
    if (s == null) return null
    val b = parse(s.toString)
    if (b == null) return null
    val sb = new java.lang.StringBuilder(39)
    var i = 0
    while (i < 8) {
      if (i > 0) sb.append(':')
      sb.append(f"${((b(2 * i) & 0xff) << 8) | (b(2 * i + 1) & 0xff)}%04x")
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Canonical full form of the address masked to `prefix` bits (Kusto
    * `parse_ipv6_mask`); null on malformed input or prefix ∉ [1, 128]. */
  def canonicalMask(s: UTF8String, prefix: Long): UTF8String = {
    if (s == null || prefix < 1 || prefix > 128) return null
    val b = parse(s.toString)
    if (b == null) return null
    var bits = prefix.toInt
    var i = 0
    while (i < 16) {
      if (bits <= 0) b(i) = 0
      else if (bits < 8) b(i) = (b(i) & (0xff << (8 - bits))).toByte
      bits -= 8
      i += 1
    }
    val sb = new java.lang.StringBuilder(39)
    i = 0
    while (i < 8) {
      if (i > 0) sb.append(':')
      sb.append(f"${((b(2 * i) & 0xff) << 8) | (b(2 * i + 1) & 0xff)}%04x")
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** -1 / 0 / 1 by 128-bit unsigned compare; null on malformed input. */
  def compare(a: UTF8String, b: UTF8String): java.lang.Long = {
    if (a == null || b == null) return null
    val x = parse(a.toString); val y = parse(b.toString)
    if (x == null || y == null) return null
    var i = 0
    while (i < 16) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return if (d < 0) -1L else 1L
      i += 1
    }
    0L
  }

  /** Membership in "addr/len" (len defaults to 128); null on malformed
    * input. */
  def inRange(ip: UTF8String, range: UTF8String): java.lang.Boolean = {
    if (ip == null || range == null) return null
    val r = range.toString.trim
    val slash = r.lastIndexOf('/')
    val (base, prefix) =
      if (slash >= 0) {
        val p = r.substring(slash + 1)
        if (p.isEmpty || !p.forall(_.isDigit)) return null
        (r.substring(0, slash), p.toInt)
      } else (r, 128)
    isMatch(ip, UTF8String.fromString(base), prefix)
  }

  /** Equality under the first `prefix` bits (0..128); null on malformed
    * input or out-of-range prefix. */
  def isMatch(a: UTF8String, b: UTF8String, prefix: Int): java.lang.Boolean = {
    if (a == null || b == null || prefix < 0 || prefix > 128) return null
    val x = parse(a.toString); val y = parse(b.toString)
    if (x == null || y == null) return null
    var bits = prefix
    var i = 0
    while (bits > 0 && i < 16) {
      val take = math.min(8, bits)
      val mask = (0xff00 >> take) & 0xff
      if ((x(i) & mask) != (y(i) & mask)) return java.lang.Boolean.FALSE
      bits -= take
      i += 1
    }
    java.lang.Boolean.TRUE
  }
}

/** `ip in "prefix::/len"` membership — the range carries its own prefix
  * length (`/128` when absent); malformed either side → null. */
case class Ipv6InRange(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = true

  override def nullSafeEval(ip: Any, range: Any): Any =
    Ipv6Util.inRange(ip.asInstanceOf[UTF8String],
      range.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Boolean r = graft.functions.Ipv6Util.inRange($a, $b);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = r.booleanValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Ipv6InRange =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "ipv6_is_in_range"
}

/** Catalyst expression for the two-argument IPv6 ops (`op` = "compare" |
  * "canonical-pair" forms are compiled Column-side; this covers compare
  * and is_match-with-literal-prefix via the prefix field). */
case class Ipv6Cmp(left: Expression, right: Expression, prefix: Int)
    extends BinaryExpression {
  // prefix < 0 → full compare (-1/0/1 long); else prefix match (bool)
  override def dataType: DataType =
    if (prefix < 0) org.apache.spark.sql.types.LongType
    else org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    if (prefix < 0)
      Ipv6Util.compare(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    else
      Ipv6Util.isMatch(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
        prefix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = if (prefix < 0) "java.lang.Long" else "java.lang.Boolean"
    val call =
      if (prefix < 0) (a: String, b: String) =>
        s"graft.functions.Ipv6Util.compare($a, $b)"
      else (a: String, b: String) =>
        s"graft.functions.Ipv6Util.isMatch($a, $b, $prefix)"
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      $boxed r = ${call(a, b)};
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = r.${if (prefix < 0) "longValue" else "booleanValue"}(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Ipv6Cmp =
    copy(left = newLeft, right = newRight)

  override def prettyName: String =
    if (prefix < 0) "ipv6_compare" else "ipv6_is_match"
}

/** Canonicalization as a unary expression. */
case class Ipv6Canonical(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Ipv6Util.canonical(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Ipv6Util.canonical($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Ipv6Canonical =
    copy(child = newChild)

  override def prettyName: String = "parse_ipv6"
}

/** Kusto `parse_ipv6_mask(ip, prefix)` — canonical full form of the
  * prefix-masked address; malformed input or prefix ∉ [1,128] → null. */
case class Ipv6CanonicalMask(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(ip: Any, prefix: Any): Any =
    Ipv6Util.canonicalMask(ip.asInstanceOf[UTF8String],
      prefix.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, p) => s"""
      ${ev.value} = graft.functions.Ipv6Util.canonicalMask($a, $p);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Ipv6CanonicalMask =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "parse_ipv6_mask"
}
