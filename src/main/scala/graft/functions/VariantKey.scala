package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.types.variant.{Variant, VariantUtil}
import org.apache.spark.unsafe.types.VariantVal

/** Order-preserving binary sort key for a variant value, implementing the
  * reference's cross-type total order RECURSIVELY
  * (`miso-workflow-types/src/value/mod.rs:146-209`):
  *
  *   Null < Bool < numbers < Timestamp < (Timespan) < String
  *        < Array (element-wise, `Vec<Value>::cmp`)
  *        < Object (key-sorted (key, value) tuples, `BTreeMap::cmp`)
  *
  * Unsigned lexicographic comparison of the produced bytes equals the
  * reference's `Value::cmp` — so ORDER BY / GROUP BY on the key gives the
  * reference's sort and equality classes without re-serializing values to
  * JSON text and without per-row `schema_of_variant` dispatch. Encoding:
  *
  *   - every value starts with a rank byte (null 0x01, bool 0x02,
  *     number 0x03, timestamp 0x04, 0x05 reserved for timespan, string
  *     0x06, array 0x07, object 0x08, binary 0x09, uuid 0x0A) — ranks
  *     start at 0x01 so the container terminator 0x00 sorts a prefix
  *     container first (`[a] < [a, b]`, shorter BTreeMap first)
  *   - numbers (long/decimal/float/double/bool-free) unify through an
  *     order-encoded IEEE double: sign bit flipped for positives, all
  *     bits inverted for negatives, big-endian — matching the reference's
  *     own `as f64` cross-type compares (`value/mod.rs:178-181`; i64
  *     magnitudes beyond 2^53 collapse like its Int↔Float compares)
  *   - timestamps: offset-binary epoch micros, big-endian
  *   - strings (and object keys): UTF-8 bytes with 0x00 → 0x01 0x01 and
  *     0x01 → 0x01 0x02 escapes, 0x00 terminator — escape-prefix order
  *     proofs in VariantSpec; Rust `String::cmp` is the same byte order
  *   - arrays: concatenated element encodings + 0x00
  *   - objects: key-sorted (escaped key + 0x00, value encoding) pairs +
  *     0x00, mirroring `BTreeMap` iteration order (keys sorted by UTF-8
  *     bytes, not UTF-16 code units — they differ above U+DFFF)
  *
  * A top-level JSON null (VOID) returns SQL NULL, like the struct key it
  * replaces: `nulls first|last` governs its placement and null group
  * keys drop; NESTED JSON nulls encode as rank 0x01 (the order minimum).
  */
object VariantKeyUtil {
  import VariantUtil.Type

  def sortKey(v: VariantVal): Array[Byte] = {
    val variant = new Variant(v.getValue, v.getMetadata)
    if (variant.getType == Type.NULL) return null
    val out = new ByteArrayOutputStream(48)
    write(variant, out)
    out.toByteArray
  }

  private def write(v: Variant, out: ByteArrayOutputStream): Unit = v.getType match {
    case Type.NULL =>
      out.write(0x01)
    case Type.BOOLEAN =>
      out.write(0x02); out.write(if (v.getBoolean) 1 else 0)
    case Type.LONG =>
      writeNum(v.getLong.toDouble, out)
    case Type.DECIMAL =>
      writeNum(v.getDecimal.doubleValue, out)
    case Type.FLOAT =>
      writeNum(v.getFloat.toDouble, out)
    case Type.DOUBLE =>
      writeNum(v.getDouble, out)
    case Type.DATE =>
      out.write(0x04); writeLongOffset(v.getLong * 86400000000L, out)
    case Type.TIMESTAMP | Type.TIMESTAMP_NTZ =>
      out.write(0x04); writeLongOffset(v.getLong, out)
    case Type.STRING =>
      out.write(0x06)
      writeEscaped(v.getString.getBytes(StandardCharsets.UTF_8), out)
      out.write(0x00)
    case Type.ARRAY =>
      out.write(0x07)
      var i = 0
      val n = v.arraySize()
      while (i < n) { write(v.getElementAtIndex(i), out); i += 1 }
      out.write(0x00)
    case Type.OBJECT =>
      out.write(0x08)
      val n = v.objectSize()
      val fields = new Array[(Array[Byte], Variant)](n)
      var i = 0
      while (i < n) {
        val f = v.getFieldAtIndex(i)
        fields(i) = (f.key.getBytes(StandardCharsets.UTF_8), f.value)
        i += 1
      }
      // the variant binary keeps object fields key-sorted (getFieldByKey
      // binary-searches), but sort defensively — BTreeMap order is the
      // contract, not the storage layout
      java.util.Arrays.sort(fields,
        (a: (Array[Byte], Variant), b: (Array[Byte], Variant)) =>
          compareBytes(a._1, b._1))
      i = 0
      while (i < n) {
        writeEscaped(fields(i)._1, out); out.write(0x00)
        write(fields(i)._2, out)
        i += 1
      }
      out.write(0x00)
    case Type.BINARY =>
      out.write(0x09); writeEscaped(v.getBinary, out); out.write(0x00)
    case _ => // UUID and future types: order after everything, by text
      out.write(0x0A)
      writeEscaped(v.toJson(java.time.ZoneOffset.UTC)
        .getBytes(StandardCharsets.UTF_8), out)
      out.write(0x00)
  }

  private def writeNum(d0: Double, out: ByteArrayOutputStream): Unit = {
    val d = if (d0 == 0.0) 0.0 else d0 // -0.0 == 0.0 in the reference
    val bits = java.lang.Double.doubleToLongBits(d)
    val enc = if (bits >= 0) bits ^ Long.MinValue else ~bits
    out.write(0x03)
    writeLongBE(enc, out)
  }

  private def writeLongOffset(l: Long, out: ByteArrayOutputStream): Unit =
    writeLongBE(l ^ Long.MinValue, out)

  private def writeLongBE(l: Long, out: ByteArrayOutputStream): Unit = {
    var s = 56
    while (s >= 0) { out.write(((l >>> s) & 0xFF).toInt); s -= 8 }
  }

  private def writeEscaped(bs: Array[Byte], out: ByteArrayOutputStream): Unit = {
    var i = 0
    while (i < bs.length) {
      val b = bs(i) & 0xFF
      if (b == 0x00) { out.write(0x01); out.write(0x01) }
      else if (b == 0x01) { out.write(0x01); out.write(0x02) }
      else out.write(b)
      i += 1
    }
  }

  private def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xFF) - (b(i) & 0xFF)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }
}

/** Catalyst expression: variant → order-preserving binary key (see
  * [[VariantKeyUtil]]). Returns SQL NULL for a top-level JSON null.
  */
case class VariantSortKey(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    VariantKeyUtil.sortKey(input.asInstanceOf[VariantVal])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.VariantKeyUtil.sortKey($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): VariantSortKey =
    copy(child = newChild)
}
