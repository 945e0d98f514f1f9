package graft.functions

import java.io.ByteArrayOutputStream
import java.util.Base64
import java.util.zip.{Deflater, GZIPInputStream, GZIPOutputStream, Inflater}

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kusto's compression codec scalars:
  * `gzip_compress_to_base64_string` / `gzip_decompress_from_base64_string`
  * and `zlib_compress_to_base64_string` / `zlib_decompress_from_base64_string`.
  * Text is UTF-8 encoded, deflated at the default level, base64'd (and the
  * reverse). Malformed base64 / corrupt streams on the decompress side are
  * a row error ⇒ null, the engine's error policy. Compressed bytes are a
  * round-trip contract, not a canonical form: different zlib builds may
  * emit different (equally valid) streams for the same input, so tests pin
  * DECOMPRESSION of fixed vectors plus round-trips, never compressed
  * output bytes across engines.
  */
object CodecsUtil {
  def gzipCompress(s: UTF8String): UTF8String = {
    if (s == null) return null
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(s.getBytes)
    gz.close()
    UTF8String.fromString(Base64.getEncoder.encodeToString(bos.toByteArray))
  }

  def gzipDecompress(s: UTF8String): UTF8String = {
    if (s == null) return null
    try {
      val in = new GZIPInputStream(
        new java.io.ByteArrayInputStream(Base64.getDecoder.decode(s.toString)))
      UTF8String.fromBytes(in.readAllBytes())
    } catch { case _: Exception => null }
  }

  def zlibCompress(s: UTF8String): UTF8String = {
    if (s == null) return null
    val d = new Deflater()
    d.setInput(s.getBytes)
    d.finish()
    val buf = new Array[Byte](8192)
    val bos = new ByteArrayOutputStream()
    while (!d.finished()) {
      val n = d.deflate(buf)
      bos.write(buf, 0, n)
    }
    d.end()
    UTF8String.fromString(Base64.getEncoder.encodeToString(bos.toByteArray))
  }

  def zlibDecompress(s: UTF8String): UTF8String = {
    if (s == null) return null
    try {
      val inf = new Inflater()
      inf.setInput(Base64.getDecoder.decode(s.toString))
      val buf = new Array[Byte](8192)
      val bos = new ByteArrayOutputStream()
      var done = inf.finished()
      while (!done) {
        val n = inf.inflate(buf)
        if (n > 0) bos.write(buf, 0, n)
        // check finished BEFORE the truncation test: an empty payload
        // finishes on an inflate that wrote 0 bytes with input drained
        if (inf.finished()) done = true
        else if (n == 0 && inf.needsInput())
          throw new RuntimeException("truncated")
      }
      inf.end()
      UTF8String.fromBytes(bos.toByteArray)
    } catch { case _: Exception => null }
  }
}

/** Catalyst expression for the four codec scalars — `op` picks the static
  * helper; codegen is a direct static call like the other kernels. */
case class CodecExpr(child: Expression, op: String) extends UnaryExpression {
  override def dataType: DataType = StringType
  // the decompress ops null out corrupt input regardless of child
  // nullability
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = op match {
    case "gzip_c" => CodecsUtil.gzipCompress(input.asInstanceOf[UTF8String])
    case "gzip_d" => CodecsUtil.gzipDecompress(input.asInstanceOf[UTF8String])
    case "zlib_c" => CodecsUtil.zlibCompress(input.asInstanceOf[UTF8String])
    case "zlib_d" => CodecsUtil.zlibDecompress(input.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = op match {
      case "gzip_c" => "gzipCompress"
      case "gzip_d" => "gzipDecompress"
      case "zlib_c" => "zlibCompress"
      case "zlib_d" => "zlibDecompress"
    }
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.CodecsUtil.$m($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): CodecExpr =
    copy(child = newChild)

  override def prettyName: String = op
}
