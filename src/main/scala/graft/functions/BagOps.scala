package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `dynamic_to_json` (canonical JSON: object keys sorted RECURSIVELY,
  * array order preserved) and `bag_set_key` (set/replace a top-level key;
  * Kusto's nested JSONPath form is a documented narrowing, same rule as
  * bag_remove_keys). Output is the engine's canonical bag text, which
  * re-parses to a variant. Malformed JSON input → null (row-error
  * policy).
  */
object BagOpsUtil {
  private val mapper = new ObjectMapper()

  private def canonNode(n: JsonNode): JsonNode = n match {
    case o: ObjectNode =>
      val sorted = new java.util.TreeMap[String, JsonNode]()
      val it = o.fields()
      while (it.hasNext) { val e = it.next(); sorted.put(e.getKey, canonNode(e.getValue)) }
      val out = mapper.createObjectNode()
      sorted.forEach((k, v) => out.set[JsonNode](k, v))
      out
    case a: ArrayNode =>
      val out = mapper.createArrayNode()
      val it = a.elements()
      while (it.hasNext) out.add(canonNode(it.next()))
      out
    case other => other
  }

  def canon(json: UTF8String): UTF8String = {
    if (json == null) return null
    try UTF8String.fromString(
      mapper.writeValueAsString(canonNode(mapper.readTree(json.toString))))
    catch { case _: Exception => null }
  }

  def setKey(json: UTF8String, key: UTF8String, valueJson: UTF8String): UTF8String = {
    if (json == null || key == null) return null
    try {
      mapper.readTree(json.toString) match {
        case o: ObjectNode =>
          val v: JsonNode =
            if (valueJson == null) mapper.nullNode()
            else mapper.readTree(valueJson.toString)
          o.set[JsonNode](key.toString, v)
          UTF8String.fromString(mapper.writeValueAsString(canonNode(o)))
        case _ => null // not a bag
      }
    } catch { case _: Exception => null }
  }
}

/** Catalyst expression: JSON text → recursively key-sorted canonical
  * text; malformed → null. */
case class CanonJson(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    BagOpsUtil.canon(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.BagOpsUtil.canon($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): CanonJson =
    copy(child = newChild)
}

/** Catalyst expression: (bag JSON, key, value JSON) → canonical bag with
  * the key set; a null VALUE sets JSON null (key still present), a null
  * bag/key or a non-object bag → null result. */
case class BagSetKey(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  // a null value operand is MEANINGFUL (sets JSON null) — evaluate all
  // three ourselves instead of the null-short-circuiting default
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    BagOpsUtil.setKey(
      first.eval(input).asInstanceOf[UTF8String],
      second.eval(input).asInstanceOf[UTF8String],
      third.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = first.genCode(ctx)
    val k = second.genCode(ctx)
    val v = third.genCode(ctx)
    val code =
      code"""
        ${b.code}
        ${k.code}
        ${v.code}
        boolean ${ev.isNull} = false;
        UTF8String ${ev.value} = graft.functions.BagOpsUtil.setKey(
          ${b.isNull} ? null : ${b.value},
          ${k.isNull} ? null : ${k.value},
          ${v.isNull} ? null : ${v.value});
        if (${ev.value} == null) { ${ev.isNull} = true; }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): BagSetKey =
    copy(first = f, second = s, third = t)
}
