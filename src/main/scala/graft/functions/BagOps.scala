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

/** `parse_xml` — XML text → the engine's canonical JSON (which the
  * caller re-parses to a variant). Kusto's mapping: attributes become
  * `@name` keys, child elements become keys (repeated siblings collapse
  * to an array, document order), mixed/attributed text lands under
  * `#text`, attribute-and-child-free elements map to their text (empty
  * ⇒ null). Keys sort per the engine's canonical-bag convention
  * (documented deviation — Kusto preserves document order). The parser
  * refuses DOCTYPE/external entities (no XXE, no file or network
  * reads); malformed XML → null.
  */
object ParseXmlUtil {
  private val mapper = new ObjectMapper()

  private def factory(): javax.xml.parsers.DocumentBuilderFactory = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setFeature("http://xml.org/sax/features/external-general-entities", false)
    f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    f.setXIncludeAware(false)
    f.setExpandEntityReferences(false)
    f
  }

  private def elemToNode(e: org.w3c.dom.Element): JsonNode = {
    val attrs = e.getAttributes
    val kids = e.getChildNodes
    val childElems = scala.collection.mutable.ArrayBuffer[org.w3c.dom.Element]()
    val text = new java.lang.StringBuilder()
    var i = 0
    while (i < kids.getLength) {
      kids.item(i) match {
        case ce: org.w3c.dom.Element => childElems += ce
        case t: org.w3c.dom.Text => text.append(t.getData)
        case c: org.w3c.dom.CDATASection => text.append(c.getData)
        case _ => ()
      }
      i += 1
    }
    val txt = text.toString.trim
    if (attrs.getLength == 0 && childElems.isEmpty) {
      if (txt.isEmpty) mapper.nullNode() else mapper.getNodeFactory.textNode(txt)
    } else {
      val o = mapper.createObjectNode()
      var a = 0
      while (a < attrs.getLength) {
        val at = attrs.item(a).asInstanceOf[org.w3c.dom.Attr]
        o.put("@" + at.getName, at.getValue)
        a += 1
      }
      // repeated sibling names collapse to arrays in document order
      val grouped = scala.collection.mutable.LinkedHashMap[String,
        scala.collection.mutable.ArrayBuffer[JsonNode]]()
      childElems.foreach { ce =>
        grouped.getOrElseUpdate(ce.getTagName,
          scala.collection.mutable.ArrayBuffer[JsonNode]()) += elemToNode(ce)
      }
      grouped.foreach { case (name, vs) =>
        if (vs.length == 1) o.set[JsonNode](name, vs.head)
        else {
          val arr = mapper.createArrayNode()
          vs.foreach(arr.add)
          o.set[JsonNode](name, arr)
        }
      }
      if (txt.nonEmpty) o.put("#text", txt)
      o
    }
  }

  def parse(xml: UTF8String): UTF8String = {
    if (xml == null) return null
    try {
      val doc = factory().newDocumentBuilder().parse(
        new java.io.ByteArrayInputStream(
          xml.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      val root = doc.getDocumentElement
      val o = mapper.createObjectNode()
      o.set[JsonNode](root.getTagName, elemToNode(root))
      BagOpsUtil.canon(UTF8String.fromString(mapper.writeValueAsString(o)))
    } catch { case _: Exception => null }
  }
}

/** Catalyst expression for parse_xml. */
case class ParseXml(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ParseXmlUtil.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ParseXmlUtil.parse($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): ParseXml =
    copy(child = newChild)
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
