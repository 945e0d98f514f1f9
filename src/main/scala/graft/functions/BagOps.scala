package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType, VariantType}
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
      val builder = factory().newDocumentBuilder()
      // default handler prints "[Fatal Error]" to stderr for malformed
      // input — row errors are a normal occurrence, keep logs quiet
      builder.setErrorHandler(new org.xml.sax.helpers.DefaultHandler())
      val doc = builder.parse(
        new java.io.ByteArrayInputStream(
          xml.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      val root = doc.getDocumentElement
      val o = mapper.createObjectNode()
      o.set[JsonNode](root.getTagName, elemToNode(root))
      BagOpsUtil.canon(UTF8String.fromString(mapper.writeValueAsString(o)))
    } catch { case _: Exception => null }
  }
}

/** `buildschema` — the minimal schema a dynamic column's values all fit.
  * Per-row [[SchemaOf]] renders a value's shape (objects → key maps,
  * arrays → `{"\`indexer\`": element-schema}`, scalars → "long"/"real"/
  * "string"/"bool"/"null"), and the aggregate merges the group's distinct
  * shapes ([[SchemaMerge]]): objects union their keys recursively,
  * conflicting shapes become a SORTED array of alternatives, and "null"
  * drops when any other alternative exists. Deterministic (canonical
  * key-sorted text, sorted alternative lists) — Kusto's output for the
  * same data, modulo its unspecified ordering.
  */
object BuildSchemaUtil {
  private val mapper = new ObjectMapper()

  private def typeNode(n: JsonNode): JsonNode = {
    if (n.isObject) {
      val o = n.asInstanceOf[ObjectNode]
      val sorted = new java.util.TreeMap[String, JsonNode]()
      val it = o.fields()
      while (it.hasNext) { val e = it.next(); sorted.put(e.getKey, typeNode(e.getValue)) }
      val out = mapper.createObjectNode()
      sorted.forEach((k, v) => out.set[JsonNode](k, v))
      out
    } else if (n.isArray) {
      val elems = new java.util.ArrayList[JsonNode]()
      val it = n.elements()
      while (it.hasNext) elems.add(typeNode(it.next()))
      val inner =
        if (elems.isEmpty) mapper.getNodeFactory.textNode("null")
        else {
          var acc = elems.get(0)
          var i = 1
          while (i < elems.size()) { acc = mergeNode(acc, elems.get(i)); i += 1 }
          acc
        }
      val out = mapper.createObjectNode()
      out.set[JsonNode]("`indexer`", inner)
      out
    } else if (n.isTextual) mapper.getNodeFactory.textNode("string")
    else if (n.isIntegralNumber) mapper.getNodeFactory.textNode("long")
    else if (n.isNumber) mapper.getNodeFactory.textNode("real")
    else if (n.isBoolean) mapper.getNodeFactory.textNode("bool")
    else mapper.getNodeFactory.textNode("null")
  }

  private def mergeNode(a: JsonNode, b: JsonNode): JsonNode = {
    if (a == b) return a
    // an array schema is an object keyed "`indexer`" — merging one with a
    // genuine object schema must yield ALTERNATIVES, not a key union
    def isArraySchema(n: JsonNode): Boolean =
      n.isObject && n.has("`indexer`")
    if (a.isObject && b.isObject &&
        isArraySchema(a) == isArraySchema(b)) {
      val keys = new java.util.TreeSet[String]()
      a.fieldNames().forEachRemaining(k => keys.add(k))
      b.fieldNames().forEachRemaining(k => keys.add(k))
      val out = mapper.createObjectNode()
      keys.forEach { k =>
        (Option(a.get(k)), Option(b.get(k))) match {
          case (Some(x), Some(y)) => out.set[JsonNode](k, mergeNode(x, y))
          case (Some(x), None) => out.set[JsonNode](k, x)
          case (None, Some(y)) => out.set[JsonNode](k, y)
          case _ => ()
        }
      }
      out
    } else {
      // union of alternatives: flatten, dedup, drop "null" beside others,
      // sort by canonical text for determinism
      def flat(n: JsonNode): Seq[JsonNode] =
        if (n.isArray) {
          val b = Seq.newBuilder[JsonNode]
          n.elements().forEachRemaining(e => b += e)
          b.result()
        } else Seq(n)
      val alts0 = (flat(a) ++ flat(b)).distinct
      val alts1 =
        if (alts0.length > 1)
          alts0.filterNot(x => x.isTextual && x.asText == "null")
        else alts0
      // pairwise-compatible alternatives still merge structurally:
      // object-with-object (and array-with-array) union their keys even
      // when a scalar shape sits beside them — {"a"},{"b"},"string" is
      // [{a,b},"string"], not [{a},{b},"string"]
      val merged = scala.collection.mutable.ArrayBuffer[JsonNode]()
      alts1.foreach { n =>
        val idx = merged.indexWhere(m => m.isObject && n.isObject &&
          isArraySchema(m) == isArraySchema(n))
        if (idx >= 0) merged(idx) = mergeNode(merged(idx), n)
        else merged += n
      }
      val alts = merged.toSeq.sortBy(_.toString)
      if (alts.length == 1) alts.head
      else {
        val arr = mapper.createArrayNode()
        alts.foreach(arr.add)
        arr
      }
    }
  }

  def schemaOf(json: UTF8String): UTF8String = {
    if (json == null) return null
    try UTF8String.fromString(
      mapper.writeValueAsString(typeNode(mapper.readTree(json.toString))))
    catch { case _: Exception =>
      // not valid JSON — a bare string value's schema
      UTF8String.fromString("\"string\"")
    }
  }

  /** Same shape tree, walked over the BINARY variant encoding — no JSON
    * serialize + Jackson reparse (the round-7 kql_aggschema fix).
    */
  private def typeNodeVariant(
      v: org.apache.spark.types.variant.Variant): JsonNode = {
    import org.apache.spark.types.variant.VariantUtil.{Type => VT}
    v.getType match {
      case VT.OBJECT =>
        val sorted = new java.util.TreeMap[String, JsonNode]()
        var i = 0
        while (i < v.objectSize()) {
          val f = v.getFieldAtIndex(i)
          sorted.put(f.key, typeNodeVariant(f.value))
          i += 1
        }
        val out = mapper.createObjectNode()
        sorted.forEach((k, n) => out.set[JsonNode](k, n))
        out
      case VT.ARRAY =>
        val n = v.arraySize()
        val inner =
          if (n == 0) mapper.getNodeFactory.textNode("null")
          else {
            var acc = typeNodeVariant(v.getElementAtIndex(0))
            var i = 1
            while (i < n) {
              acc = mergeNode(acc, typeNodeVariant(v.getElementAtIndex(i)))
              i += 1
            }
            acc
          }
        val out = mapper.createObjectNode()
        out.set[JsonNode]("`indexer`", inner)
        out
      case VT.STRING | VT.BINARY | VT.UUID =>
        mapper.getNodeFactory.textNode("string")
      case VT.LONG => mapper.getNodeFactory.textNode("long")
      case VT.DOUBLE | VT.FLOAT | VT.DECIMAL =>
        mapper.getNodeFactory.textNode("real")
      case VT.BOOLEAN => mapper.getNodeFactory.textNode("bool")
      case VT.DATE | VT.TIMESTAMP | VT.TIMESTAMP_NTZ =>
        mapper.getNodeFactory.textNode("datetime")
      case _ => mapper.getNodeFactory.textNode("null")
    }
  }

  def schemaOfVariant(
      v: org.apache.spark.unsafe.types.VariantVal): UTF8String = {
    if (v == null) return null
    try UTF8String.fromString(mapper.writeValueAsString(typeNodeVariant(
      new org.apache.spark.types.variant.Variant(v.getValue, v.getMetadata))))
    catch { case _: Exception => null }
  }

  def merge(arr: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    if (arr == null) return null
    var acc: JsonNode = null
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        try {
          val n = mapper.readTree(arr.getUTF8String(i).toString)
          acc = if (acc == null) n else mergeNode(acc, n)
        } catch { case _: Exception => () }
      }
      i += 1
    }
    if (acc == null) UTF8String.fromString("\"null\"")
    else UTF8String.fromString(mapper.writeValueAsString(acc))
  }
}

/** `treepath` — every path expression into a dynamic value, Kusto's
  * `['a']['b']` rendering: object keys append `['key']`, arrays descend
  * into their elements WITHOUT an index (element paths merge — Kusto's
  * shape), intermediate and leaf paths all enumerate. Output is sorted
  * and distinct (deterministic; Kusto leaves order unspecified).
  * Non-object/array input → empty array; malformed → null. */
object TreePathUtil {
  private val mapper = new ObjectMapper()

  def paths(json: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (json == null) return null
    try {
      val out = new java.util.TreeSet[String]()
      def walk(n: JsonNode, prefix: String): Unit = {
        if (n.isObject) {
          val it = n.fields()
          while (it.hasNext) {
            val e = it.next()
            val p = prefix + "['" + e.getKey + "']"
            out.add(p)
            walk(e.getValue, p)
          }
        } else if (n.isArray) {
          val it = n.elements()
          while (it.hasNext) walk(it.next(), prefix)
        }
      }
      walk(mapper.readTree(json.toString), "")
      val arr = new Array[Any](out.size())
      var i = 0
      out.forEach { p => arr(i) = UTF8String.fromString(p); i += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
    } catch { case _: Exception => null }
  }
}

/** Catalyst expression for treepath. */
case class TreePath(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    TreePathUtil.paths(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TreePathUtil.paths($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildInternal(newChild: Expression): TreePath =
    copy(child = newChild)
}

/** Per-row schema rendering for buildschema. A VariantType child walks the
  * BINARY variant encoding directly (`org.apache.spark.types.variant
  * .Variant`) — profiling showed the old variant→JSON-string→Jackson
  * round-trip cost more than the schema walk itself (kql_aggschema audit,
  * round 7: 0.53 s → this path removes the serialize+reparse leg).
  */
case class SchemaOf(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  // def, not val: dataType is illegal on an unresolved child
  private def fromVariant = child.dataType.isInstanceOf[VariantType]
  override def nullSafeEval(input: Any): Any =
    if (fromVariant)
      BuildSchemaUtil.schemaOfVariant(
        input.asInstanceOf[org.apache.spark.unsafe.types.VariantVal])
    else BuildSchemaUtil.schemaOf(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (fromVariant) "schemaOfVariant" else "schemaOf"
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.BuildSchemaUtil.$fn($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): SchemaOf =
    copy(child = newChild)
}

/** Merge of a group's collected schema texts for buildschema. */
case class SchemaMerge(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    BuildSchemaUtil.merge(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.BuildSchemaUtil.merge($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildInternal(newChild: Expression): SchemaMerge =
    copy(child = newChild)
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
