package graft.functions

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shallow merge of a group's property bags for the `make_bag` aggregate:
  * input is the group's bag JSON texts ALREADY SORTED (the aggregate wraps
  * `sort_array(collect_list(...))`), so "first bag wins on key collision"
  * is a deterministic rule — arbitrary-but-stable under repartitioning and
  * re-runs, the same policy as take_any/make_set (Kusto leaves the winner
  * unspecified). Non-object and malformed elements are skipped (Kusto
  * ignores non-bag values); no bags at all → an empty bag `{}`. Output is
  * canonical key-sorted JSON, which the caller re-parses to a variant.
  */
object MergeBagsUtil {
  private val mapper = new ObjectMapper()

  def merge(arr: ArrayData): UTF8String = {
    val out = new java.util.TreeMap[String, com.fasterxml.jackson.databind.JsonNode]()
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        try {
          mapper.readTree(arr.getUTF8String(i).toString) match {
            case o: ObjectNode =>
              val it = o.fields()
              while (it.hasNext) {
                val e = it.next()
                out.putIfAbsent(e.getKey, e.getValue) // first (sorted) wins
              }
            case _ => () // non-object: skipped
          }
        } catch { case _: Exception => () } // malformed: skipped
      }
      i += 1
    }
    val node = mapper.createObjectNode()
    out.forEach((k, v) => node.set[com.fasterxml.jackson.databind.JsonNode](k, v))
    UTF8String.fromString(mapper.writeValueAsString(node))
  }
}

/** Key removal for the `bag_remove_keys` scalar: parse the bag JSON,
  * drop the listed TOP-LEVEL keys (Kusto's nested JSONPath form is a
  * documented narrowing), re-serialize with sorted keys (the engine's
  * canonical bag text). Non-object or malformed input → null.
  */
object BagKeysUtil {
  private val mapper = new ObjectMapper()

  def remove(json: UTF8String, keys: ArrayData): UTF8String = {
    if (json == null) return null
    try {
      mapper.readTree(json.toString) match {
        case o: ObjectNode =>
          var i = 0
          val n = keys.numElements()
          while (i < n) {
            if (!keys.isNullAt(i)) o.remove(keys.getUTF8String(i).toString)
            i += 1
          }
          val out = new java.util.TreeMap[String, com.fasterxml.jackson.databind.JsonNode]()
          val it = o.fields()
          while (it.hasNext) { val e = it.next(); out.put(e.getKey, e.getValue) }
          val node = mapper.createObjectNode()
          out.forEach((k, v) =>
            node.set[com.fasterxml.jackson.databind.JsonNode](k, v))
          UTF8String.fromString(mapper.writeValueAsString(node))
        case _ => null
      }
    } catch { case _: Exception => null }
  }
}

/** Catalyst expression: (bag JSON text, keys array) → pruned canonical
  * JSON text. */
case class BagRemoveKeys(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(l: Any, r: Any): Any =
    BagKeysUtil.remove(l.asInstanceOf[UTF8String], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, r) => s"graft.functions.BagKeysUtil.remove($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BagRemoveKeys =
    copy(left = newLeft, right = newRight)
}

/** Catalyst expression: array of bag JSON texts → merged canonical JSON. */
case class MergeJsonBags(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    MergeBagsUtil.merge(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MergeBagsUtil.merge($c)")

  override protected def withNewChildInternal(newChild: Expression): MergeJsonBags =
    copy(child = newChild)
}
