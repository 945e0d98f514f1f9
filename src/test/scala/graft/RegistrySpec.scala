package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Armor for the driver's correctness gate: its pandas-based comparator
  * sorts result rows with `sort_values`, which cannot factorize complex
  * cells (`TypeError: unhashable type: 'numpy.ndarray'`). Round 6 lost 5
  * otherwise-correct gate rows exactly this way. Every registered query
  * must therefore emit only atomic top-level columns — stringify arrays
  * with `strcat_array(...)` / `tostring(...)` before the final project.
  *
  * Schema-only: `fn(spark, sf)` analyzes the plan without executing it,
  * so this covers all registered queries in seconds.
  */
class RegistrySpec extends AnyFunSuite {
  import TestSpark._

  test("no registered query emits a complex top-level column") {
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val bad = fn(spark, sf).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
                  f.dataType.isInstanceOf[MapType] ||
                  f.dataType.isInstanceOf[StructType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
      bad
    }
    assert(offenders.isEmpty,
      s"driver comparator cannot sort complex columns:\n  " +
        offenders.mkString("\n  "))
  }

  test("every query has an oracle (or is explicitly rows-only)") {
    // Rows-only queries get a weaker gate; keep the set empty so any new
    // query without an oracle is a conscious decision, not an omission.
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries without oracle SQL: $noOracle")
  }
}
