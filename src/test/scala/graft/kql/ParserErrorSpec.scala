package graft.kql

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's parser error tests
  * (`miso-kql/src/parser_tests.rs:838-860,1157-1250`): single-error cases,
  * line/column positioning, join-condition validation, and multi-error
  * recovery. Where the reference's chumsky combinators emit extra
  * sub-expression diagnostics our step-level recovery emits one per broken
  * step, so exact counts differ on two cases (noted inline); the recovery
  * behavior itself — all broken steps surfaced in one parse — matches.
  */
class ParserErrorSpec extends AnyFunSuite {

  private def errs(q: String): Seq[ParseError] =
    intercept[KqlParseException](Parser.parse(q)).errors

  // test_error_cases (parser_tests.rs:838)
  Seq(
    "invalid syntax",
    "connector.table | where",
    "connector.table | limit -1",
    "connector.table | project",
    "connector.table | sort by").foreach { q =>
    test(s"error case: $q") {
      intercept[KqlParseException](Parser.parse(q))
    }
  }

  // test_parse_error_includes_line_and_column (parser_tests.rs:1157)
  test("parse error includes line and column") {
    val e = errs("connector.table | where field1 == \"value\"\n| invalid_operator field2")
    assert(e.map(x => (x.line, x.column)) == Seq((2, 3)))
  }

  // test_join_condition_validation (parser_tests.rs:1176)
  test("join condition comparing $left to $left mentions both sides") {
    val e = intercept[KqlParseException](Parser.parse(
      "connector.table | join kind=inner (other.table) on $left.field1 == $left.field2"))
    assert(e.getMessage.contains("$left") && e.getMessage.contains("$right"))
  }

  // test_error_recovery_collects_multiple_errors (parser_tests.rs:1237) —
  // multiple_malformed_query_steps: reference counts 4 (chumsky emits an
  // extra sub-expression error); step-level recovery surfaces one per
  // broken step = 3, and the valid trailing sort still parses
  test("recovery surfaces every broken step in one parse") {
    val e = errs("connector.table | where | project | limit invalid | sort by field1")
    assert(e.length == 3, e.mkString("; "))
  }

  // mixed_valid_and_invalid_project_expressions: broken exprs inside one
  // project step — step-level recovery reports the step once
  test("broken project expressions recover to the next step") {
    val e = errs("connector.table | project field1 = field2 +, invalid_field =, field3 = field4 * 2 | count")
    assert(e.nonEmpty)
  }

  // completely_malformed_pipeline: every broken step surfaces; the valid
  // trailing `count` still parses
  test("completely malformed pipeline yields one diagnostic per step") {
    val e = errs("connector.table | invalid_step syntax | where | project = | limit abc | sort by | count")
    assert(e.length == 5, e.mkString("; "))
  }

  test("broken join subquery recovers without eating the outer query") {
    val e = errs("connector.table | join (connector.table2 | where) on $left.f == $right.f | where")
    assert(e.length == 2, e.mkString("; "))
  }

  test("the expected set names step keywords at a broken step boundary") {
    val e = errs("events | frobnicate")
    assert(e.head.expected.contains("where") && e.head.expected.contains("summarize"))
  }

  test("a recovered parse still throws — broken queries never execute") {
    // recovery is for diagnostics, not tolerance: the aggregate throw
    // must carry the first error's position for the single-error API
    val ex = intercept[KqlParseException](Parser.parse("events | where | count"))
    assert(ex.errors.nonEmpty && ex.pos == ex.errors.head.pos)
  }
}
