package graft.kql

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Semi/anti join kinds — beyond the reference's inner/outer/left/right
  * (join.rs): existence filtering that never widens the row.
  */
class ExistenceJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("l", Seq(
      (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v"))
    // id 2 appears twice: semi must still emit the left row ONCE
    c.register("r", Seq(
      (2L, "x"), (2L, "y"), (3L, "z")).toDF("id", "w"))
    c
  }

  private def run(kql: String): DataFrame = Kql.run(spark, cat, kql)

  test("leftsemi keeps matching left rows once, left columns only") {
    val got = run("l | join kind=leftsemi (r) on id | sort by id asc")
    assert(got.columns.toSeq == Seq("id", "v"))
    assert(got.as[(Long, String)].collect().toSeq == Seq((2L, "b"), (3L, "c")))
  }

  test("leftanti keeps the complement") {
    val got = run("l | join kind=leftanti (r) on id | sort by id asc")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (4L, "d")))
  }

  test("rightsemi/rightanti mirror with right columns") {
    val semi = run("l | join kind=rightsemi (r) on id | sort by id asc, w asc")
    assert(semi.columns.toSeq == Seq("id", "w"))
    assert(semi.as[(Long, String)].collect().toSeq ==
      Seq((2L, "x"), (2L, "y"), (3L, "z")))
    val anti = run("l | join kind=rightanti (r) on id")
    assert(anti.count() == 0)
  }

  test("null keys drop from both sides, like the other join kinds") {
    val c2 = new Catalog(spark)
    c2.register("ln", Seq(
      (Some(1L), "a"), (None, "b")).toDF("id", "v"))
    c2.register("rn", Seq((Some(9L), "x"), (None, "y")).toDF("id", "w"))
    // anti: the null-key left row is DROPPED (missing key ⇒ row excluded
    // from the join, reference join.rs:183-185), not treated as unmatched
    val got = Kql.run(spark, c2, "ln | join kind=leftanti (rn) on id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a")))
  }

  test("semi/anti plan as hash existence joins, not nested loops") {
    val p = run("l | join kind=leftanti (r) on id")
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), s"expected an anti hash join:\n$p")
    assert(!p.contains("NestedLoopJoin"))
  }
}
