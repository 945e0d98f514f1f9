package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Round-5 surface: `print` scalar source, `distinct *`, `mv-expand
  * with_itemindex=`, and join `hint.strategy=broadcast|shuffle` (honored
  * as Spark join hints; other Kusto hints accepted and ignored).
  */
class PrintHintsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("t", Seq(
      (1L, "a", "x,y"), (1L, "a", "x,y"), (2L, "b", ""), (2L, "b", "z")
    ).toDF("id", "s", "csv"))
    c.register("dim", Seq((1L, "one"), (2L, "two")).toDF("id", "name"))
    // a table literally named `print` stays scannable (print with no
    // expression is a scan, Kusto's print always has one)
    c.register("print", Seq((42L, "t")).toDF("n", "v"))
    c
  }

  private def run(kql: String) = Kql.run(spark, cat, kql)

  // ───────── print ─────────

  test("print: named and positional columns, scalar values") {
    val df = run("print x = 1 + 2, strcat('a', 'b'), ok = 5 > 1")
    assert(df.columns.toSeq == Seq("x", "print_1", "ok"))
    val r = df.collect().head
    assert(r.getLong(0) == 3L && r.getString(1) == "ab" && r.getBoolean(2))
    assert(df.count() == 1)
  }

  test("print feeds a pipeline tail") {
    val r = run("print n = 10 | extend m = n * 2 | project m").collect().head
    assert(r.getLong(0) == 20L)
  }

  test("a table named print is still scannable") {
    assert(run("print | count").collect().head.getLong(0) == 1L)
    assert(run("print").collect().head.getLong(0) == 42L)
  }

  // ───────── distinct * ─────────

  test("distinct * dedupes whole rows") {
    val df = run("t | distinct * | sort by id asc, csv asc")
    assert(df.count() == 3)
    assert(df.columns.toSeq == Seq("id", "s", "csv"))
  }

  // ───────── mv-expand with_itemindex ─────────

  test("with_itemindex numbers elements from 0; pass-through rows get null") {
    val df = run(
      """t | where id == 1 | take 1
        | | extend a = split(csv, ',')
        | | mv-expand with_itemindex=ix a
        | | project a, ix""".stripMargin)
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("x", 0L), ("y", 1L)))
    // a row whose expansion is null passes through once, index null
    val nulls = run(
      """t | where id == 2
        | | extend a = split(csv, ',', 5)
        | | extend arr = pack_array(a)
        | | mv-expand with_itemindex=ix arr
        | | project arr, ix""".stripMargin).collect()
    assert(nulls.length == 2)
    assert(nulls.forall(r => r.isNullAt(0) || !r.isNullAt(1)))
  }

  // ───────── join hints ─────────

  private def joinPlan(hint: String): String =
    run(s"t | join $hint(dim) on $$left.id == $$right.id" +
      " | project id, name").queryExecution.executedPlan.toString

  test("hint.strategy=broadcast forces a broadcast hash join") {
    assert(joinPlan("hint.strategy=broadcast ").contains("BroadcastHashJoin"))
  }

  test("hint.strategy=shuffle suppresses the broadcast") {
    val p = joinPlan("hint.strategy=shuffle ")
    assert(!p.contains("BroadcastHashJoin"), s"broadcast not suppressed:\n$p")
    assert(p.contains("ShuffledHashJoin"), s"expected shuffle hash join:\n$p")
  }

  test("hinted joins return the same rows as unhinted") {
    val base = run("t | join (dim) on $left.id == $right.id" +
      " | project id, s, name | sort by id asc, s asc").collect().toSeq
    for (h <- Seq("hint.strategy=broadcast ", "hint.strategy=shuffle ",
        "hint.num_partitions=7 ")) {
      val got = run(s"t | join $h(dim) on $$left.id == $$right.id" +
        " | project id, s, name | sort by id asc, s asc").collect().toSeq
      assert(got == base, s"hint '$h' changed results")
    }
  }

  test("summarize tolerates and ignores Kusto shuffle hints") {
    val base = run("t | summarize n = count() by s | sort by s asc")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val hinted = run(
      "t | summarize hint.shufflekey=s n = count() by s | sort by s asc")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(hinted == base)
  }

  test("unknown join strategy fails loudly") {
    val e = intercept[KqlParseException] {
      run("t | join hint.strategy=cartesian (dim) on $left.id == $right.id")
    }
    assert(e.getMessage.contains("unknown join strategy"))
  }

  // ───────── render / set no-ops ─────────

  test("render is a row-preserving no-op, with and without properties") {
    val base = run("t | summarize n = count() by id | sort by id asc")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val rendered = run(
      "t | summarize n = count() by id | sort by id asc | render timechart")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rendered == base)
    val withProps = run(
      """t | summarize n = count() by id | sort by id asc
        | | render columnchart with (title = 'x', ysplit = axes)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(withProps == base)
    assert(Kql.renderSteps(Kql.parse("t | render barchart"))
      .contains("render barchart"))
  }

  test("set statements are accepted and discarded") {
    val df = run(
      """set notruncation;
        |set truncationmaxsize = 1000000;
        |t | count""".stripMargin)
    assert(df.collect().head.getLong(0) == 4L)
  }
}
