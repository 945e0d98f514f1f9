package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** `scan` — ordered sequence matching with Kusto's per-step state model
  * (one active sequence per step, promotions in reverse step order — see
  * the compiler scaladoc): step conditions are codegen'd boolean columns;
  * only the state machine is imperative, per key group. Serialized input
  * required; distributes inside `partition by`.
  */
class ScanMatchSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    // one user's ordered event tape: v=view c=click p=purchase
    c.register("tape", Seq(
      (1L, "c"), (2L, "v"), (3L, "v"), (4L, "c"), (5L, "p"),
      (6L, "p"), (7L, "v"), (8L, "p"), (9L, "c")
    ).toDF("i", "e"))
    c.register("multi", Seq(
      ("u1", 1L, "v"), ("u1", 2L, "p"),
      ("u2", 1L, "p"), ("u2", 2L, "v"), ("u2", 3L, "v"), ("u2", 4L, "p")
    ).toDF("u", "i", "e"))
    c
  }

  private def run(kql: String) = Kql.run(spark, cat, kql)

  test("declare: per-sequence variables accumulate and reset") {
    val df = run(
      """tape | sort by i asc
        | | scan declare (cnt: long = 0, tot: long = 0) with (
        |     step s1: e == 'v' => cnt = cnt + 1, tot = tot + i;
        |     step s2: e == 'p' => cnt = cnt + 1, tot = tot + i)
        | | project i, step, match_id, cnt, tot""".stripMargin)
    // m1: views at 2,3 then purchase at 5 — cnt/tot accumulate; m2
    // starts at 7 with RESET variables (per-sequence state, ADX's rule)
    assert(df.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getLong(4))).toSeq == Seq(
      (2L, "s1", 1L, 1L, 2L), (3L, "s1", 1L, 2L, 5L),
      (5L, "s2", 1L, 3L, 10L),
      (7L, "s1", 2L, 1L, 7L), (8L, "s2", 2L, 2L, 15L)))
  }

  test("declare: real max_of and plain set assignments") {
    val df = run(
      """tape | sort by i asc
        | | scan declare (mx: real = 0.0, last: long = 0) with (
        |     step s1: e == 'v' => mx = max_of(mx, todouble(i)), last = i;
        |     step s2: e == 'p' => last = i)
        | | project i, step, mx, last""".stripMargin)
    assert(df.collect().map(r => (r.getLong(0), r.getString(1),
      r.getDouble(2), r.getLong(3))).toSeq == Seq(
      (2L, "s1", 2.0, 2L), (3L, "s1", 3.0, 3L), (5L, "s2", 3.0, 5L),
      (7L, "s1", 7.0, 7L), (8L, "s2", 7.0, 8L)))
  }

  test("declare: rejected shapes error clearly") {
    val e1 = intercept[KqlParseException](run(
      """tape | sort by i asc
        | | scan declare (v: long = 0) with (step s1: v > 0)""".stripMargin))
    assert(e1.getMessage.contains("must not reference declared"))
    val e2 = intercept[KqlParseException](run(
      """tape | sort by i asc
        | | scan declare (v: long = 0) with (
        |     step s1: e == 'v' => v = v * v)""".stripMargin))
    assert(e2.getMessage.contains("unsupported scan assignment"))
    val e3 = intercept[KqlParseException](run(
      """tape | sort by i asc
        | | scan declare (v: string = 'x') with (step s1: e == 'v')"""
        .stripMargin))
    assert(e3.getMessage.contains("long and real"))
  }

  test("two-step funnel: starts, repeats, completion, restart") {
    val df = run(
      """tape | sort by i asc
        | | scan with (step s1: e == 'v'; step s2: e == 'p')
        | | project i, step, match_id""".stripMargin)
    // i=1 c: inactive, no match. i=2 v: start m1. i=3 v: repeat s1.
    // i=4 c: skipped (match stays active). i=5 p: completes m1.
    // i=6 p: inactive, no. i=7 v: start m2. i=8 p: completes m2. i=9 c: no.
    assert(df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((2L, "s1", 1L), (3L, "s1", 1L), (5L, "s2", 1L),
        (7L, "s1", 2L), (8L, "s2", 2L)))
  }

  test("one-step scan tags every satisfying row as its own match") {
    val df = run(
      """tape | sort by i asc
        | | scan with_match_id=m with (step only: e == 'p')
        | | project i, step, m""".stripMargin)
    assert(df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((5L, "only", 1L), (6L, "only", 2L), (8L, "only", 3L)))
  }

  test("incomplete trailing match still emits its rows") {
    val df = run(
      """tape | where i >= 7 | sort by i asc
        | | scan with (step s1: e == 'v'; step s2: e == 'x')
        | | project i, step, match_id""".stripMargin)
    assert(df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((7L, "s1")))
  }

  test("three steps advance one at a time, with concurrent partial matches") {
    val df = run(
      """tape | sort by i asc
        | | scan with (step a: e == 'c'; step b: e == 'v'; step c: e == 'p')
        | | project i, step, match_id""".stripMargin)
    // tape: c v v c p p v p c. i=1 c starts m1(a); i=2 v promotes m1 to b;
    // i=3 v absorbs at b; i=4 c starts m2(a) — CONCURRENT with m1 at b
    // (the single-active-match machine used to skip this row); i=5 p
    // promotes m1 to c → completes; i=6 p: b empty, nothing; i=7 v
    // promotes m2 to b; i=8 p promotes m2 to c → completes; i=9 c starts m3.
    assert(df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "b", 1L), (4L, "a", 2L),
        (5L, "c", 1L), (7L, "b", 2L), (8L, "c", 2L), (9L, "a", 3L)))
  }

  test("Kusto's documented overlap shape: a new sequence starts while one is in flight") {
    // the canonical case the single-active-match restriction got wrong:
    // steps x→y→z over tape x y x z — the second x must begin match 2
    // while match 1 waits at step y, and z completes match 1 only
    val c2 = new Catalog(spark)
    c2.register("ov", Seq(
      (1L, "x"), (2L, "y"), (3L, "x"), (4L, "z")
    ).toDF("i", "e"))
    val df = Kql.run(spark, c2,
      """ov | sort by i asc
        | | scan with (step sx: e == 'x'; step sy: e == 'y'; step sz: e == 'z')
        | | project i, step, match_id""".stripMargin)
    assert(df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "sx", 1L), (2L, "sy", 1L), (3L, "sx", 2L), (4L, "sz", 1L)))
  }

  test("promotion overwrites a sequence already parked at the target step") {
    // a b a b c: m2's promotion to step b evicts m1 (Kusto: the state of
    // the target step is overwritten); c then completes m2, not m1
    val c2 = new Catalog(spark)
    c2.register("ev", Seq(
      (1L, "a"), (2L, "b"), (3L, "a"), (4L, "b"), (5L, "c")
    ).toDF("i", "e"))
    val df = Kql.run(spark, c2,
      """ev | sort by i asc
        | | scan with (step sa: e == 'a'; step sb: e == 'b'; step sc: e == 'c')
        | | project i, step, match_id""".stripMargin)
    assert(df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "sa", 1L), (2L, "sb", 1L), (3L, "sa", 2L), (4L, "sb", 2L),
        (5L, "sc", 2L)))
  }

  test("scan inside partition by runs per key, distributed") {
    val df = run(
      """multi | partition by u (sort by i asc
        |     | scan with (step s1: e == 'v'; step s2: e == 'p'))
        | | sort by u asc, i asc | project u, i, step, match_id""".stripMargin)
    assert(df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq ==
      Seq(("u1", 1L, "s1", 1L), ("u1", 2L, "s2", 1L),
        ("u2", 2L, "s1", 1L), ("u2", 3L, "s1", 1L), ("u2", 4L, "s2", 1L)))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("scan without a sort is rejected") {
    val e = intercept[KqlParseException](run(
      "tape | scan with (step s: e == 'v')"))
    assert(e.getMessage.contains("serialized"))
    // declare with no assignments: variables stay at their defaults
    val df = run(
      """tape | sort by i asc
        | | scan declare (x: long = 7) with (step s: e == 'v')
        | | project i, x""".stripMargin)
    assert(df.collect().forall(_.getLong(1) == 7L))
  }

  test("row_cumsum after scan covers the declare use-case") {
    val df = run(
      """tape | sort by i asc
        | | scan with (step s1: e == 'v'; step s2: e == 'p')
        | | sort by i asc
        | | extend seen = row_cumsum(1)
        | | project i, seen""".stripMargin)
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((2L, 1L), (3L, 2L), (5L, 3L), (7L, 4L), (8L, 5L)))
  }

  test("per-step machine agrees with an independent simulation on random tapes") {
    // differential check: the documented algorithm re-implemented
    // directly over in-memory tapes vs the compiled operator, across
    // seeds × alphabet sizes × step counts
    def simulate(tape: Seq[String], conds: Seq[String]): Seq[(Int, String, Long)] = {
      val n = conds.length
      val state = Array.fill(n)(0L)
      var nextMid = 0L
      val out = Seq.newBuilder[(Int, String, Long)]
      tape.zipWithIndex.foreach { case (e, i) =>
        var k = n - 1
        var acted = false
        while (k >= 0 && !acted) {
          if (e == conds(k)) {
            if (k == 0) {
              if (state(0) == 0L) {
                nextMid += 1
                if (n > 1) state(0) = nextMid
                out += ((i, s"s0", nextMid)); acted = true
              } else { out += ((i, "s0", state(0))); acted = true }
            } else if (state(k - 1) != 0L) {
              val mid = state(k - 1)
              state(k - 1) = 0L
              state(k) = if (k == n - 1) 0L else mid
              out += ((i, s"s$k", mid)); acted = true
            } else if (state(k) != 0L) {
              out += ((i, s"s$k", state(k))); acted = true
            }
          }
          k -= 1
        }
      }
      out.result()
    }
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val alpha = 2 + rnd.nextInt(3)        // 2..4 symbols
      val nSteps = 2 + rnd.nextInt(3)       // 2..4 steps
      val tape = Seq.fill(40)(s"e${rnd.nextInt(alpha)}")
      val conds = (0 until nSteps).map(i => s"e${i % alpha}")
      val c2 = new Catalog(spark)
      import TestSpark.spark.implicits._
      c2.register("rt", tape.zipWithIndex.map { case (e, i) => (i.toLong, e) }
        .toDF("i", "e"))
      val stepsKql = conds.zipWithIndex
        .map { case (c, i) => s"step s$i: e == '$c'" }.mkString("; ")
      val got = Kql.run(TestSpark.spark, c2,
        s"rt | sort by i asc | scan with ($stepsKql) | project i, step, match_id")
        .collect().map(r => (r.getLong(0).toInt, r.getString(1), r.getLong(2)))
        .toSeq
      val want = simulate(tape, conds)
      assert(got == want, s"trial $trial: tape=$tape conds=$conds")
    }
  }

  test("declare accumulators agree with an independent simulation") {
    // differential check of the per-sequence variable model on random
    // tapes: cnt = cnt + 1 (every matched row) and tot = tot + i, with
    // per-sequence reset — simulated directly with a mid → state map
    def simulate(tape: Seq[String], conds: Seq[String])
        : Seq[(Int, String, Long, Long, Long)] = {
      val n = conds.length
      val state = Array.fill(n)(0L)
      var nextMid = 0L
      val vars = scala.collection.mutable.Map[Long, (Long, Long)]()
      val out = Seq.newBuilder[(Int, String, Long, Long, Long)]
      tape.zipWithIndex.foreach { case (e, i) =>
        def bump(mid: Long): (Long, Long) = {
          val (c, t) = vars.getOrElse(mid, (0L, 0L))
          val nv = (c + 1, t + i)
          vars(mid) = nv
          nv
        }
        var k = n - 1
        var acted = false
        while (k >= 0 && !acted) {
          if (e == conds(k)) {
            if (k == 0) {
              if (state(0) == 0L) {
                nextMid += 1
                vars.remove(nextMid)
                val v = bump(nextMid)
                if (n > 1) state(0) = nextMid else vars.remove(nextMid)
                out += ((i, "s0", nextMid, v._1, v._2)); acted = true
              } else {
                val v = bump(state(0))
                out += ((i, "s0", state(0), v._1, v._2)); acted = true
              }
            } else if (state(k - 1) != 0L) {
              val mid = state(k - 1)
              if (state(k) != 0L && state(k) != mid) vars.remove(state(k))
              state(k - 1) = 0L
              val v = bump(mid)
              if (k == n - 1) { state(k) = 0L; vars.remove(mid) }
              else state(k) = mid
              out += ((i, s"s$k", mid, v._1, v._2)); acted = true
            } else if (state(k) != 0L) {
              val v = bump(state(k))
              out += ((i, s"s$k", state(k), v._1, v._2)); acted = true
            }
          }
          k -= 1
        }
      }
      out.result()
    }
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 6) {
      val alpha = 2 + rnd.nextInt(3)
      val nSteps = 2 + rnd.nextInt(3)
      val tape = Seq.fill(40)(s"e${rnd.nextInt(alpha)}")
      val conds = (0 until nSteps).map(i => s"e${i % alpha}")
      val c2 = new Catalog(spark)
      import TestSpark.spark.implicits._
      c2.register("rt", tape.zipWithIndex.map { case (e, i) => (i.toLong, e) }
        .toDF("i", "e"))
      val stepsKql = conds.zipWithIndex
        .map { case (c, i) => s"step s$i: e == '$c' => cnt = cnt + 1, tot = tot + i" }
        .mkString("; ")
      val got = Kql.run(TestSpark.spark, c2,
        s"""rt | sort by i asc
           | | scan declare (cnt: long = 0, tot: long = 0) with ($stepsKql)
           | | project i, step, match_id, cnt, tot""".stripMargin)
        .collect().map(r => (r.getLong(0).toInt, r.getString(1),
          r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      val want = simulate(tape, conds)
      assert(got == want, s"trial $trial: tape=$tape conds=$conds")
    }
  }

  test("a null partition key is its own group, distinct from empty string") {
    val c2 = new Catalog(spark)
    import TestSpark.spark.implicits._
    c2.register("nk", Seq(
      (Option("u"), 1L, "v"), (Option("u"), 2L, "p"),
      (Option(""), 1L, "v"), (None: Option[String], 1L, "p")
    ).toDF("u", "i", "e"))
    val df = Kql.run(TestSpark.spark, c2,
      """nk | partition by u (sort by i asc
        |     | scan with (step s1: e == 'v'; step s2: e == 'p'))""".stripMargin)
    // null-key group has only a 'p' → no match; '' group matched s1 only;
    // a merged machine would have let ''-group's view complete null's p
    val got = df.collect().map(r => (Option(r.getString(0)), r.getString(3))).toSet
    assert(got == Set((Some("u"), "s1"), (Some("u"), "s2"), (Some(""), "s1")))
  }

  test("output column collisions are rejected up front") {
    val e = intercept[KqlParseException](run(
      """tape | extend step = 1 | sort by i asc
        | | scan with (step s: e == 'v')""".stripMargin))
    assert(e.getMessage.contains("collides"))
    val e2 = intercept[KqlParseException](run(
      """tape | extend m = 1 | sort by i asc
        | | scan with_match_id=m with (step s: e == 'v')""".stripMargin))
    assert(e2.getMessage.contains("collides"))
  }

  test("explain renders scan") {
    val txt = Kql.renderSteps(Kql.parse(
      "tape | sort by i asc | scan with_match_id=m with (step a: e == 'v'; step b: e == 'p')"))
    assert(txt.contains("scan with_match_id=m with (step a:"))
  }
}
