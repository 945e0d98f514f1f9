package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench must not swallow failures: a query that throws has to surface
  * as a failure (exit-nonzero path), not a fast success.
  */
class BenchSpec extends AnyFunSuite {
  import TestSpark.spark

  test("a crashing query records a failure and the -1 sentinel") {
    val result = Bench.run(spark, TestSpark.sf, Seq(
      "ok" -> ((s, d) => Tables.load(s, d, "nation")),
      "broken" -> ((_, _) => throw new RuntimeException("deliberately broken"))))
    assert(result.errors.map(_._1) == Seq("broken"))
    assert(result.times.toMap.apply("broken") == -1.0)
    assert(result.times.toMap.apply("ok") >= 0.0)
    assert(result.totalSec >= 0.0) // sentinel excluded from the total
    val json = result.json("sf")
    assert(json.contains(""""failures":1"""))
    assert(json.contains("deliberately broken"))
  }

  test("all-green run reports zero failures") {
    val result = Bench.run(spark, TestSpark.sf, Seq(
      "ok" -> ((s, d) => Tables.load(s, d, "region"))))
    assert(result.errors.isEmpty)
    assert(result.json("sf").contains(""""failures":0"""))
  }
}
