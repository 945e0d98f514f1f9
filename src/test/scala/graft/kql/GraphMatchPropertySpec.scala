package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Differential testing for graph-match: on random small digraphs, the
  * engine's 2-hop trail counts must equal a brute-force Scala
  * enumeration applying the same unique-edges rule.
  */
class GraphMatchPropertySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("2-hop trails match brute force on random digraphs") {
    val rnd = new scala.util.Random(20240814L)
    for (trial <- 1 to 5) {
      val n = 6
      val edges = (for {
        s <- 0 until n; d <- 0 until n
        if rnd.nextDouble() < 0.3
      } yield (s.toLong, d.toLong)).distinct
      val cat = new Catalog(spark)
      cat.register("e", edges.toDF("s", "d"))
      val got = Kql.run(spark, cat,
        """e | make-graph s --> d
          | | graph-match (a)-[e1]->(b)-[e2]->(c)
          |     project x = tolong(a.id), y = tolong(b.id), z = tolong(c.id)
          | | count""".stripMargin).collect().head.getLong(0)
      // brute force: ordered pairs of DISTINCT edges chained head-to-tail
      val brute = (for {
        e1 <- edges; e2 <- edges
        if e1 != e2 && e1._2 == e2._1
      } yield (e1, e2)).size.toLong
      assert(got == brute, s"trial $trial: edges=$edges")
    }
  }

  test("cycles=none equals brute force with distinct nodes") {
    val rnd = new scala.util.Random(7L)
    val edges = (for {
      s <- 0 until 5; d <- 0 until 5
      if rnd.nextDouble() < 0.4
    } yield (s.toLong, d.toLong)).distinct
    val cat = new Catalog(spark)
    cat.register("e", edges.toDF("s", "d"))
    val got = Kql.run(spark, cat,
      """e | make-graph s --> d
        | | graph-match cycles=none (a)-[e1]->(b)-[e2]->(c)
        |     project x = tolong(a.id) | count""".stripMargin)
      .collect().head.getLong(0)
    val brute = (for {
      e1 <- edges; e2 <- edges
      if e1 != e2 && e1._2 == e2._1 &&
        Set(e1._1, e1._2, e2._2).size == 3
    } yield 1).size.toLong
    assert(got == brute)
  }
}
