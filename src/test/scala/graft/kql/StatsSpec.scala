package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Connector field statistics (reference `miso-connectors/src/stats.rs`)
  * and their consumer, the stats-driven broadcast decision in the join
  * lowering (reference DynamicFilter, `dynamic_filter.rs`).
  */
class StatsSpec extends AnyFunSuite {
  import TestSpark.spark

  private def freshCat = Catalog.forTestData(spark, TestSpark.sf)

  test("computeStats returns rows and per-field distinct counts") {
    val cat = freshCat
    val st = cat.computeStats("nation").get
    assert(st.rows == 25L)
    val dc = st.fields("n_nationkey").distinctCount
    // HLL estimate: exact at this cardinality in practice, bounded loosely
    assert(dc >= 23L && dc <= 27L, s"dc=$dc")
    assert(st.fields.contains("n_name"))
    // cached afterwards, without recompute
    assert(cat.stats("nation").contains(st))
    // never computed → absent from the cached view
    assert(cat.stats("region").isEmpty)
  }

  test("cached stats below the threshold hint a broadcast join") {
    val kql = "customer | join kind=inner (nation) " +
      "on $left.c_nationkey == $right.n_nationkey | count"
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // disable the size heuristic so only the stats hint can broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val cold = freshCat
      val pCold = Kql.run(spark, cold, kql)
        .queryExecution.executedPlan.toString
      assert(!pCold.contains("BroadcastHashJoin"),
        s"without stats the size heuristic is off and no broadcast fires:\n$pCold")
      val warm = freshCat
      warm.computeStats("nation") // 25 distinct keys ≤ 10000 threshold
      val pWarm = Kql.run(spark, warm, kql)
        .queryExecution.executedPlan.toString
      assert(pWarm.contains("BroadcastHashJoin"),
        s"stats-known small build side must broadcast:\n$pWarm")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("stats give up when a step can redefine the join key") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val cat = freshCat
      cat.computeStats("nation")
      // extend redefines the key name → cardinality bound is void
      val p = Kql.run(spark, cat,
        "customer | join kind=inner (nation | extend n_nationkey = n_regionkey) " +
          "on $left.c_nationkey == $right.n_nationkey | count")
        .queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin"),
        s"a redefined key must not use table stats:\n$p")
      // a limit caps cardinality even without stats
      val p2 = Kql.run(spark, cat,
        "customer | join kind=inner (region | take 3) " +
          "on $left.c_nationkey == $right.r_regionkey | count")
        .queryExecution.executedPlan.toString
      assert(p2.contains("BroadcastHashJoin"),
        s"take N bounds the build side regardless of stats:\n$p2")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
