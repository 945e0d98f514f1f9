package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.PipelineQueries

/** The session gate-model cache must stay BOUNDED (r16 verdict: weak
  * keying alone let a long-lived session touching many sfDirs pin every
  * localCheckpoint forever), CLEARABLE (the bench's cold pass clears it
  * before every execution of a memo gate), and OBSERVABLE (the bench
  * detects memo gates through the touch probe).
  */
class GateCacheSpec extends AnyFunSuite {
  import TestSpark._

  test("LRU bound: inserting past the cap evicts, size never exceeds it") {
    val c = new PipelineQueries.GateCache
    val n = PipelineQueries.MaxGateCacheEntries
    (1 to n + 8).foreach(i =>
      c.getOrElseUpdate(s"k$i", Integer.valueOf(i)))
    assert(c.size == n, s"cache must cap at $n entries")
    // oldest keys were evicted; the newest survive
    var recomputed = false
    c.getOrElseUpdate("k1", { recomputed = true; Integer.valueOf(-1) })
    assert(recomputed, "k1 must have been evicted by the LRU bound")
    recomputed = false
    c.getOrElseUpdate(s"k${n + 8}", { recomputed = true; Integer.valueOf(-1) })
    assert(!recomputed, "the most recent key must still be cached")
  }

  test("gate cache is clearable and the touch probe sees memo gates") {
    PipelineQueries.clearGateCaches(spark)
    PipelineQueries.resetGateCacheProbe()
    // building a memo gate touches and populates the cache
    SparkEntry.queries("pl_kmeans")(spark, sf)
    assert(PipelineQueries.gateCacheWasTouched,
      "a gate that consults the cache must set the probe")
    assert(PipelineQueries.gateCacheSize(spark) >= 1)
    PipelineQueries.clearGateCaches(spark)
    assert(PipelineQueries.gateCacheSize(spark) == 0)
    // a core query does not touch the gate cache
    PipelineQueries.resetGateCacheProbe()
    SparkEntry.queries("q_filter")(spark, sf)
    assert(!PipelineQueries.gateCacheWasTouched,
      "a cache-free query must not set the probe")
  }

  test("cold rebuild after clear computes the same gate result") {
    val warm = SparkEntry.queries("pl_kmeans_objective")(spark, sf)
      .collect().map(_.toString).toSeq
    PipelineQueries.clearGateCaches(spark)
    val cold = SparkEntry.queries("pl_kmeans_objective")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(cold == warm, "cache-cleared recompute must be bit-identical")
  }
}
