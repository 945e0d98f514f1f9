package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** tdigest / merge_tdigest / percentile_tdigest — the mergeable rank
  * sketch family. Below the compression threshold the GK sketch is exact
  * under the rank rule ceil(p·n), so these assertions are equalities,
  * not tolerances (same contract the approx-quantile gate pins).
  */
class TDigestSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    // values 1..100 in group a, 101..200 in group b
    c.register("t", (1 to 200).map(i =>
      (if (i <= 100) "a" else "b", i.toLong)).toDF("g", "v"))
    c
  }

  private def run(kql: String) = Kql.run(spark, cat, kql)

  test("tdigest → percentile_tdigest matches the exact rank rule") {
    val r = run(
      """t | summarize td = tdigest(v) by g
        | | project g, p50 = percentile_tdigest(td, 50),
        |           p90 = percentile_tdigest(td, 90)
        | | sort by g asc""".stripMargin).collect()
    assert(r(0).getDouble(1) == 50.0) // ceil(0.5·100) = rank 50
    assert(r(0).getDouble(2) == 90.0)
    assert(r(1).getDouble(1) == 150.0)
    assert(r(1).getDouble(2) == 190.0)
  }

  test("merge_tdigest over per-group sketches equals the global sketch") {
    val merged = run(
      """t | summarize td = tdigest(v) by g
        | | summarize m = merge_tdigest(td)
        | | project p50 = percentile_tdigest(m, 50),
        |           p99 = percentile_tdigest(m, 99)""".stripMargin)
      .collect().head
    val whole = run(
      """t | summarize td = tdigest(v)
        | | project p50 = percentile_tdigest(td, 50),
        |           p99 = percentile_tdigest(td, 99)""".stripMargin)
      .collect().head
    assert(merged.getDouble(0) == whole.getDouble(0))
    assert(merged.getDouble(1) == whole.getDouble(1))
    assert(merged.getDouble(0) == 100.0) // rank 100 of 1..200
    assert(merged.getDouble(1) == 198.0) // ceil(0.99·200) = rank 198
  }

  test("tdigest_merge is an accepted alias and the sketch is binary") {
    val df = run(
      """t | summarize td = tdigest(v) by g
        | | summarize m = tdigest_merge(td)""".stripMargin)
    assert(df.schema("m").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(df.count() == 1)
  }

  test("nulls are skipped, not counted") {
    val c2 = new Catalog(spark)
    c2.register("n", Seq(Some(1L), None, Some(3L), None, Some(5L))
      .toDF("v"))
    val r = Kql.run(spark, c2,
      """n | summarize td = tdigest(v)
        | | project p50 = percentile_tdigest(td, 50)""".stripMargin)
      .collect().head
    assert(r.getDouble(0) == 3.0) // median of {1,3,5}
  }
}
