package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.v2.{DerbyTestStore, SplitSpec}

/** Residual-plan pins for the `graft-sqlstore` V2 connector — the analog of
  * the reference's per-connector expected post-pushdown plans
  * (`tests/common/test_cases.rs:30-50`): for each query shape, assert both
  * WHAT was pushed into the foreign store (scan description) and WHAT
  * remained in the Spark plan (the residual), then hash-compare against the
  * same query on the parquet original.
  */
class V2PushdownSpec extends AnyFunSuite {
  import TestSpark._

  private def derby: DataFrame = DerbyTestStore.readBack(spark, sf, "customer")
  private def parquet: DataFrame = Tables.load(spark, sf, "customer")

  private def scanDesc(df: DataFrame): String = {
    val plan = df.queryExecution.executedPlan.toString
    plan.linesIterator.find(_.contains("sqlstore:customer"))
      .getOrElse(fail(s"no sqlstore scan in plan:\n$plan"))
  }

  private def sameResult(a: DataFrame, b: DataFrame): Unit = {
    val ra = a.collect().map(_.toString).sorted
    val rb = b.collect().map(_.toString).sorted
    assert(ra.toSeq == rb.toSeq)
  }

  test("round-trip: full table matches parquet original") {
    assert(derby.count() == parquet.count())
    sameResult(derby, parquet)
  }

  test("filters push into the store; unsupported filters stay residual") {
    val q = derby.where(col("c_mktsegment") === "BUILDING" &&
      col("c_acctbal") > 1000.0)
    val d = scanDesc(q)
    assert(d.contains("c_mktsegment"), d)
    assert(d.contains("c_acctbal"), d)
    sameResult(q, parquet.where(col("c_mktsegment") === "BUILDING" &&
      col("c_acctbal") > 1000.0))

    // a filter the store cannot express (arithmetic) stays in Spark
    val resid = derby.where(col("c_custkey") % 7 === 0)
    val plan = resid.queryExecution.executedPlan.toString
    assert(plan.contains("Filter"), plan) // residual Spark filter
    sameResult(resid, parquet.where(col("c_custkey") % 7 === 0))
  }

  test("column pruning reaches the store") {
    val q = derby.select("c_custkey", "c_acctbal")
    val d = scanDesc(q)
    assert(d.contains("ReadSchema: struct<c_custkey:bigint,c_acctbal:double>"), d)
    sameResult(q, parquet.select("c_custkey", "c_acctbal"))
  }

  test("limit pushes") {
    val q = derby.select("c_custkey").limit(7)
    assert(q.count() == 7)
  }

  test("top-n pushes as ORDER BY + FETCH FIRST") {
    val q = derby.select("c_custkey", "c_acctbal")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc).limit(5)
    val d = scanDesc(q)
    assert(d.contains("PushedTopN: [") && d.contains("c_acctbal"), d)
    sameResult(q, parquet.select("c_custkey", "c_acctbal")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc).limit(5))
  }

  test("aggregates push completely on a single-partition scan") {
    def agg(df: DataFrame): DataFrame = df
      .where(col("c_acctbal") > 0)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("c_custkey").as("s"),
        min("c_acctbal").as("mn"), max("c_acctbal").as("mx"),
        avg("c_acctbal").as("av"))
    val q = agg(derby)
    val d = scanDesc(q)
    assert(d.contains("CAST(COUNT(*) AS BIGINT)") && d.contains("PushedAggregates: ["), d)
    assert(d.contains("PushedGroupBy: [\"c_mktsegment\"]"), d)
    // complete pushdown: no HashAggregate remains in the plan
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate"), plan)
    sameResult(q, agg(parquet))
  }

  test("split scan: ranged partitions, partial agg pushdown, correct merge") {
    val split = derby // re-read with 4 range splits on the key
    val ranged = DerbyTestStore.readBack(spark, sf, "customer",
      Some(SplitSpec("c_custkey", 1L, 1501L, 4)))
    assert(ranged.rdd.getNumPartitions == 4)
    sameResult(ranged, parquet)

    // aggregate over splits: pushed PARTIALLY — Spark must keep a final
    // merge aggregate, and the result must still be exact
    def agg(df: DataFrame): DataFrame =
      df.groupBy("c_mktsegment").agg(count(lit(1)).as("n"),
        sum("c_custkey").as("s"))
    val q = agg(ranged)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan) // the residual merge
    sameResult(q, agg(parquet))

    // top-n is DECLINED under splits (per-shard order ≠ global order)
    val topn = ranged.orderBy(col("c_acctbal").desc).limit(3)
    val d = topn.queryExecution.executedPlan.toString
    assert(d.contains("TakeOrderedAndProject"), d)
    sameResult(topn, parquet.orderBy(col("c_acctbal").desc).limit(3))
  }

  test("kql over the store: where+summarize lands as pushed filter+agg") {
    import graft.kql.{Catalog, Kql}
    val cat = new Catalog(spark)
    cat.register("derby.customer", derby)
    val q = Kql.run(spark, cat,
      """derby.customer
        | | where c_acctbal > 1000.0
        | | summarize n = count(), mn = min(c_acctbal), mx = max(c_acctbal)
        |     by c_mktsegment
        | | sort by c_mktsegment asc""".stripMargin)
    val d = scanDesc(q)
    assert(d.contains("PushedFilters: [") && d.contains("c_acctbal"), d)
    assert(d.contains("CAST(COUNT(*) AS BIGINT)") && d.contains("PushedAggregates: ["), d)
    val exp = parquet.where(col("c_acctbal") > 1000.0)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), min("c_acctbal").as("mn"),
        max("c_acctbal").as("mx"))
      .select(col("c_mktsegment"), col("n"), col("mn"), col("mx"))
    assert(q.collect().map(_.toString).sorted.toSeq ==
      exp.collect().map(_.toString).sorted.toSeq)
  }

  test("kql sum stays a residual aggregate (KQL empty→0.0 semantics)") {
    // KQL's sum coalesces to 0.0 (reference summarize.rs accumulator
    // semantics) — that wrapper is not expressible as a remote aggregate,
    // so the connector correctly declines and Spark keeps the aggregate;
    // the filter STILL pushes. This is the negotiated-boundary contract.
    import graft.kql.{Catalog, Kql}
    val cat = new Catalog(spark)
    cat.register("derby.customer", derby)
    val q = Kql.run(spark, cat,
      """derby.customer
        | | where c_acctbal > 1000.0
        | | summarize s = sum(c_custkey) by c_mktsegment""".stripMargin)
    val d = scanDesc(q)
    assert(d.contains("PushedFilters: [") && d.contains("c_acctbal"), d)
    assert(d.contains("PushedAggregates: []"), d)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    val exp = parquet.where(col("c_acctbal") > 1000.0)
      .groupBy("c_mktsegment")
      .agg(sum(col("c_custkey").cast("double")).as("s"))
      .select(col("c_mktsegment"), col("s"))
    assert(q.collect().map(_.toString).sorted.toSeq ==
      exp.collect().map(_.toString).sorted.toSeq)
  }
}
