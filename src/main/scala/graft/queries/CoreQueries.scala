package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.KqlFunctions._

/** SURVEY §2.1/§2.2/§2.4 operator inventory, one checkable query per
  * operator, expressed Spark-first (declarative DataFrame ops so Catalyst
  * does pushdown / pruning / partial aggregation / TakeOrderedAndProject).
  *
  * Scale notes (100 TB design point) are on each query: filters and
  * projections reach the parquet scan; joins broadcast the small side;
  * aggregations rely on partial/final HashAggregate — no driver-side loops.
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val all: Seq[Q] = Seq(

    // ───── Scan + Project (miso Scan/Project → parquet scan + select) ─────
    Q("q_scan_project",
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")(
      (s, d) => t(s, d, "region")
        .select("r_regionkey", "r_name")
        .orderBy("r_regionkey")),

    // ───── Filter (`where`): pushed to parquet (PushedFilters) ─────
    Q("q_filter",
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity >= 45 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)(
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_quantity") >= 45 && col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    // ───── Filter: in / between (KQL `in`, `between .. ..`) ─────
    Q("q_filter_in_between",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        |  AND o_totalprice BETWEEN 100000 AND 150000
        |ORDER BY o_orderkey""".stripMargin)(
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("o_totalprice").between(100000, 150000))
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")),

    // ───── String predicates: contains / startswith / endswith ─────
    Q("q_filter_strings",
      """SELECT p_partkey, p_name FROM part
        |WHERE contains(p_name, 'green') OR starts_with(p_type, 'PROMO')
        |ORDER BY p_partkey""".stripMargin)(
      (s, d) => t(s, d, "part")
        .filter(col("p_name").contains("green") || col("p_type").startsWith("PROMO"))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")),

    // ───── `has` (case-insensitive whole-phrase, alnum boundaries) ─────
    Q("q_filter_has",
      """SELECT doc_id FROM documents
        |WHERE regexp_matches(text, '(?i)(^|[^A-Za-z0-9])spark([^A-Za-z0-9]|$)')
        |ORDER BY doc_id""".stripMargin)(
      (s, d) => t(s, d, "documents")
        .filter(has(col("text"), "spark"))
        .select("doc_id")
        .orderBy("doc_id")),

    // ───── Extend (withColumns): computed fields kept alongside ─────
    Q("q_extend",
      """SELECT l_orderkey, l_linenumber,
        |       CAST(floor(l_extendedprice * (1 - l_discount)) AS BIGINT) AS revenue_floor
        |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-11-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)(
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1998-11-01").cast("timestamp"))
        .withColumn("revenue_floor",
          floor(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .select("l_orderkey", "l_linenumber", "revenue_floor")
        .orderBy("l_orderkey", "l_linenumber")),

    // ───── Rename (project-rename) ─────
    Q("q_rename",
      """SELECT n_nationkey AS nation_id, n_name AS nation_name FROM nation
        |ORDER BY nation_id""".stripMargin)(
      (s, d) => t(s, d, "nation")
        .withColumnRenamed("n_nationkey", "nation_id")
        .withColumnRenamed("n_name", "nation_name")
        .select("nation_id", "nation_name")
        .orderBy("nation_id")),

    // ───── mv-expand (explode an array field into rows) ─────
    Q("q_mvexpand",
      """SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |FROM documents WHERE doc_id < 10
        |ORDER BY doc_id, word""".stripMargin)(
      (s, d) => t(s, d, "documents")
        .filter(col("doc_id") < 10)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .orderBy("doc_id", "word")),

    // ───── Limit / take (deterministic: over a sorted input) ─────
    Q("q_limit",
      "SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 100")(
      (s, d) => t(s, d, "orders")
        .select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(100)),

    // ───── Sort: multi-key, null placement (nulls last) ─────
    Q("q_sort_nulls",
      """SELECT c_custkey,
        |       CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
        |FROM customer
        |ORDER BY bal DESC NULLS LAST, c_custkey""".stripMargin)(
      (s, d) => t(s, d, "customer")
        .withColumn("bal", when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")))
        .select("c_custkey", "bal")
        .orderBy(col("bal").desc_nulls_last, col("c_custkey"))),

    // ───── TopN (sort+limit fused by Catalyst → TakeOrderedAndProject) ─────
    Q("q_topn",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)(
      (s, d) => t(s, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)),

    // ───── Summarize: count/sum/min/max/avg (avg as sum/count for
    // bit-exact parity — both engines then do one IEEE division) ─────
    Q("q_summarize",
      """SELECT l_returnflag, l_linestatus,
        |       count(*) AS n,
        |       sum(l_quantity) AS sum_qty,
        |       min(l_extendedprice) AS min_price,
        |       max(l_extendedprice) AS max_price,
        |       sum(l_quantity) / count(*) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)(
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("n"),
          sum("l_quantity").as("sum_qty"),
          min("l_extendedprice").as("min_price"),
          max("l_extendedprice").as("max_price"),
          (sum("l_quantity") / count(lit(1))).as("avg_qty"))
        .orderBy("l_returnflag", "l_linestatus")),

    // ───── countif ─────
    Q("q_countif",
      """SELECT o_orderpriority,
        |       CAST(sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)(
      (s, d) => t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(sum(when(col("o_totalprice") > 200000, 1).otherwise(0)).cast("bigint").as("n_big"))
        .orderBy("o_orderpriority")),

    // ───── dcount (exact distinct, reference uses a HashSet — Spark's
    // partial/final distinct aggregation is the scale-out analog) ─────
    Q("q_dcount",
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS dc_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)(
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("dc_parts"))
        .orderBy("l_returnflag")),

    // ───── bin(@time, 1h): epoch-floor time bucketing + agg ─────
    Q("q_bin_time",
      """SELECT date_trunc('hour', ts) AS h, event_type,
        |       count(*) AS n, min(value) AS min_v
        |FROM events GROUP BY 1, 2 ORDER BY h, event_type""".stripMargin)(
      (s, d) => t(s, d, "events")
        .groupBy(
          binTime(col("ts"), 3600L * 1000000L).as("h"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), min("value").as("min_v"))
        .orderBy("h", "event_type")),

    // ───── Distinct (lowered to groupBy in both engines) ─────
    Q("q_distinct",
      """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin)(
      (s, d) => t(s, d, "customer")
        .select("c_mktsegment", "c_nationkey")
        .distinct()
        .orderBy("c_mktsegment", "c_nationkey")),

    // ───── Union (bag union; branches stay parallel scans) ─────
    Q("q_union",
      """SELECT event_type, count(*) AS n FROM (
        |  SELECT * FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT * FROM events WHERE event_type = 'error'
        |) GROUP BY event_type ORDER BY event_type""".stripMargin)(
      (s, d) => {
        val e = t(s, d, "events")
        e.filter(col("event_type") === "click")
          .unionByName(e.filter(col("event_type") === "error"))
          .groupBy("event_type").agg(count(lit(1)).as("n"))
          .orderBy("event_type")
      }),

    // ───── Join inner (broadcast the dimension side) ─────
    Q("q_join_inner",
      """SELECT o_orderkey, c_name FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 400000 ORDER BY o_orderkey""".stripMargin)(
      (s, d) => t(s, d, "orders")
        .filter(col("o_totalprice") > 400000)
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name")
        .orderBy("o_orderkey")),

    // ───── Join left (null-filled right side) ─────
    Q("q_join_left",
      """SELECT c_custkey, o_orderkey FROM customer
        |LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) big
        |  ON c_custkey = o_custkey
        |WHERE c_custkey <= 200
        |ORDER BY c_custkey, o_orderkey""".stripMargin)(
      (s, d) => t(s, d, "customer")
        .filter(col("c_custkey") <= 200)
        .join(
          t(s, d, "orders").filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left")
        .select("c_custkey", "o_orderkey")
        .orderBy("c_custkey", "o_orderkey")),

    // ───── Join right ─────
    Q("q_join_right",
      """SELECT s_suppkey, n_name FROM nation
        |RIGHT JOIN supplier ON n_nationkey = s_nationkey
        |WHERE s_suppkey <= 50 ORDER BY s_suppkey""".stripMargin)(
      (s, d) => t(s, d, "nation")
        .join(t(s, d, "supplier").filter(col("s_suppkey") <= 50),
          col("n_nationkey") === col("s_nationkey"), "right")
        .select("s_suppkey", "n_name")
        .orderBy("s_suppkey")),

    // ───── Join full outer (on pre-aggregated sides → small inputs) ─────
    Q("q_join_outer",
      """SELECT coalesce(cn.k, sn.k) AS nk, c_cnt, s_cnt FROM
        |  (SELECT c_nationkey AS k, count(*) AS c_cnt FROM customer
        |   WHERE c_nationkey < 15 GROUP BY 1) cn
        |FULL OUTER JOIN
        |  (SELECT s_nationkey AS k, count(*) AS s_cnt FROM supplier
        |   WHERE s_nationkey >= 10 GROUP BY 1) sn
        |ON cn.k = sn.k ORDER BY nk""".stripMargin)(
      (s, d) => {
        val cn = t(s, d, "customer").filter(col("c_nationkey") < 15)
          .groupBy(col("c_nationkey").as("ck")).agg(count(lit(1)).as("c_cnt"))
        val sn = t(s, d, "supplier").filter(col("s_nationkey") >= 10)
          .groupBy(col("s_nationkey").as("sk")).agg(count(lit(1)).as("s_cnt"))
        cn.join(sn, col("ck") === col("sk"), "full_outer")
          .select(coalesce(col("ck"), col("sk")).as("nk"), col("c_cnt"), col("s_cnt"))
          .orderBy("nk")
      }),

    // ───── Count (single-row result like miso's `count`) ─────
    // v2 scan so the count is answered from parquet row-group metadata
    // (PushedAggregation, the reference's QueryResponse::Count analog)
    Q("q_count",
      "SELECT count(*) AS Count FROM lineitem")(
      (s, d) => Tables.loadAgg(s, d, "lineitem").agg(count(lit(1)).as("Count"))),

    // ───── case / iff (KQL conditional chain) ─────
    Q("q_case",
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        |            WHEN o_totalprice < 200000 THEN 'mid'
        |            ELSE 'large' END AS bucket,
        |       count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin)(
      (s, d) => t(s, d, "orders")
        .groupBy(
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 200000, "mid")
            .otherwise("large").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket")),

    // ───── extract() regex → null on no-match, then agg ─────
    Q("q_extract",
      """SELECT CAST(nullif(regexp_extract(props, '"k": (\d+)', 1), '') AS BIGINT) AS k,
        |       count(*) AS n
        |FROM events GROUP BY 1 ORDER BY k""".stripMargin)(
      (s, d) => t(s, d, "events")
        .groupBy(extractOrNull(col("props"), "\"k\": (\\d+)", 1).cast("bigint").as("k"))
        .agg(count(lit(1)).as("n"))
        .orderBy("k")),

    // ───── JSON field access on a semi-structured column ─────
    Q("q_json_get",
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, count(*) AS n
        |FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
        |GROUP BY 1 ORDER BY k""".stripMargin)(
      (s, d) => t(s, d, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("bigint"))
        .filter(col("k").isNotNull)
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k")),

    // ───── Casts + arithmetic (`/` float semantics, floor for exactness) ─────
    Q("q_casts_arith",
      """SELECT l_orderkey, l_linenumber,
        |       CAST(l_quantity AS INTEGER) AS qty_int,
        |       CAST(floor(l_extendedprice / l_quantity) AS BIGINT) AS unit_floor
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)(
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_orderkey") < 100)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("int").as("qty_int"),
          floor(col("l_extendedprice") / col("l_quantity")).as("unit_floor"))
        .orderBy("l_orderkey", "l_linenumber")),

    // ───── bin() numeric ─────
    Q("q_bin_num",
      """SELECT floor(o_totalprice / 50000) * 50000 AS price_bin, count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY price_bin""".stripMargin)(
      (s, d) => t(s, d, "orders")
        .groupBy(binNum(col("o_totalprice"), 50000).as("price_bin"))
        .agg(count(lit(1)).as("n"))
        .orderBy("price_bin")),

    // ───── Window functions (beyond miso; Spark-native ranking) ─────
    Q("q_window_rank",
      """SELECT * FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |         row_number() OVER (PARTITION BY c_mktsegment
        |                            ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer) WHERE rn <= 3
        |ORDER BY c_mktsegment, rn""".stripMargin)(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        t(s, d, "customer")
          .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
            row_number().over(w).cast("long").as("rn"))
          .filter(col("rn") <= 3)
          .orderBy("c_mktsegment", "rn")
      }),

    // ───── Multi-table star join + agg (flagship-style) ─────
    Q("q_star_join",
      """SELECT n_name, count(*) AS n_items, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin)(
      (s, d) => t(s, d, "lineitem")
        .join(t(s, d, "orders").filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_items"), sum("l_quantity").as("sum_qty"))
        .orderBy("n_name"))
  )
}
