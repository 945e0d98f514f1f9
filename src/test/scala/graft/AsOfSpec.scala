package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{AsOf, TextAnalysis}

/** As-of join semantics + keyword-extraction scoring, pinned on small
  * hand-computed fixtures.
  */
class AsOfSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 10:05:00"), 105.0),
    (1L, ts("2024-01-01 10:10:00"), 110.0),
    (2L, ts("2024-01-01 09:00:00"), 900.0)
  ).toDF("key", "ts", "px")

  private val trades = Seq(
    (10L, 1L, ts("2024-01-01 10:04:59")), // between first two quotes
    (11L, 1L, ts("2024-01-01 10:05:00")), // exactly at a quote: inclusive
    (12L, 1L, ts("2024-01-01 09:59:59")), // before any quote: null
    (13L, 2L, ts("2024-01-01 23:00:00")), // long after the only quote
    (14L, 3L, ts("2024-01-01 12:00:00"))  // key with no right rows
  ).toDF("id", "key", "ts")

  test("as-of join picks the latest right row at-or-before each left ts") {
    val got = AsOf.join(trades, quotes, "key", "ts", Seq("px"))
      .select("id", "asof_px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got == Map(
      10L -> Some(100.0),
      11L -> Some(105.0),
      12L -> None,
      13L -> Some(900.0),
      14L -> None))
  }

  test("as-of join carries the matched right timestamp") {
    val got = AsOf.join(trades, quotes, "key", "ts", Seq("px"))
      .filter(col("id") === 11L).select("asof_ts").collect()
    assert(got.head.getTimestamp(0) == ts("2024-01-01 10:05:00"))
  }

  test("as-of join keeps every left row and all left columns") {
    val out = AsOf.join(trades, quotes, "key", "ts", Seq("px"))
    assert(out.count() == trades.count())
    assert(out.columns.toSeq == Seq("id", "key", "ts", "asof_ts", "asof_px"))
  }

  test("as-of join is invariant under input repartitioning") {
    val a = AsOf.join(trades, quotes, "key", "ts", Seq("px"))
      .collect().map(_.toString).sorted
    val b = AsOf.join(trades.repartition(7), quotes.repartition(3),
      "key", "ts", Seq("px"))
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("a null-timestamp right row matches nothing") {
    // regression: nulls sort FIRST under asc, so an unfiltered null-ts
    // right row carried its payload into every left row of the key
    val q = Seq(
      (1L, None: Option[Timestamp], 666.0),
      (1L, Some(ts("2024-01-01 10:00:00")), 100.0)
    ).toDF("key", "ts", "px")
    val t = Seq(
      (20L, 1L, ts("2024-01-01 09:00:00")), // before any real quote
      (21L, 1L, ts("2024-01-01 11:00:00"))  // after the real quote
    ).toDF("id", "key", "ts")
    val got = AsOf.join(t, q, "key", "ts", Seq("px"))
      .select("id", "asof_px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got == Map(20L -> None, 21L -> Some(100.0)))
  }

  test("keywords ranks rare tokens above common ones, tf breaks up") {
    // "zebra" appears only in doc 1 (df=1); "the" is in all three (df=3).
    // In doc 1, zebra (tf=1, df=1) must outscore the (tf=2, df=3):
    // 1*3e6/1 = 3e6 > 2*3e6/3 = 2e6.
    val docs = Seq(
      (1L, "the zebra the"),
      (2L, "the quick fox"),
      (3L, "the slow fox")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.keywords(docs, "doc_id", "text", k = 2)
      .filter(col("doc_id") === 1L).orderBy("rank")
      .select("token", "score").as[(String, Long)].collect()
    assert(got.head == ("zebra", 3000000L))
    assert(got(1) == ("the", 2000000L))
  }

  test("keywords returns at most k per document, rank is dense from 1") {
    val docs = Seq((1L, "a b c d e f"), (2L, "a")).toDF("doc_id", "text")
    val got = TextAnalysis.keywords(docs, "doc_id", "text", k = 3)
      .groupBy("doc_id").agg(count(lit(1)).as("n"), collect_set("rank").as("rs"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 1L))
  }

  test("bm25 ranks multi-term matches over single, rare terms over common") {
    val docs = Seq(
      (1L, "needle haystack filler filler filler"), // both query terms
      (2L, "needle filler filler filler filler"),   // rare term only
      (3L, "haystack filler filler filler filler"), // common term only
      (4L, "haystack other filler filler filler"),
      (5L, "haystack more filler filler filler"),
      (6L, "nothing relevant here at all")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(
      docs, "doc_id", "text", query = Seq("needle", "haystack"), k = 10)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    // doc 1 matches both terms → first; doc 2's term is rarer (df=2) than
    // haystack (df=4) → outranks the haystack-only docs; doc 6 absent
    assert(got.head == 1L)
    assert(got(1) == 2L)
    assert(!got.contains(6L))
    assert(got.toSet == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("bm25 deduplicates repeated query terms") {
    val docs = Seq(
      (1L, "needle one"), (2L, "haystack two")).toDF("doc_id", "text")
    val once = TextAnalysis.bm25(docs, "doc_id", "text", Seq("needle"), k = 5)
      .select("doc_id", "score").as[(Long, Double)].collect().toSeq
    val twice = TextAnalysis.bm25(
      docs, "doc_id", "text", Seq("needle", "needle"), k = 5)
      .select("doc_id", "score").as[(Long, Double)].collect().toSeq
    assert(once == twice)
  }

  test("bm25 length normalization favors the shorter doc at equal tf") {
    val docs = Seq(
      (1L, "term " + ("pad " * 4).trim),
      (2L, "term " + ("pad " * 40).trim)
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(docs, "doc_id", "text", Seq("term"), k = 2)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L))
  }
}
