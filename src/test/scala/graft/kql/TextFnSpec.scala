package graft.kql

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import graft.functions.{Dedup, TextAnalysis}

/** The KQL text-pipeline scalars (tokencount/simhash/fingerprint/langid)
  * must agree bit-for-bit with the DataFrame-level kernels they lower to —
  * one engine, two surfaces, same answers.
  */
class TextFnSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}
  import spark.implicits._

  private lazy val cat = Catalog.forTestData(spark, sf)

  test("tokencount/simhash/fingerprint/langid match the DataFrame kernels") {
    val viaKql = Kql.run(spark, cat,
      """documents
        | | project doc_id, n = tokencount(text), sh = simhash(text),
        |     fp = fingerprint(text), lg = langid(text)
        | | sort by doc_id asc""".stripMargin)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    val viaDf = Tables.load(spark, sf, "documents")
      .select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n"),
        Dedup.simhash(TextAnalysis.tokens(col("text"))).as("sh"),
        TextAnalysis.fingerprint(col("text")).as("fp"),
        TextAnalysis.langId(col("text")).as("lg"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(viaKql == viaDf)
  }

  test("text functions compose with where/summarize") {
    val got = Kql.run(spark, cat,
      """documents
        | | where tokencount(text) >= 30
        | | summarize n = count() by lg = langid(text)
        | | sort by lg asc""".stripMargin)
      .as[(String, Long)].collect().toSeq
    val want = Tables.load(spark, sf, "documents")
      .filter(TextAnalysis.tokenCount(col("text")) >= 30)
      .groupBy(TextAnalysis.langId(col("text")).as("lg"))
      .agg(count(lit(1)).as("n"))
      .orderBy("lg")
      .as[(String, Long)].collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("text functions render back as KQL") {
    assert(Render.expr(Expr.TextFn("simhash", Expr.Field(
      FieldPath(Seq(FieldAccess("text")))))) == "simhash(text)")
  }

  test("wrong arity is a parse error") {
    val e = intercept[KqlParseException] {
      Kql.run(spark, cat, "documents | extend n = tokencount(text, 2)")
    }
    assert(e.getMessage.contains("takes 1 arg"))
  }
}
