package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Dedup, TextAnalysis}

/** Hand-computed expectations for the repetition quality signals and the
  * benchmark-contamination score.
  */
class RepetitionSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("repetition features on hand-computed docs") {
    val docs = Seq(
      (1L, "a a a b"),        // 4 tokens, 2 distinct; top token a=3; bigrams: "a a"×2, "a b" → top 2/3
      (2L, "x y z"),          // no repetition at all
      (3L, "w")               // single token: no bigrams
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionFeatures(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(got(0) == ((1L, 4L, 0.5, 0.75, 2.0 / 3.0)))
    assert(got(1) == ((2L, 3L, 0.0, 1.0 / 3.0, 0.5)))
    assert(got(2) == ((3L, 1L, 0.0, 1.0, 0.0)))
  }

  test("exploded form tolerates empty and whitespace-only documents") {
    // regression: slice(toks, 1, size-1) got length -1 for empty token
    // arrays and threw at runtime
    val docs = Seq(
      (1L, "a b c"), (2L, ""), (3L, "   \t  ")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionFeatures(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(1L)) // token-less docs drop, like the oracle's join
    val kernel = docs.select(
        TextAnalysis.repetitionSignals($"text").getField("n_tokens"))
      .as[Long].collect().toSeq.sorted
    assert(kernel == Seq(0L, 0L, 3L)) // kernel keeps them, with zeros
  }

  test("a fully repeated doc maxes the signals") {
    val docs = Seq((1L, "spam spam spam spam")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionFeatures(docs, "doc_id", "text")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(r == ((1L, 4L, 0.75, 1.0, 1.0)))
  }

  test("contamination score counts distinct-shingle overlap") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),  // shingles: tqb qbf bfj fjx? → 3-grams over 5 tokens = 3
      (2L, "totally novel content here"),
      (3L, "a b")                          // < 3 tokens: no shingles, drops out
    ).toDF("doc_id", "text")
    val bench = Seq(
      (10L, "the quick brown fox")         // shingles: "the quick brown", "quick brown fox"
    ).toDF("doc_id", "text")
    val got = Dedup.contaminationScore(corpus, "doc_id", "text", bench, "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // doc 1: 3 shingles, 2 overlap; doc 2: 2 shingles, 0 overlap
    assert(got == Seq((1L, 3L, 2L, 2.0 / 3.0), (2L, 2L, 0L, 0.0)))
  }

  test("native repetition kernel is value-identical to the exploded twin") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val viaKernel = docs
      .select(col("doc_id"), TextAnalysis.repetitionSignals(col("text")).as("r"))
      .select(col("doc_id"), col("r.n_tokens"), col("r.dup_token_frac"),
        col("r.top_token_frac"), col("r.top_bigram_frac"))
      .filter(col("n_tokens") > 0)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    val viaExplode = TextAnalysis.repetitionFeatures(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(viaKernel == viaExplode && viaKernel.nonEmpty)
  }

  test("boilerplate finds shingles shared across enough docs of a group") {
    val docs = Seq(
      (1L, "g", "copyright acme corp page one"),
      (2L, "g", "copyright acme corp page two"),
      (3L, "g", "copyright acme corp and more"),
      (4L, "g", "totally unrelated body text"),
      (5L, "h", "copyright acme corp elsewhere") // other group: only 1 doc
    ).toDF("doc_id", "source", "text")
    val got = Dedup.boilerplateShingles(docs, "source", "doc_id", "text",
      n = 3, minDocs = 3)
      .orderBy("source", "shingle")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(("g", "copyright acme corp", 3L, 0.75)))
  }

  test("overlap counts each distinct shingle once, not per benchmark copy") {
    val corpus = Seq((1L, "p q r")).toDF("doc_id", "text")
    val bench = Seq((10L, "p q r"), (11L, "p q r")).toDF("doc_id", "text")
    val got = Dedup.contaminationScore(corpus, "doc_id", "text", bench, "text")
      .as[(Long, Long, Long, Double)].head()
    assert(got == ((1L, 1L, 1L, 1.0)))
  }
}
