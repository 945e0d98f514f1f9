package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable
import scala.util.Random

/** Differential tests for the distributed BPE trainer: the positional
  * leftmost-greedy merge rule must agree with the textbook sequential
  * algorithm (Sennrich et al. 2016) on every input, including the a == b
  * run case where leftmost-greedy is non-trivial ("aaaa" → "aa","aa").
  */
class BpeSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  /** Textbook sequential BPE training over a word-frequency dictionary. */
  private def seqTrain(words: Seq[(String, Long)], n: Int)
      : Seq[(Int, String, String, String, Long)] = {
    var dict: Seq[(Seq[String], Long)] =
      words.map { case (w, c) => (w.map(_.toString) :+ "</w>", c) }
    val out = mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var k = 1
    var done = false
    while (k <= n && !done) {
      val counts = mutable.Map.empty[(String, String), Long]
      dict.foreach { case (syms, c) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) =
          counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((k, a, b, a + b, c))
        dict = dict.map { case (syms, cnt) =>
          val m = mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              m += a + b; i += 2
            } else { m += syms(i); i += 1 }
          }
          (m.toSeq, cnt)
        }
        k += 1
      }
    }
    out.toSeq
  }

  private def distTrain(words: Seq[(String, Long)], n: Int)
      : Seq[(Int, String, String, String, Long)] = {
    val df = words.toDF("word", "wt")
    Bpe.train(spark, df, "word", "word", "wt", n)
      .orderBy("iteration").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
  }

  test("matches sequential BPE on the classic Sennrich dictionary") {
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L))
    val expect = seqTrain(words, 8)
    assert(distTrain(words, 8) == expect)
    // sanity: the famous first merges of this dictionary
    assert(expect.head._2 == "e" && expect.head._3 == "s" &&
      expect.head._5 == 9L)
  }

  test("a == b runs: leftmost-greedy pairs odd-offset heads") {
    val words = Seq(("aaaa", 3L), ("aaa", 2L), ("aaaaa", 1L), ("baab", 4L))
    assert(distTrain(words, 6) == seqTrain(words, 6))
  }

  test("differential: random binary-alphabet words force run merges") {
    val rnd = new Random(42)
    val words = Seq.tabulate(30) { i =>
      val len = 1 + rnd.nextInt(9)
      (Seq.fill(len)(if (rnd.nextBoolean()) "a" else "b").mkString,
        1L + rnd.nextInt(5))
    }.distinct.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
    assert(distTrain(words, 10) == seqTrain(words, 10))
  }

  test("stops early when no pairs remain") {
    val words = Seq(("a", 2L)) // single char + </w>: one pair, then none
    val got = distTrain(words, 5)
    assert(got == Seq((1, "a", "</w>", "a</w>", 2L)))
  }

  test("encodeTable matches sequential merge application per word") {
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L), ("aaaa", 2L))
    val (mergesDf, syms) =
      Bpe.trainWithSymbols(spark, words.toDF("word", "wt"),
        "word", "word", "wt", 6)
    val merges = mergesDf.orderBy("iteration").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val got = Bpe.encodeTable(syms).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    words.foreach { case (w, _) =>
      val exp = Bpe.encodeWord(w, merges)
      assert(got.contains(w))
      assert(got(w)._1 == exp.mkString(" "), s"word $w")
      assert(got(w)._2 == exp.length.toLong, s"word $w count")
    }
  }

  test("batch=1 explicitly equals the exact sequential algorithm") {
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L), ("aaaa", 2L))
    val df = words.toDF("word", "wt")
    val got = Bpe.train(spark, df, "word", "word", "wt", 8, batch = 1)
      .orderBy("iteration").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == seqTrain(words, 8))
  }

  test("batch sweeps: disjoint pairs, exact counts, consistent table") {
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L), ("banana", 4L), ("aaaa", 2L))
    val df = words.toDF("word", "wt")
    val (mergesDf, syms) =
      Bpe.trainWithSymbols(spark, df, "word", "word", "wt", 12, batch = 4)
    val merges = mergesDf.orderBy("iteration").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(merges.nonEmpty && merges.map(_._1).toSeq == (1 to merges.length))
    // within-sweep disjointness: replaying the merge list SEQUENTIALLY
    // through encodeWord must reproduce the trainer's final symbol table
    // exactly (disjoint pairs commute, so sweep == sequence)
    val got = Bpe.encodeTable(syms).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    words.foreach { case (w, _) =>
      val exp = Bpe.encodeWord(w, merges.map(m => (m._2, m._3)).toSeq)
      assert(got(w) == exp.mkString(" "), s"word $w")
    }
    // the first sweep's top pair must equal the exact algorithm's first
    // merge, with the identical count (sweep counts are exact)
    val exact = seqTrain(words, 1).head
    assert((merges.head._2, merges.head._3, merges.head._4) ==
      (exact._2, exact._3, exact._5))
  }

  test("plan pins: loop windows run exchange-free off the wid partitioning") {
    import org.apache.spark.sql.functions.col
    val df = Seq(("newest", 6L), ("widest", 3L)).toDF("word", "wt")
    val syms = Bpe.checkpointByWid(Bpe.initialSymbols(df, "word", "word", "wt"))
    // merge application: every window requires wid clustering, which the
    // checkpoint preserves — NO exchange in the whole pass
    val applied = Bpe.applyMerges(syms, Seq(("e", "s")))
    val ap = applied.queryExecution.executedPlan.toString
    assert(!ap.contains("Exchange"),
      s"merge application must reuse the checkpointed wid partitioning:\n$ap")
    // pair counting: exactly ONE shuffle — the partial/final pair-count
    // aggregate; the lead() window rides the same wid partitioning
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("wid")).orderBy(col("pos"))
    val counts = syms
      .withColumn("__nxt", org.apache.spark.sql.functions.lead(col("sym"), 1).over(w))
      .filter(col("__nxt").isNotNull)
      .groupBy(col("sym"), col("__nxt"))
      .agg(org.apache.spark.sql.functions.sum(col("wt")))
    val cp = counts.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(cp).length == 1,
      s"pair counting must shuffle exactly once (the pair agg):\n$cp")
    // the NEXT iteration reads checkpointPreserving(applyMerges(...)):
    // the merge output inherits the wid partitioning, so iteration 2's
    // windows must also plan exchange-free (pos renumbering does lose
    // the ordering — a local re-sort is fine, a shuffle is not)
    // fresh frame (not `applied`, whose QueryExecution the assertion
    // above already forced under AQE) — matching the real loop, where
    // the merge output goes straight into the checkpoint
    val next = Bpe.checkpointPreserving(Bpe.applyMerges(syms, Seq(("e", "s"))))
    val ap2 = Bpe.applyMerges(next, Seq(("t", "</w>")))
      .queryExecution.executedPlan.toString
    assert(!ap2.contains("Exchange"),
      s"iteration 2 must reuse the preserved wid partitioning:\n$ap2")
  }

  test("encodeWord replays the learned merges (round-trip)") {
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L))
    val merges = distTrain(words, 8).map(m => (m._2, m._3))
    // encoding a training word with all merges applied must reproduce the
    // final symbol sequence the trainer left it with
    val enc = Bpe.encodeWord("newest", merges)
    assert(enc.mkString(" ").replace(" ", "") == "newest</w>")
    assert(enc.length < "newest".length + 1, "merges must have applied")
  }
}
