package graft.functions

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary TRAINING (Sennrich et al. 2016,
  * arXiv:1508.07909) — the merge-table learner a tokenizer pipeline runs
  * before the (already present) BPE-ish tokenization pass. Input is the
  * classic word-frequency dictionary (unique word, count), so the symbol
  * table is VOCAB-bounded, not corpus-bounded: at 100 TB the word-count
  * aggregate is the only corpus-sized shuffle, and everything after runs
  * over ~millions of unique words regardless of corpus size.
  *
  * Each of the N iterations is two distributed steps over the exploded
  * (word, position, symbol) table:
  *   1. pair counting — one `lead` window + one hash aggregate keyed on
  *      the symbol pair (map-side partial sums of the word weights), best
  *      pair = max (count, then lexicographic (a, b)) — deterministic; ONE
  *      row collects per iteration (the toscalar/IVF-centroid
  *      bounded-collect precedent);
  *   2. merge application — the classic sequential leftmost-greedy rule
  *      restated POSITIONALLY so both engines can run it without a
  *      per-row loop: a position is a merge HEAD iff it starts a pair
  *      occurrence and sits at an ODD offset within its maximal chain of
  *      consecutive pair-starts (chains longer than 1 only occur for
  *      a == b runs, where odd-offset selection IS leftmost-greedy);
  *      the position after a head is absorbed. Windows per word,
  *      then positions renumber.
  *
  * `localCheckpoint` truncates the per-iteration lineage (the
  * connectedComponents precedent). At 100 TB: per iteration one
  * pair-keyed aggregate shuffle + word-keyed window shuffles over the
  * vocab-sized table, never anything driver-sized except the single
  * best-pair row.
  */
object Bpe {

  /** (wid, wt, pos, sym) symbol table from a word-frequency dictionary:
    * characters plus a final `</w>` marker (the end-of-word symbol of the
    * paper). */
  def initialSymbols(words: DataFrame, widCol: String, wordCol: String,
      weightCol: String): DataFrame = {
    val w = col(wordCol)
    val chars = transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))
    words.select(col(widCol).as("wid"), col(weightCol).cast("long").as("wt"),
      posexplode(concat(chars, array(lit("</w>")))).as(Seq("pos", "sym")))
  }

  /** One merge-application pass for the (a, b) pair — the positional
    * leftmost-greedy rule described above. */
  def applyMerge(syms: DataFrame, a: String, b: String): DataFrame = {
    val w = Window.partitionBy(col("wid")).orderBy(col("pos"))
    val cum = Window.partitionBy(col("wid")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val t1 = syms
      .withColumn("__nxt", lead(col("sym"), 1).over(w))
      .withColumn("__cand",
        col("sym") === lit(a) && coalesce(col("__nxt") === lit(b), lit(false)))
      .withColumn("__cum",
        sum(when(col("__cand"), 1L).otherwise(0L)).over(cum))
      .withColumn("__island", when(col("__cand"), col("pos") - col("__cum")))
    val t2 = t1
      .withColumn("__fcum",
        min(when(col("__cand"), col("__cum")))
          .over(Window.partitionBy(col("wid"), col("__island"))))
      .withColumn("__head",
        col("__cand") && (col("__cum") - col("__fcum") + 1) % 2 === 1)
    t2.withColumn("__absorbed",
        coalesce(lag(col("__head"), 1).over(w), lit(false)))
      .filter(!col("__absorbed"))
      .select(col("wid"), col("wt"),
        (row_number().over(w) - 1).as("pos"),
        when(col("__head"), lit(a + b)).otherwise(col("sym")).as("sym"))
  }

  /** Learn `nMerges` merges; returns (iteration, a, b, merged, c) where
    * `c` is the frequency-weighted pair count that won the iteration. */
  def train(spark: SparkSession, words: DataFrame, widCol: String,
      wordCol: String, weightCol: String, nMerges: Int): DataFrame =
    trainWithSymbols(spark, words, widCol, wordCol, weightCol, nMerges)._1

  /** [[train]] plus the final (wid, wt, pos, sym) symbol table after all
    * learned merges applied — the trained tokenization of the vocabulary
    * itself (the encode half of BPE for every word the corpus contains). */
  def trainWithSymbols(spark: SparkSession, words: DataFrame, widCol: String,
      wordCol: String, weightCol: String, nMerges: Int)
      : (DataFrame, DataFrame) = {
    var syms =
      initialSymbols(words, widCol, wordCol, weightCol).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    var k = 1
    var done = false
    while (k <= nMerges && !done) {
      val w = Window.partitionBy(col("wid")).orderBy(col("pos"))
      val best = syms
        .withColumn("__nxt", lead(col("sym"), 1).over(w))
        .filter(col("__nxt").isNotNull)
        .groupBy(col("sym").as("a"), col("__nxt").as("b"))
        .agg(sum(col("wt")).as("c"))
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(1).collect() // ONE row per iteration — bounded by design
      if (best.isEmpty) done = true
      else {
        val (a, b, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Row(k, a, b, a + b, c)
        syms = applyMerge(syms, a, b).localCheckpoint()
        k += 1
      }
    }
    val mergesDf = spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("iteration",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("merged",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("c",
          org.apache.spark.sql.types.LongType))))
    (mergesDf, syms)
  }

  /** Collapse a symbol table back to one row per word:
    * (word, encoded, n_subwords) with subwords space-joined in position
    * order — the gate-comparable form of the trained tokenization. */
  def encodeTable(syms: DataFrame): DataFrame =
    syms.groupBy(col("wid").as("word"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("sym")))),
          x => x("sym"))).as("encoded"),
        count(lit(1)).as("n_subwords"))

  /** Tokenize a symbol sequence with a learned merge table — replays the
    * merges in order over each word (the inference half of BPE). Used by
    * the spec to prove round-trip consistency; `merges` is the small
    * driver-side table from [[train]]. */
  def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Seq[String] = word.map(_.toString) :+ "</w>"
    merges.foreach { case (a, b) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += a + b; i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.toSeq
    }
    syms
  }
}
