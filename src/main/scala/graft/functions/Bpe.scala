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

  /** Checkpoint the symbol table hash-partitioned by wid and sorted by
    * (wid, pos), with AQE disabled for the materializing run: AQE's
    * runtime partition coalescing makes the physical partitioning
    * unknowable at checkpoint time, so the LogicalRDD would drop it and
    * every window in the training loop would re-exchange + re-sort. With
    * AQE off for just this materialization the checkpoint PRESERVES
    * partitioning and ordering, and all downstream window passes (compiled
    * with AQE back on) run exchange-free and sort-free — BpeSpec pins it.
    */
  def checkpointByWid(df: DataFrame): DataFrame =
    checkpointPreserving(df.repartition(col("wid"))
      .sortWithinPartitions(col("wid"), col("pos")))

  /** One AQE-disabled CLONE session per parent session (weakly keyed so a
    * stopped session can be collected): the conf override lives only on
    * the clone, so concurrently compiled queries on the parent session
    * never observe AQE off — the r9 form toggled the parent's
    * session-global conf around the materialization, a visible window for
    * every other query on the session (and the restore raced concurrent
    * readers even on the happy path).
    */
  private val noAqeSessions =
    new java.util.WeakHashMap[SparkSession, (Int, SparkSession)]()

  private def noAqeSession(spark: SparkSession): SparkSession =
    noAqeSessions.synchronized {
      // the cache is keyed on (session, runtime-conf fingerprint): a
      // caller that changed a runtime conf since the clone was built
      // (shuffle partitions, timezone, codegen flags, …) gets a FRESH
      // clone carrying the new values, so the materialization always
      // runs under the caller's current confs — the r11 staleness nit
      val confs = spark.conf.getAll
      val epoch = confs.hashCode()
      val cached = noAqeSessions.get(spark)
      if (cached != null && cached._1 == epoch) cached._2
      else {
        val s = spark.newSession()
        // newSession() inherits only SparkConf-time settings; carry the
        // caller's RUNTIME SQLConf overrides. Static/non-modifiable
        // entries are skipped.
        confs.foreach { case (k, v) =>
          scala.util.Try(s.conf.set(k, v))
        }
        s.conf.set("spark.sql.adaptive.enabled", "false")
        noAqeSessions.put(spark, (epoch, s))
        s
      }
    }

  /** [[checkpointByWid]] without the repartition — for the loop's merge
    * output, whose wid partitioning is already inherited from its input;
    * a repartition here would itself add the exchange we are avoiding.
    * The AQE-off override is scoped to a cloned session (the plan is
    * bound in, materialized, and bound back), never set on the caller's
    * session.
    */
  def checkpointPreserving(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.bindToSession
    val spark = df.sparkSession
    val ck = bindToSession(df, noAqeSession(spark)).localCheckpoint()
    bindToSession(ck, spark)
  }

  /** One merge-application pass for the (a, b) pair — the positional
    * leftmost-greedy rule described above. */
  def applyMerge(syms: DataFrame, a: String, b: String): DataFrame =
    applyMerges(syms, Seq((a, b)))

  /** Merge-application pass for a SWEEP of symbol-disjoint pairs. Pairs
    * sharing no symbol cannot chain into each other (two candidate starts
    * at adjacent positions share the middle symbol, so by disjointness
    * they are the same a == b pair), which means the per-island odd-offset
    * rule — exact leftmost-greedy for a single pair — stays exact for the
    * whole sweep, and the B applications commute: one window pass applies
    * them all. */
  def applyMerges(syms: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty)
    val used = scala.collection.mutable.HashSet.empty[String]
    pairs.foreach { case (a, b) =>
      require(!used(a) && !used(b),
        s"sweep pairs must be symbol-disjoint: ($a, $b)")
      used += a; used += b
    }
    val w = Window.partitionBy(col("wid")).orderBy(col("pos"))
    val cum = Window.partitionBy(col("wid")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isCand = pairs.map { case (a, b) =>
      col("sym") === lit(a) && coalesce(col("__nxt") === lit(b), lit(false))
    }.reduce(_ || _)
    val t1 = syms
      .withColumn("__nxt", lead(col("sym"), 1).over(w))
      .withColumn("__cand", isCand)
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
        when(col("__head"), concat(col("sym"), col("__nxt")))
          .otherwise(col("sym")).as("sym"))
  }

  /** Learn `nMerges` merges; returns (iteration, a, b, merged, c) where
    * `c` is the frequency-weighted pair count that won the iteration. */
  def train(spark: SparkSession, words: DataFrame, widCol: String,
      wordCol: String, weightCol: String, nMerges: Int,
      batch: Int = 1): DataFrame =
    trainWithSymbols(spark, words, widCol, wordCol, weightCol, nMerges,
      batch)._1

  /** [[train]] plus the final (wid, wt, pos, sym) symbol table after all
    * learned merges applied — the trained tokenization of the vocabulary
    * itself (the encode half of BPE for every word the corpus contains).
    *
    * `batch = B > 1` opts into SWEEP batching: each sweep collects the
    * top pair-count rows once and greedily takes up to B symbol-disjoint
    * pairs (count desc, then lexicographic — deterministic), applying
    * them in ONE window pass. Disjointness keeps every taken pair's count
    * exact for the sweep's table and makes the applications commute, so
    * the job count drops ~B× at real vocab sizes (a 32k-merge run stops
    * being 32k sequential Spark jobs — the wall-clock, not data-scale,
    * bottleneck). The standard approximation (fastBPE/tokenizers do the
    * same): a symbol CREATED mid-sweep cannot win until the next sweep,
    * so the merge order can deviate from strict sequential BPE. B = 1 is
    * the exact sequential algorithm and the gate-pinned default.
    *
    * The per-iteration symbol table is checkpointed PRE-PARTITIONED by
    * wid and sorted by (wid, pos), which the checkpoint preserves — every
    * window pass in the loop then runs exchange-free and sort-free; the
    * only per-sweep shuffle is the pair-count aggregate (BpeSpec pins
    * this).
    */
  def trainWithSymbols(spark: SparkSession, words: DataFrame, widCol: String,
      wordCol: String, weightCol: String, nMerges: Int, batch: Int = 1)
      : (DataFrame, DataFrame) = {
    require(batch >= 1, s"batch must be >= 1: $batch")
    var syms =
      checkpointByWid(initialSymbols(words, widCol, wordCol, weightCol))
    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    var k = 1
    var done = false
    while (k <= nMerges && !done) {
      val want = math.min(batch, nMerges - k + 1)
      val w = Window.partitionBy(col("wid")).orderBy(col("pos"))
      // bounded collect: enough head rows to usually fill the sweep (each
      // taken pair can disqualify overlapping neighbors); a short sweep
      // just continues next iteration, so the bound is safe, not magic
      val topK = syms
        .withColumn("__nxt", lead(col("sym"), 1).over(w))
        .filter(col("__nxt").isNotNull)
        .groupBy(col("sym").as("a"), col("__nxt").as("b"))
        .agg(sum(col("wt")).as("c"))
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(if (want == 1) 1 else want * 4 + 16)
        .collect()
      if (topK.isEmpty) done = true
      else {
        val usedSyms = scala.collection.mutable.HashSet.empty[String]
        val sweep = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var i = 0
        while (i < topK.length && sweep.length < want) {
          val (a, b, c) =
            (topK(i).getString(0), topK(i).getString(1), topK(i).getLong(2))
          if (!usedSyms(a) && !usedSyms(b)) {
            sweep += ((a, b, c))
            usedSyms += a; usedSyms += b
          }
          i += 1
        }
        sweep.foreach { case (a, b, c) =>
          merges += Row(k, a, b, a + b, c)
          k += 1
        }
        syms = checkpointPreserving(
          applyMerges(syms, sweep.toSeq.map(p => (p._1, p._2))))
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
