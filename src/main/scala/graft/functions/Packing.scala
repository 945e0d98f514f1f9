package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign every document a position in the stream of
  * concatenated tokens, then chunk that stream into fixed-size training
  * sequences (context windows) — the concat-and-chunk shape LLM
  * pretraining pipelines use to turn variable-length documents into
  * fixed-length examples.
  *
  * The core primitive is a GLOBAL prefix sum of token counts in a
  * deterministic document order. A naive window
  * (`Window.orderBy(id)` with no partition key) collapses the whole
  * dataset into ONE task — the canonical scale-killer. This is the
  * two-phase distributed form instead:
  *
  *   1. range-partition by the order key (so partition index order equals
  *      key order) and compute a per-partition running sum — narrow,
  *      parallel;
  *   2. aggregate one total per partition (rows = #partitions, tiny),
  *      prefix-sum THOSE on a single task, and broadcast-join the per-
  *      partition base offsets back.
  *
  * The only single-task step touches #partitions rows, not #docs — the
  * same structure Spark's own `zipWithIndex` uses. Output offsets are
  * invariant to the partition count, so results are deterministic and
  * oracle-checkable against a plain SQL window sum.
  */
object Packing {

  /** Adds `outCol` = sum of `sizeCol` over all rows strictly before this
    * one in ascending `(orderCol, sizeCol)` order (i.e. this row's start
    * offset in the concatenated stream).
    *
    * Determinism contract: offsets are fully deterministic when `orderCol`
    * is unique (the intended use — a document id). Ties on `orderCol`
    * break by `sizeCol`, so the OUTPUT MULTISET stays deterministic for
    * (orderCol, sizeCol)-distinct rows; rows identical in both are
    * interchangeable and may swap offsets between runs.
    */
  def withGlobalOffset(
      df: DataFrame, orderCol: String, sizeCol: String,
      outCol: String): DataFrame = {
    val parted = df
      .repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy("__pid").orderBy(col(orderCol), col(sizeCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // The checkpoint is a CORRECTNESS barrier, not an optimization:
    // `local` feeds both the per-partition totals and the final join, and
    // its plan embeds spark_partition_id() — a nondeterministic
    // expression. Without materialization the two consumers evaluate the
    // subtree INDEPENDENTLY, and AQE may coalesce the range exchange
    // differently per evaluation (different advisory sizes), giving the
    // two runs DIFFERENT pid spaces — the inner join on __pid then drops
    // rows (observed: 100k events → ~50k nondeterministically at sf0.1;
    // small inputs coalesce identically, which is why every earlier
    // caller passed). Checkpointing pins one partition assignment that
    // both consumers read.
    val local = parted
      .withColumn("__run", sum(col(sizeCol)).over(w))
      .localCheckpoint()
    // one row per partition; the exclusive prefix sum over them runs on a
    // single task by construction — that is the point (bounded input)
    val wp = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = local.groupBy("__pid").agg(max(col("__run")).as("__tot"))
      .withColumn("__base", coalesce(sum(col("__tot")).over(wp), lit(0L)))
      .select(col("__pid"), col("__base"))
    local.join(broadcast(bases), "__pid")
      .withColumn(outCol, col("__base") + col("__run") - col(sizeCol))
      .drop("__pid", "__run", "__base")
  }

  /** Per-document packing assignment for a context window of `budget`
    * tokens: the document's start offset in the concatenated token stream
    * plus the first and last training-sequence ids its tokens land in
    * (a document straddling a boundary is split across sequences, exactly
    * like concat-and-chunk tokenization does).
    */
  def packSequences(
      docs: DataFrame, idCol: String, sizeCol: String,
      budget: Long): DataFrame = {
    require(budget >= 1, "context budget must be positive")
    // `div`, not `/`: epoch-scale offsets exceed double's 2^53 exact range,
    // and `/` promotes to double before the floor
    withGlobalOffset(docs, idCol, sizeCol, "tok_offset")
      .withColumn("seq_first", expr(s"tok_offset div $budget"))
      .withColumn("seq_last",
        expr(s"greatest(tok_offset, tok_offset + $sizeCol - 1) div $budget"))
  }
}
