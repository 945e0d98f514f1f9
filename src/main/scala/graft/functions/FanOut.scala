package graft.functions

import org.apache.spark.sql.Dataset

/** Parallelism floor for CPU-heavy NARROW kernels (guide §2.5 "input
  * skew: one huge unsplittable file → repartition immediately after the
  * read", §6 input-split sizing): a small table stored as one
  * single-row-group parquet file scans as ONE partition, so every narrow
  * pass downstream — codec decode/encode, PQ code assignment — runs on
  * one core no matter how many the machine has. `apply` round-robins the
  * rows across `defaultParallelism` partitions ONLY when the optimizer's
  * size estimate says the whole input is smaller than what a scan would
  * need to produce that many partitions naturally (defaultParallelism ×
  * maxPartitionBytes): at 100 TB the estimate is far over the cap and
  * the input keeps its own (already-parallel) layout — the branch makes
  * the fan-out scale-adaptive instead of a local[32] tuning. The shuffle
  * this inserts moves only inputs the same rule bounds to a few GB, and
  * an explicit-N repartition is never re-coalesced by AQE, so the kernel
  * keeps its parallelism. Row placement is deterministic
  * (sortBeforeRepartition, SPARK-23207) and every caller is
  * partition-invariant by construction.
  */
private[graft] object FanOut {
  def apply[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val cap = BigInt(p.toLong) *
      spark.sessionState.conf.filesMaxPartitionBytes
    if (ds.queryExecution.optimizedPlan.stats.sizeInBytes <= cap)
      ds.repartition(p)
    else ds
  }
}
