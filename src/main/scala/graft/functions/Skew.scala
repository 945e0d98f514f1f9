package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot aggregation keys: two-phase salted aggregation.
  *
  * A single `groupBy(key)` over a key where one value holds 30% of 100 TB
  * funnels that key's rows into one reducer. Salting splits each key into
  * `buckets` sub-keys for the partial phase, so the hot key's work spreads
  * across `buckets` tasks; the final phase merges `buckets` rows per key —
  * trivial. (Skewed *joins* are handled by AQE's skew-join splitting; this
  * helper covers aggregations, which AQE does not re-balance.)
  */
object Skew {

  /** count + sum aggregations over a skewed key, salted into `buckets`
    * partial groups. Output: (key, n, sum_<valueCol>).
    */
  def saltedAggregate(
      df: DataFrame, keyCol: String, valueCol: String,
      buckets: Int = 32): DataFrame = {
    val salt: Column = pmod(xxhash64(monotonically_increasing_id()), lit(buckets))
    df
      .withColumn("__salt", salt)
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(keyCol))
      .agg(sum("__n").as("n"), sum("__s").as(s"sum_$valueCol"))
  }
}
