package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling for training-data pipelines.
  *
  * `df.sample()` is seed-dependent on partitioning, so a re-run after a
  * repartition samples a *different* subset — unacceptable when the sample
  * defines a training set that must be reproducible and auditable. These
  * operators derive the decision purely from the row's id through an affine
  * hash mod a prime, so membership is a property of the row, not of the
  * plan: stable across re-runs, cluster sizes, and engines (the identical
  * arithmetic runs as the DuckDB oracle).
  *
  * Beyond-the-reference operator (the reference has no sampling surface).
  */
object Sampling {

  /** Modulus/multiplier chosen so every intermediate stays < 2^63
    * (ANSI-mode safe): (id mod P) * A + B < 10^6 * 2.7e9 ≈ 2.7e15. */
  val P = 1000003L
  val A = 2654435761L // Knuth's 2^32 golden-ratio multiplier
  val B = 104729L

  /** Affine-modular mix of an id into [0, P). Map-side, codegen'd,
    * engine-independent integer arithmetic. */
  def mix(id: Column): Column = pmod(pmod(id, lit(P)) * A + B, lit(P))

  /** Keep ≈`frac` of rows, decided by `mix(id) < frac·P` — a deterministic
    * Bernoulli sample that pushes down as a plain filter (no shuffle, no
    * RNG state). */
  def bernoulli(df: DataFrame, idCol: String, frac: Double): DataFrame =
    df.filter(mix(col(idCol)) < lit((frac * P).toLong))

  /** Weighted data mixing: sample each stratum (source/domain) at its own
    * rate — the standard pretraining-mixture shape ("2× books, 0.3× web").
    * Rates are a tiny broadcast map compiled into a CASE chain; the
    * decision stays the same pushed-down deterministic filter as
    * [[bernoulli]], so a mixture is reproducible row-by-row. Strata absent
    * from `rates` default to `defaultRate`.
    */
  def mixture(
      df: DataFrame, strataCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    val rate = rates.foldLeft(lit((defaultRate * P).toLong)) {
      case (acc, (stratum, r)) =>
        when(col(strataCol) === stratum, lit((r * P).toLong)).otherwise(acc)
    }
    df.filter(mix(col(idCol)) < rate)
  }

  /** Per-stratum quota sample: the `k` rows of each stratum with the
    * smallest mixed hash (ties broken by id — fully deterministic).
    * One shuffle on the stratum key; each stratum sorts locally and keeps
    * `k`. For heavily skewed strata at 100 TB, pre-filter with
    * `bernoulli(frac ≫ k/|stratum|)` first so the window sorts a bounded
    * candidate set instead of the full stratum.
    */
  def stratified(
      df: DataFrame, strataCol: String, idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(mix(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
