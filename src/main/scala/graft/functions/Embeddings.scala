package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-label embedding centroids and distance-to-centroid outlier scoring —
  * the standard mislabeled-example / anomaly sweep over an embedded corpus
  * (score each vector by how far it sits from its class centroid, audit the
  * top-k per class).
  *
  * All arithmetic until the final projection is EXACT integer math on
  * 1e6-scaled embeddings: float addition is order-sensitive, so a
  * double-summed centroid would hash differently between engines (and
  * between partitionings of the same data!). Instead the centroid is kept
  * as the rational (Σx·1e6 : n), and the score is the integer
  * Σ_i (x_i·n − S_i)² — exactly n² times the squared distance to the mean,
  * so it ranks identically. Squares can pass 2^63, so the fold runs in
  * decimal(38,0) (Tungsten decimal, still codegen'd; DuckDB mirrors it in
  * HUGEINT).
  *
  * Scale shape: the centroid pass explodes (row, dim) pairs into a
  * two-level aggregation — map-side partial sums, shuffle keyed by
  * (label, dim), then one tiny row per label. Scoring joins the
  * labels×dims centroid table back as a BROADCAST and folds per row with
  * zip_with — narrow, no second explode of the corpus. Top-k per label is
  * a bounded window over rows that already carry their score.
  */
object Embeddings {

  val Scale = 1000000L

  /** Embedding scaled to exact longs: round(x · 1e6). */
  def scaledVec(emb: Column): Column =
    transform(emb, x => round(x.cast("double") * Scale).cast("long"))

  /** One row per label: `n` (member count) and `s_arr` (per-dimension sums
    * of the scaled embeddings, exact longs in dimension order).
    */
  def labelCentroids(df: DataFrame, labelCol: String, embCol: String): DataFrame = {
    val sv = df.select(col(labelCol), scaledVec(col(embCol)).as("sv"))
    val sums = sv
      .select(col(labelCol), posexplode(col("sv")).as(Seq("pos", "v")))
      .groupBy(col(labelCol), col("pos")).agg(sum("v").as("s"))
      .groupBy(col(labelCol))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("s")))),
        e => e.getField("s")).as("s_arr"))
    sums.join(sv.groupBy(col(labelCol)).agg(count(lit(1)).as("n")), labelCol)
  }

  /** Top-`k` outliers per label by squared distance to the label centroid.
    * `score` = Σ_i (x_i·n − S_i)² (= n² · squared-distance, same ranking),
    * emitted as double of the exact integer. Ties break to the smaller id.
    */
  def labelOutliers(
      df: DataFrame, idCol: String, labelCol: String, embCol: String,
      k: Int): DataFrame = {
    val cents = labelCentroids(df, labelCol, embCol)
    val scored = df
      .select(col(idCol), col(labelCol), scaledVec(col(embCol)).as("sv"))
      .join(broadcast(cents), labelCol)
      .withColumn("score_i",
        aggregate(
          zip_with(col("sv"), col("s_arr"), (x, s) => {
            // x promotes to decimal BEFORE the multiply: x·n is already
            // past 2^63 at n ~ 1e10 members, so a LONG product would
            // ANSI-overflow (or silently wrap) before the decimal cast
            val t = x.cast("decimal(38,0)") * col("n") - s
            t * t
          }),
          lit(0).cast("decimal(38,0)"),
          (acc, t) => acc + t))
    val w = Window.partitionBy(col(labelCol))
      .orderBy(col("score_i").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(labelCol), col(idCol), col("rank"),
        col("score_i").cast("double").as("score"))
  }
}
