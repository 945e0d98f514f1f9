package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional LAYOUT CLUSTERING — the lakehouse Z-ORDER primitive
  * (Delta OPTIMIZE ZORDER BY / Iceberg rewrite with a Z-order strategy):
  * interleave the bits of several clustering columns into one Morton key,
  * then range-partition and sort the WRITE by it, so parquet row-group
  * min/max statistics stay narrow on EVERY clustered column at once and a
  * filter on any of them prunes row groups — the layout story behind
  * "filters push down" actually paying off on 100 TB multi-dimension
  * scans (a single-column sort gives pruning on one column only).
  *
  * Everything is integer-exact so a DuckDB oracle replays the key
  * bit-for-bit: columns normalize to [0, 2^bits) by min/max integer
  * scaling (`uniformize` — one bounded 2-number-per-column aggregate,
  * never a per-row rank shuffle; production engines use the same
  * boundary-stats approach per file batch), and the interleave is a
  * constant-size tree of shift/and/or terms (codegen-friendly, no UDF).
  *
  * Skew caveat, stated honestly: min/max scaling keeps heavy-hitter skew
  * (a column where 90% of rows share one value leaves its bit planes
  * constant). For skewed columns the SCALE DEFAULT is
  * [[zOrderKeyQuantileBinned]] — sampled quantile boundaries, map-side
  * binning, zero extra shuffles — with [[zOrderKeyRankBinned]] as its
  * exact-rank oracle twin (one corpus sort + materialization per column,
  * kept for the gate's bit-exact replay). Min/max is the oracle-exact
  * default and correct for the TPC-H-ish key columns.
  */
object Layout {

  /** Morton (Z-order) bit interleave of pre-normalized non-negative longs
    * in [0, 2^bits): bit b of column i lands at position b·ncols + i.
    * Requires bits·ncols ≤ 62 so the key stays a positive BIGINT in both
    * engines.
    */
  def mortonKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "mortonKey needs at least one column")
    require(bits > 0 && bits * cols.size <= 62,
      s"bits($bits) x cols(${cols.size}) must stay within a positive long")
    val n = cols.size
    val terms = for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield shiftleft(
      shiftrightunsigned(c.cast("long"), b).bitwiseAND(lit(1L)),
      b * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Integer min/max scaling of a long column into [0, 2^bits):
    * ((x − mn) · 2^bits) div (mx − mn + 1). All-long arithmetic (the
    * range must leave `bits` headroom below 2^63 — true for every id /
    * date / price key; callers with wider domains pre-shift).
    */
  def uniformize(c: Column, mn: Long, mx: Long, bits: Int): Column = {
    require(mx >= mn, s"empty range: [$mn, $mx]")
    require(mx - mn <= (Long.MaxValue >> bits),
      s"range ${mx - mn} leaves no headroom for $bits bits")
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      expression((c.cast("long") - lit(mn)) * lit(1L << bits)),
      expression(lit(mx - mn + 1L))))
  }

  /** The composed clustering key for a set of long-typed columns: one
    * bounded min/max aggregate (2 numbers per column collect — the
    * toscalar precedent), then the normalized Morton interleave. Returns
    * (the input with a `zkey` column, the (min, max) table used — which
    * IS the index metadata a catalog would persist).
    */
  def zOrderKey(df: DataFrame, cols: Seq[String], bits: Int)
      : (DataFrame, Map[String, (Long, Long)]) = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("long").as(s"__mn_$c"),
        max(col(c)).cast("long").as(s"__mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val ranges = cols.zipWithIndex.map { case (c, i) =>
      require(!row.isNullAt(2 * i) && !row.isNullAt(2 * i + 1),
        s"zOrderKey: column '$c' has no non-null values (empty input " +
          "or all-null column) — nothing to cluster on")
      c -> (row.getLong(2 * i), row.getLong(2 * i + 1))
    }.toMap
    val key = mortonKey(
      cols.map(c => uniformize(col(c), ranges(c)._1, ranges(c)._2, bits)),
      bits)
    (df.withColumn("zkey", key), ranges)
  }

  /** RANK-binned Z-order key — the EXACT skew-proof form, kept as the
    * oracle twin of [[zOrderKeyQuantileBinned]] (which is the scale
    * default): each clustering column is binned by its global RANK
    * (exact, via the two-phase distributed prefix sum of
    * `Packing.withGlobalOffset` — never a single-task global window), so
    * a column where 90% of rows share one value still spreads across bit
    * planes where min/max scaling would leave them constant. Cost: one
    * range-partitioned sort pass AND one full materialization (the
    * prefix sum's correctness barrier) PER clustering column — at 100 TB
    * prefer the quantile-binned form, which is one bounded boundary job
    * and a map-side projection. The bin here is `rank · 2^bits div n` —
    * all-integer, oracle-replayable. Ties order by the `idCols`
    * tiebreak, so the key is a pure function of the data
    * (partition-invariant).
    */
  def zOrderKeyRankBinned(df: DataFrame, cols: Seq[String],
      idCols: Seq[String], bits: Int): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    require(cols.nonEmpty && idCols.nonEmpty)
    require(bits > 0 && bits * cols.size <= 62,
      s"bits($bits) x cols(${cols.size}) must stay within a positive long")
    val n = df.count()
    require(n > 0, "empty input")
    def intDiv(a: Column, b: Column): Column =
      column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        expression(a), expression(b)))
    var cur = df.withColumn("__one", lit(1L))
    cols.zipWithIndex.foreach { case (c, i) =>
      cur = Packing.withGlobalOffset(
        cur.withColumn(s"__ok_$i",
          struct(col(c) +: idCols.map(col): _*)),
        s"__ok_$i", "__one", s"__pos_$i")
        .withColumn(s"__bin_$i",
          intDiv(col(s"__pos_$i") * lit(1L << bits), lit(n)))
        .drop(s"__ok_$i", s"__pos_$i")
    }
    cur
      .withColumn("zkey",
        mortonKey(cols.indices.map(i => col(s"__bin_$i")), bits))
      .drop("__one" +: cols.indices.map(i => s"__bin_$i"): _*)
  }

  /** QUANTILE-binned Z-order key — the SCALE DEFAULT for skewed
    * clustering columns, with [[zOrderKeyRankBinned]] kept as its
    * exact-rank oracle twin: each column is binned by sampled
    * approx-quantile boundaries (the Delta/Iceberg OPTIMIZE approach) —
    * ONE bounded boundary job per call (the driver collects at most
    * cols × (2^bits − 1) doubles), the boundaries broadcast as a single
    * sorted ARRAY literal per column, and the bin is the map-side
    * monotone count of boundaries ≤ x. The keying itself is pure
    * projection: NO per-column corpus sort, NO checkpoint, NO exchange —
    * the write's range partition is the only shuffle of the whole layout
    * job, where the rank-binned form pays one corpus-wide range sort AND
    * one full materialization PER column. Equally skew-proof: a
    * heavy-hitter value occupies exactly the quantile span its frequency
    * earns, so the remaining values still spread across bit planes.
    *
    * Two documented deviations from the exact-rank twin: boundaries are
    * approximate within `relativeError` (ties inside a boundary's error
    * band may land one bin off — layout quality, never correctness), and
    * rows where the column is null bin to 0 (the rank form totals-orders
    * nulls first — same destination, different mechanism).
    *
    * The per-row cost is one codegen'd loop over the boundary array
    * (2^bits − 1 comparisons), so `bits` is capped at 12; layout
    * clustering needs far fewer bins than that in practice (Delta's
    * OPTIMIZE uses range ids at file granularity — hundreds of bins).
    *
    * @return (input + `zkey`, per-column boundary arrays — the index
    *         metadata a catalog would persist)
    */
  def zOrderKeyQuantileBinned(df: DataFrame, cols: Seq[String], bits: Int,
      relativeError: Double = 0.001)
      : (DataFrame, Map[String, Array[Double]]) = {
    require(cols.nonEmpty, "zOrderKeyQuantileBinned needs columns")
    require(bits > 0 && bits * cols.size <= 62,
      s"bits($bits) x cols(${cols.size}) must stay within a positive long")
    require(bits <= 12,
      s"quantile binning caps at 2^12 bins per column (got 2^$bits); " +
        "use zOrderKeyRankBinned if you genuinely need finer bins")
    val nBins = 1 << bits
    val probs = (1 until nBins).map(_.toDouble / nBins).toArray
    val quantiles =
      df.stat.approxQuantile(cols.toArray, probs, relativeError)
    val bounds = cols.zip(quantiles.map(_.distinct.sorted)).toMap
    val binCols = cols.map { c =>
      val bs = bounds(c)
      require(bs.nonEmpty,
        s"zOrderKeyQuantileBinned: column '$c' has no non-null values")
      // monotone bin = |{b : b ≤ x}| over the sorted boundary literal —
      // one whole-stage-codegen loop per row, the binary-search answer
      // at linear-scan cost (B ≤ 2^bits − 1, bounded above)
      aggregate(typedLit(bs.toSeq), lit(0L),
        (acc, b) => acc + when(col(c).cast("double") >= b, 1L)
          .otherwise(0L))
    }
    (df.withColumn("zkey", mortonKey(binCols, bits)), bounds)
  }

  /** Cluster-and-write: range-partition on the Morton key (uniform by
    * construction → balanced files), sort within partitions, write
    * parquet. Each output file then covers a compact Z-curve segment, so
    * its min/max stats are narrow on every clustered column.
    */
  def writeZOrdered(df: DataFrame, cols: Seq[String], path: String,
      bits: Int = 16, numFiles: Int = 0): DataFrame = {
    val (keyed, _) = zOrderKey(df, cols, bits)
    rangeWrite(keyed, path, numFiles)
  }

  /** [[writeZOrdered]] with the QUANTILE-binned key — the write path for
    * skewed clustering columns: the whole job is the boundary job plus
    * this one range exchange. */
  def writeZOrderedQuantile(df: DataFrame, cols: Seq[String], path: String,
      bits: Int = 8, numFiles: Int = 0): DataFrame = {
    val (keyed, _) = zOrderKeyQuantileBinned(df, cols, bits)
    rangeWrite(keyed, path, numFiles)
  }

  private def rangeWrite(keyed: DataFrame, path: String,
      numFiles: Int): DataFrame = {
    val parts = if (numFiles > 0) numFiles
      else keyed.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    keyed
      .repartitionByRange(parts, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .write.mode("overwrite").parquet(path)
    keyed
  }
}
