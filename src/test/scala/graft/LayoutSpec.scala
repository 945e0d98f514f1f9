package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Layout

/** Z-order layout clustering: key algebra + the actual pruning payoff —
  * per-file min/max spans must be narrow on EVERY clustered column after
  * a Z-ordered write, which is what lets parquet row-group stats prune
  * multi-dimension filters at 100 TB.
  */
class LayoutSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("mortonKey interleaves bits; uniformize is exact integer scaling") {
    // 2-bit, 2-col interleave: (x=0b10, y=0b01) → bits x0@0 y0@1 x1@2 y1@3
    // = 0,1,1,0 → 0b0110 = 6
    val got = Seq((2L, 1L)).toDF("x", "y")
      .select(Layout.mortonKey(Seq(col("x"), col("y")), 2).as("z"))
      .collect()(0).getLong(0)
    assert(got == 6L)
    // uniformize maps [mn, mx] onto [0, 2^bits): endpoints land at 0 and
    // 2^bits − 1, and the mapping is monotone integer division
    val u = Seq(10L, 20L, 29L).toDF("v")
      .select(Layout.uniformize(col("v"), 10L, 29L, 4).as("u"))
      .collect().map(_.getLong(0)).toSeq
    assert(u == Seq(0L, 8L, 15L))
  }

  test("z-ordered write narrows per-file spans on BOTH clustered columns") {
    // a 64×64 grid: a row-major (single-column-sorted) layout keeps the
    // full y span in every file; the z-ordered layout must cut BOTH
    // per-file spans to a fraction of the domain
    val grid = spark.range(64L * 64L)
      .select((col("id") / 64).cast("long").as("x"),
        pmod(col("id"), lit(64L)).as("y"))
    val dir = Files.createTempDirectory("graft_zorder").toString + "/t"
    Layout.writeZOrdered(grid, Seq("x", "y"), dir, bits = 6, numFiles = 16)
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .collect()
    assert(perFile.length == 16)
    val meanSx = perFile.map(_.getLong(1)).sum.toDouble / perFile.length
    val meanSy = perFile.map(_.getLong(2)).sum.toDouble / perFile.length
    // 16 files over a 64×64 Z-curve = 4×4 quadrants of span ~16 each;
    // allow slack for range-partitioner boundaries
    assert(meanSx <= 24, s"x span must shrink: $meanSx")
    assert(meanSy <= 24, s"y span must shrink: $meanSy")
    // a filter on the SECOND dimension — the one a single-column sort
    // cannot help — now touches a minority of files
    val files = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("y").as("mny"), max("y").as("mxy"))
      .collect()
    val touching = files.count(r => r.getLong(1) <= 3 && 3 <= r.getLong(2))
    assert(touching <= 8,
      s"a y=3 point filter must prune most files: $touching of 16")
  }

  test("quantile-binned spans match the exact-rank form on SKEWED data") {
    // x is heavy-hitter skewed (90% of rows share one hot value, the rest
    // a sparse tail up to 10^6); y is uniform. Min/max scaling would park
    // the tail in a sliver of bins; both binned forms must keep per-file
    // y spans narrow AND files balanced, and the sampled-quantile form
    // must be at span parity with the exact-rank oracle twin.
    val n = 4096L
    val df = spark.range(n).select(
      when(pmod(col("id"), lit(10L)) < 9, lit(7L))
        .otherwise(col("id") * 244L).as("x"),
      pmod(col("id") * 37L, lit(64L)).as("y"),
      col("id").as("rid"))
    def spans(keyed: org.apache.spark.sql.DataFrame, tag: String)
        : (Double, Long) = {
      val dir = Files.createTempDirectory(s"graft_zq_$tag").toString + "/t"
      keyed.repartitionByRange(16, col("zkey"))
        .sortWithinPartitions(col("zkey"))
        .write.mode("overwrite").parquet(dir)
      val perFile = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg((max("y") - min("y")).as("sy"), count(lit(1)).as("rows"))
        .collect()
      (perFile.map(_.getLong(1)).sum.toDouble / perFile.length,
        perFile.map(_.getLong(2)).max)
    }
    val (qKeyed, _) = Layout.zOrderKeyQuantileBinned(
      df, Seq("x", "y"), bits = 6, relativeError = 0.001)
    val rKeyed = Layout.zOrderKeyRankBinned(
      df, Seq("x", "y"), idCols = Seq("rid"), bits = 6)
    val (qSpan, qMaxRows) = spans(qKeyed, "q")
    val (rSpan, rMaxRows) = spans(rKeyed, "r")
    // both forms keep the uniform column's per-file span a fraction of
    // its 64-value domain, and neither melts into unbalanced files
    assert(rSpan <= 24, s"rank-binned y span must shrink: $rSpan")
    assert(qSpan <= 24, s"quantile-binned y span must shrink: $qSpan")
    assert(qSpan <= rSpan * 1.6 + 4.0,
      s"quantile binning must be at span parity with exact rank: " +
        s"$qSpan vs $rSpan")
    assert(qMaxRows <= 3 * (n / 16) && rMaxRows <= 3 * (n / 16),
      s"files must stay balanced under skew: q=$qMaxRows r=$rMaxRows")
  }
}
