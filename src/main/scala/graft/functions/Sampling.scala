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

  /** Modulus: the Mersenne prime 2^61 − 1. The multiplier must be of the
    * modulus's ORDER (Knuth's 64-bit MMIX LCG constants): with a small
    * multiplier the affine image of a small id never wraps M, so "mix" is
    * monotonic in the id and every comparison against a rate threshold
    * degenerates to an id-range test. The image id·A reaches ~5.9e37 —
    * far past BIGINT — so Spark folds it in decimal(38,0) (exact,
    * codegen'd) and the DuckDB oracle in HUGEINT; the residue casts back
    * to a BIGINT in [0, M). The mix also consumes the FULL id: an earlier
    * variant reduced `id mod 1000003` first to stay inside BIGINT, which
    * made every decision periodic in the id with that period. */
  val M = 2305843009213693951L
  val A = 6364136223846793005L // Knuth MMIX multiplier
  val B = 1442695040888963407L // Knuth MMIX increment

  /** Affine-modular mix of an id into [0, M). Map-side, codegen'd,
    * engine-independent integer arithmetic; [[mixSql]] is the generated
    * DuckDB mirror. */
  def mix(id: Column): Column =
    pmod(id.cast("decimal(38,0)") * lit(A) + lit(B), lit(M)).cast("long")

  /** DuckDB SQL computing exactly [[mix]] of a non-negative id column —
    * oracles interpolate this so both engines run one formula. */
  def mixSql(idCol: String): String =
    s"((CAST($idCol AS HUGEINT) * $A + $B) % $M)"

  /** Keep ≈`frac` of rows, decided by `mix(id) < frac·M` — a deterministic
    * Bernoulli sample that pushes down as a plain filter (no shuffle, no
    * RNG state). */
  def bernoulli(df: DataFrame, idCol: String, frac: Double): DataFrame =
    df.filter(mix(col(idCol)) < lit((frac * M).toLong))

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
    val rate = rates.foldLeft(lit((defaultRate * M).toLong)) {
      case (acc, (stratum, r)) =>
        when(col(strataCol) === stratum, lit((r * M).toLong)).otherwise(acc)
    }
    df.filter(mix(col(idCol)) < rate)
  }

  /** Temperature-based domain resampling (the multilingual-pretraining
    * standard, e.g. mBERT/XLM-R exponentiated smoothing): domain shares
    * p_i rescale to p_i^(1/T), which flattens the mixture as T grows
    * (T = 1 keeps natural proportions, T → ∞ approaches uniform). This is
    * the downsample-only variant: every domain's keep-rate is
    * (p_i^(1/T−1)) / max_j(p_j^(1/T−1)) ≤ 1, so the hottest domain under
    * the rescaling keeps everything and the rest thin deterministically
    * through [[mixture]]'s pushed-down hash filter.
    *
    * Shape: ONE count aggregate over the corpus (domains are a bounded
    * collect — the IVF-centroid precedent), rates become literals in the
    * CASE chain, and the sample itself is a map-side filter. Rates round
    * to 9 decimals before scaling so the oracle's `pow` agrees despite
    * last-ulp libm differences (margin ~1e6× the pow error).
    */
  def temperatureMixture(
      df: DataFrame, domainCol: String, idCol: String,
      temperature: Double): DataFrame = {
    require(temperature > 0, s"temperature must be positive: $temperature")
    // cast the domain to string so a non-string domain column cannot
    // ClassCastException the driver-side collect
    val counts = df
      .groupBy(col(domainCol).cast("string").as("__dom"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    val exps = counts.map { case (d, n) =>
      d -> math.pow(n / total, 1.0 / temperature - 1.0)
    }
    val mx = exps.values.max
    val rates = exps.map { case (d, e) =>
      d -> BigDecimal(e / mx).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    mixture(df, domainCol, idCol, rates)
  }

  /** Temperature resampling, UPSAMPLING form — the actual Pile/ROOTS
    * mixture operation ([[temperatureMixture]] only thins): rates
    * normalize by the MINIMUM rescaled share, so every rate is ≥ 1 and
    * some domain keeps exactly one copy. For T ≥ 1 (flattening — the
    * intended use) that anchor is the most-common domain and rarer
    * domains REPLICATE at r_i = p_i^(1/T−1) / min_j(p_j^(1/T−1)); for
    * T < 1 the exponent flips sign, so the RAREST domain anchors at one
    * copy and common domains replicate (sharpening). Each row emits
    * ⌊r⌋ copies plus one more when `mix(id) < frac(r)·M` — the same
    * deterministic Bernoulli as every sampler here, so the replicated
    * corpus is a pure function of (id, domain shares): byte-reproducible
    * across runs, partitionings, and engines.
    *
    * Shape: ONE count aggregate (bounded domain collect), rates as
    * literals, then a map-side `explode(sequence(...))` — fan-out is the
    * rate, no shuffle. Output = input columns + `copy` (0-based copy
    * index; copy 0 is the original). Rates round to 9 decimals pre-scale
    * so the oracle's `pow` agrees (the [[temperatureMixture]] margin
    * argument).
    */
  def temperatureUpsample(
      df: DataFrame, domainCol: String, idCol: String,
      temperature: Double): DataFrame = {
    require(temperature > 0, s"temperature must be positive: $temperature")
    // cast the domain to string so a non-string domain column cannot
    // ClassCastException the driver-side collect
    val counts = df
      .groupBy(col(domainCol).cast("string").as("__dom"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    val exps = counts.map { case (dm, n) =>
      dm -> math.pow(n / total, 1.0 / temperature - 1.0)
    }
    val mn = exps.values.min
    val rates = exps.map { case (dm, e) =>
      dm -> BigDecimal(e / mn).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    val whole = rates.foldLeft(lit(1L)) { case (acc, (dm, r)) =>
      when(col(domainCol) === dm, lit(math.floor(r).toLong)).otherwise(acc)
    }
    val fracThr = rates.foldLeft(lit(0L)) { case (acc, (dm, r)) =>
      when(col(domainCol) === dm,
        lit(((r - math.floor(r)) * M).toLong)).otherwise(acc)
    }
    val copies = whole +
      when(mix(col(idCol)) < fracThr, lit(1L)).otherwise(lit(0L))
    df.withColumn("copy", explode(sequence(lit(0L), copies - lit(1L))))
  }

  /** Explicit-rate resampling — the general mixture operator unifying
    * [[mixture]] (rates ≤ 1) and [[temperatureUpsample]] (rates ≥ 1):
    * each row of stratum s emits ⌊r_s⌋ copies plus one more when
    * `mix(id) < frac(r_s)·M`. Rate 0.5 IS the [[mixture]] Bernoulli
    * decision (⌊r⌋ = 0, same threshold test), rate 2.5 replicates 2–3×,
    * so a single pass applies a target mixture spec ("2× books, 0.3×
    * web") exactly — deterministic, map-side, fan-out = the rate.
    * Output = input columns + `copy` (0-based; rows with 0 copies drop
    * out of the explode).
    */
  def resample(
      df: DataFrame, strataCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    require(rates.values.forall(_ >= 0) && defaultRate >= 0,
      "rates must be non-negative")
    def whole(r: Double) = math.floor(r).toLong
    def fracThr(r: Double) = ((r - math.floor(r)) * M).toLong
    val wholeCol = rates.foldLeft(lit(whole(defaultRate))) {
      case (acc, (s, r)) =>
        when(col(strataCol) === s, lit(whole(r))).otherwise(acc)
    }
    val thrCol = rates.foldLeft(lit(fracThr(defaultRate))) {
      case (acc, (s, r)) =>
        when(col(strataCol) === s, lit(fracThr(r))).otherwise(acc)
    }
    val copies = wholeCol +
      when(mix(col(idCol)) < thrCol, lit(1L)).otherwise(lit(0L))
    // sequence(0, -1) would DESCEND ([0, -1]) — zero-copy rows must hit
    // explode as null so they drop out, never as a two-element array
    df.withColumn("copy", explode(
      when(copies > 0, sequence(lit(0L), copies - lit(1L)))))
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

  /** Reproducible WEIGHTED sampling without replacement per stratum
    * (Efraimidis–Spirakis A-Res): each row draws its uniform
    * u = (mix(id)+1)/M ∈ (0,1] deterministically from the id, scores
    * key = ln(u)/w, and the k largest keys win — inclusion probability
    * proportional to the weight (quality score, length, recency), yet
    * byte-reproducible across runs/partitionings like every sampler here.
    * The key uses doubles (ln has no exact integer form), so this one is
    * pinned by a JVM-recomputation spec instead of a cross-engine oracle.
    * Rows with null or non-positive weight are never selected.
    */
  /** Reproducible global corpus shuffle — the training-order primitive: a
    * deterministic permutation of the corpus, different per `epoch`, with
    * an explicit 0-based position column. Order = the affine-modular mix
    * of (id + epoch·1000003): bijective over ids mod the Mersenne prime,
    * so distinct ids never tie and the permutation is a pure function of
    * (id, epoch) — identical across re-runs, partitionings, and engines.
    *
    * Scale: ordering is a range-partitioned sort on the hash key (uniform
    * → balanced); the position column comes from Packing.withGlobalOffset's
    * two-phase distributed prefix sum (per-partition window + one bounded
    * per-partition-totals pass), NOT a global single-partition window.
    */
  def shuffleOrder(df: DataFrame, idCol: String, epoch: Long): DataFrame = {
    val keyed = df
      .withColumn("__sk", mix(col(idCol) + lit(epoch) * lit(1000003L)))
      .withColumn("__one", lit(1L))
    Packing.withGlobalOffset(keyed, "__sk", "__one", "pos")
      .drop("__one").withColumnRenamed("__sk", "shuffle_key")
  }

  /** DuckDB mirror of [[shuffleOrder]]'s ordering key. */
  def shuffleKeySql(idCol: String, epoch: Long): String =
    mixSql(s"($idCol + ${epoch * 1000003L})")

  /** EXACT k-th largest value of an integer column WITHOUT a global
    * sort: iterative histogram refinement. Each pass is ONE bounded
    * aggregate — at most 65536 map-side-combined buckets over the
    * current value range — and narrows the range by 2^16, so any
    * 64-bit range resolves in ≤ 4 passes (2–3 in practice after the
    * adaptive min/max first pass). This is the 100 TB shape of "learn
    * the score cutoff": corpus-linear scans, driver state one
    * histogram, versus the global sort/rank a naive percentile takes.
    * Offsets ride decimal(38,0) so a range spanning the full signed
    * 64-bit space cannot wrap. Ignores null values. The result is a
    * pure property of the multiset (selection is order-free), so it
    * replays exactly in SQL (`row_number() ... DESC` at rank k).
    *
    * Callers iterating over an expensive plan should materialize the
    * column first ([[keepTopFraction]] does). */
  def kthLargest(df: DataFrame, valueCol: String, k: Long): Long =
    kthLargestMulti(df, valueCol, Seq(k))(k)

  /** One refinement pass of the selection: the bounded histogram of
    * `[lo, hi]` values in buckets of width `w` — a plain partial/final
    * HashAggregate over ≤ 65536 groups, NO Sort, NO window, no join
    * (PlanSpec pins that shape; the filter and bucket arithmetic are
    * codegen'd). Exposed for the plan pin. */
  private[graft] def selectionHistogram(vals: DataFrame, lo: Long,
      hi: Long, w: Long): DataFrame = {
    val dec = "decimal(38,0)"
    vals
      .filter(col("__v") >= lit(lo) && col("__v") <= lit(hi))
      .groupBy(floor((col("__v").cast(dec) - lit(lo).cast(dec))
        / lit(w)).cast("int").as("__b"))
      .agg(count(lit(1)).as("__n"))
  }

  /** The long-cast non-null value column the selection walks. The
    * histogram path is INTEGER selection — a fractional column would
    * silently learn its cutoff on truncated values and then filter the
    * untruncated ones, so non-integral types fail loudly here. */
  private def longVals(df: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.types._
    val dt = df.schema(valueCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"exact selection needs an integral column; '$valueCol' is $dt " +
        "(for fractional scores use keepTopFractionApprox, or scale to " +
        "integer nanos first — the engine-wide *_nano discipline)")
    df.select(col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
  }

  /** (min, max, count) of the prepared value column — ONE aggregate,
    * shared by the selection entry points so no caller pays a separate
    * count() scan. count = 0 ⇒ min/max are None. */
  private def longStats(vals: DataFrame): (Option[(Long, Long)], Long) = {
    val r = vals.agg(min("__v"), max("__v"), count(lit(1))).head()
    if (r.isNullAt(0)) (None, 0L)
    else (Some((r.getLong(0), r.getLong(1))), r.getLong(2))
  }

  /** [[kthLargest]] for SEVERAL ranks at once, sharing histogram
    * passes: targets whose (lo, hi) search ranges coincide — always
    * true on the first pass, usually for several passes after — are
    * answered by ONE aggregate, so q quantiles cost far fewer than
    * q × passes scans. Null values are ignored (a null is never in a
    * top-k). Returns k → value. */
  def kthLargestMulti(df: DataFrame, valueCol: String,
      ks: Seq[Long]): Map[Long, Long] = {
    val vals = longVals(df, valueCol)
    val (range, n) = longStats(vals)
    selectKth(vals, range, n, ks)
  }

  /** The refinement loop over an already-prepared `__v` column with
    * known stats — the shared core of [[kthLargestMulti]] /
    * [[exactQuantiles]] / [[keepTopFraction]]. */
  private def selectKth(vals: DataFrame, range: Option[(Long, Long)],
      n: Long, ks: Seq[Long]): Map[Long, Long] = {
    require(ks.nonEmpty && ks.forall(_ >= 1),
      s"exact selection needs ranks >= 1, got $ks")
    require(range.nonEmpty && n >= ks.max,
      s"exact selection: k=${ks.max} exceeds the $n non-null rows")
    val buckets = 65536
    // (original k, current lo, current hi, remaining top-rank in range)
    var targets = ks.distinct
      .map(k => (k, BigInt(range.get._1), BigInt(range.get._2), k))
    val done = scala.collection.mutable.Map[Long, Long]()
    while (targets.nonEmpty) {
      targets = targets
        .groupBy { case (_, lo, hi, _) => (lo, hi) }
        .toSeq
        .flatMap { case ((lo, hi), ts) =>
          val w = ((hi - lo + 1) + (buckets - 1)) / buckets // width ≥ 1
          val counts =
            selectionHistogram(vals, lo.toLong, hi.toLong, w.toLong)
              .collect().map(r => (r.getInt(0), r.getLong(1)))
              .sortBy(-_._1) // walk from the TOP bucket down
          ts.map { case (k, _, _, need0) =>
            var need = need0
            var sel = -1
            for ((b, n) <- counts if sel < 0)
              if (need <= n) sel = b else need -= n
            assert(sel >= 0, "histogram walk must land")
            val nlo = lo + BigInt(sel) * w
            (k, nlo, (nlo + w - 1).min(hi), need)
          }
        }
        .filter { case (k, lo, hi, _) =>
          if (lo == hi) { done(k) = lo.toLong; false } else true
        }
    }
    ks.map(k => k -> done(k)).toMap
  }

  /** EXACT discrete quantiles without a global sort: for each
    * `fraction` p, the value at ascending rank ceil(p·n) (the "lower"
    * / type-1 discrete quantile — p = 0.5 the lower median, p = 1 the
    * max), answered via [[kthLargestMulti]] with the descending rank
    * n − ceil(p·n) + 1, all fractions sharing histogram passes. The
    * rank is computed with the fraction's DECIMAL string value,
    * matching the oracle's SQL decimal-literal ceil(p·n): 0.07 · 1100
    * is exactly 77 in decimal where the double product is
    * 77.00000000000001 and would ceil to 78.
    * @return (fraction, value) in input order */
  def exactQuantiles(df: DataFrame, valueCol: String,
      fractions: Seq[Double]): Seq[(Double, Long)] = {
    require(fractions.nonEmpty &&
      fractions.forall(p => p > 0.0 && p <= 1.0),
      s"fractions must be in (0, 1], got $fractions")
    val vals = longVals(df, valueCol).localCheckpoint()
    val (range, n) = longStats(vals)
    require(n > 0, "exactQuantiles needs a non-empty column")
    def rankOf(p: Double): Long =
      (BigDecimal(p.toString) * n)
        .setScale(0, BigDecimal.RoundingMode.CEILING).toLong
    val byK = selectKth(vals, range, n,
      fractions.map(p => n - rankOf(p) + 1).distinct)
    fractions.map(p => p -> byK(n - rankOf(p) + 1))
  }

  /** Keep the rows whose `scoreCol` is in the top `fraction` of the
    * frame's score distribution — the production FineWeb-Edu / DCLM
    * curation operation ("keep the top p% by classifier score"), where
    * a fixed τ can't track a drifting distribution. The cutoff is the
    * exact ceil(fraction·n)-th largest score ([[kthLargest]] — bounded
    * histogram passes, never a global sort); rows TIED at the cutoff
    * are all kept, so the result is a pure property of the data (no
    * arbitrary tie-break), possibly exceeding p% by the tie width.
    *
    * The frame is localCheckpoint-ed first: the cutoff learning scans
    * it ~3–5 times, so pass a NARROW projection (id + score — the
    * checkpoint is what makes the repeated scans cheap; 16 bytes/row,
    * not the corpus). The score column must be integral (the
    * [[longVals]] contract); null-score rows are EXCLUDED before the
    * fraction is taken — a null is never in a top p%, and counting
    * nulls into n would deepen the cutoff past the requested fraction
    * of real scores. Empty (or all-null) input returns empty. */
  def keepTopFraction(df: DataFrame, scoreCol: String,
      fraction: Double): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction must be in (0, 1], got $fraction")
    val scored = df.filter(col(scoreCol).isNotNull).localCheckpoint()
    val (range, n) = longStats(longVals(scored, scoreCol))
    if (n == 0L) scored
    else {
      // decimal-string rank arithmetic (see exactQuantiles): matches
      // the oracle's SQL decimal-literal ceil(p·n) exactly
      val k = (BigDecimal(fraction.toString) * n)
        .setScale(0, BigDecimal.RoundingMode.CEILING).toLong
      val cutoff =
        selectKth(longVals(scored, scoreCol), range, n, Seq(k))(k)
      scored.filter(col(scoreCol) >= lit(cutoff))
    }
  }

  /** One-pass APPROXIMATE variant of [[keepTopFraction]] — the sketch
    * path when the p% budget is a target rather than a contract: the
    * cutoff is `percentile_approx(score, 1 − p)` (Spark's mergeable GK
    * sketch, rank error ≤ n/accuracy), so ONE aggregate replaces the
    * exact selection's histogram passes and the input is scanned twice
    * total (cutoff + filter) with no checkpoint. Survivor count is
    * p·n ± the sketch's rank error; exact-mode GK (n ≤ accuracy)
    * degenerates to [[keepTopFraction]]'s cutoff. Ties at the cutoff
    * are kept, like the exact form. */
  def keepTopFractionApprox(df: DataFrame, scoreCol: String,
      fraction: Double, accuracy: Int = 10000): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction must be in (0, 1], got $fraction")
    val row = df.agg(percentile_approx(col(scoreCol),
      lit(1.0 - fraction), lit(accuracy)).as("c")).head()
    if (row.isNullAt(0)) df.filter(lit(false)) // empty input
    else df.filter(col(scoreCol) >= lit(row.get(0)))
  }

  /** [[keepTopFraction]] WITHIN each group — the per-language /
    * per-domain / per-class balanced curation cut ("top p% of every
    * stratum", so head strata can't crowd out the tail). The cutoff is
    * per-group, so the lowering is the stratified-sampling shape
    * rather than the global form's histogram passes (which would need
    * one selection per group): ONE shuffle by `groupCol`, a per-group
    * descending rank (ties broken by `tieCol` only for WHERE the rank
    * lands — the kept set is still tie-inclusive and a pure property
    * of the data), the group count and the rank-ceil(p·n_g) cutoff
    * value as whole-partition window aggregates, then the `score ≥
    * cutoff` filter. No global sort, no driver state; group
    * cardinality is unbounded (each group sorts within its partition,
    * spilling like any window).
    * @return the surviving input rows */
  def keepTopFractionByGroup(df: DataFrame, groupCol: String,
      scoreCol: String, tieCol: String, fraction: Double): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction must be in (0, 1], got $fraction")
    val wOrd = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(tieCol))
    val wAll = Window.partitionBy(col(groupCol))
    // null scores are excluded BEFORE the per-group fraction is taken:
    // desc ordering sorts nulls last, so counting them into n_g could
    // land the rank-⌈p·n_g⌉ cutoff ON a null and silently drop the
    // whole group (a null is never in a top p% anyway). Any orderable
    // score type works here — no histogram, unlike the global form.
    df.filter(col(scoreCol).isNotNull)
      .withColumn("__rnk", row_number().over(wOrd))
      .withColumn("__kg",
        ceil(lit(new java.math.BigDecimal(fraction.toString))
          * count(lit(1)).over(wAll)).cast("long"))
      .withColumn("__cut",
        max(when(col("__rnk") === col("__kg"), col(scoreCol))).over(wAll))
      .filter(col(scoreCol) >= col("__cut"))
      .drop("__rnk", "__kg", "__cut")
  }

  def weightedStratified(
      df: DataFrame, strataCol: String, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    val u = (mix(col(idCol)).cast("double") + 1.0) / M.toDouble
    val key = log(u) / col(weightCol)
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("__wkey").desc, col(idCol))
    df.filter(col(weightCol) > 0)
      .withColumn("__wkey", key)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__wkey", "__rn")
  }
}
