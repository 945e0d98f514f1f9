package graft.kql

/** KQL abstract syntax — the analog of the reference's `QueryStep`/`Expr` IR
  * (`miso-workflow-types/src/query.rs:8-33`, `expr.rs:15-48`), shaped for
  * lowering onto Spark `Column`/`DataFrame` ops rather than an interpreter.
  */

/** One segment of a field path: `name[i][j]`
  * (reference: `miso-workflow-types/src/field.rs:14-20`). */
final case class FieldAccess(name: String, arrIndices: Seq[Int] = Nil)

/** Nested field path `a.b[0].c`. */
final case class FieldPath(parts: Seq[FieldAccess]) {
  /** Render with the reference's display convention (dots + [i]). */
  def render: String = parts.map { p =>
    p.name + p.arrIndices.map(i => s"[$i]").mkString
  }.mkString(".")
  /** Flat name used for auto-aliasing (`display_with("_")` analog). */
  def flat: String = parts.map { p =>
    p.name + p.arrIndices.map(i => s"_$i").mkString
  }.mkString("_")
  def isSimple: Boolean = parts.length == 1 && parts.head.arrIndices.isEmpty
  def simpleName: String = parts.head.name
}
object FieldPath {
  def simple(name: String): FieldPath = FieldPath(Seq(FieldAccess(name)))
}

sealed trait Expr
object Expr {
  // Literals — `now()` is bound at parse time (reference parser.rs:368-372).
  final case class IntLit(v: Long) extends Expr
  final case class FloatLit(v: Double) extends Expr
  final case class BoolLit(v: Boolean) extends Expr
  final case class StrLit(v: String) extends Expr
  case object NullLit extends Expr
  /** Duration literal (`1d`, `2h`, `30m`, `10s`, `100ms`) in microseconds. */
  final case class TimespanLit(micros: Long) extends Expr
  /** `datetime(...)` literal, epoch microseconds UTC. */
  final case class DatetimeLit(micros: Long) extends Expr

  final case class Field(path: FieldPath) extends Expr

  /** A simple name that is BOTH a scalar `let` binding and potentially a
    * column: Kusto resolves the innermost scope, so a column of that name
    * in the tabular context wins over the let. The parser cannot see the
    * schema, so the choice is deferred to compile time (`bound` is the
    * let's expression, used only when no column resolves).
    */
  final case class LetRef(path: FieldPath, bound: Expr) extends Expr

  final case class And(l: Expr, r: Expr) extends Expr
  final case class Or(l: Expr, r: Expr) extends Expr
  final case class Not(e: Expr) extends Expr

  /** op ∈ ==, !=, >, >=, <, <= */
  final case class Cmp(op: String, l: Expr, r: Expr) extends Expr
  /** op ∈ + - * / ; `/` always yields double (interpreter/mod.rs:70-103). */
  final case class Arith(op: String, l: Expr, r: Expr) extends Expr
  final case class Neg(e: Expr) extends Expr
  /** The i-th field of a STRUCT-valued expression — produced only by the
    * multi-assign projection form `(n1, n2, …) = f(…)` (ADX's tuple
    * functions: series_stats, series_fit_line, series_fit_2lines). */
  final case class TupleGet(e: Expr, idx: Int) extends Expr

  final case class In(e: Expr, items: Seq[Expr], negated: Boolean) extends Expr
  final case class Between(e: Expr, lo: Expr, hi: Expr, negated: Boolean) extends Expr

  /** op ∈ contains, startswith, endswith, has, has_cs, matches_regex
    * (w/ optional negation). `matches regex` takes a literal pattern. */
  final case class StrOp(op: String, l: Expr, r: Expr, negated: Boolean) extends Expr
  /** `bin_at(x, width, anchor)` — binning aligned to an explicit anchor
    * instead of zero/epoch: anchor + floor((x−anchor)/width)·width. Works
    * over numerics and datetimes (timespan width). */
  final case class BinAt(x: Expr, width: Expr, anchor: Expr) extends Expr

  /** case(c1, v1, c2, v2, …, default) / iff(c, t, f). */
  final case class Case(branches: Seq[(Expr, Expr)], default: Expr) extends Expr
  /** extract(regex, group, source) → null on no-match. */
  final case class Extract(regex: String, group: Int, src: Expr) extends Expr
  /** bin(x, width) — numeric or timestamp flooring. */
  final case class Bin(e: Expr, width: Expr) extends Expr
  /** kind ∈ tostring toint tolong toreal todecimal tobool todouble. */
  final case class Cast(kind: String, e: Expr) extends Expr
  final case class Exists(e: Expr) extends Expr
  /** strcat(e1, e2, ...) */
  final case class StrCat(args: Seq[Expr]) extends Expr
  /** Unary text-pipeline scalar (beyond the reference's closed set):
    * name ∈ tokencount simhash fingerprint langid — lowered to the native
    * single-pass kernels in [[graft.functions]].
    */
  final case class TextFn(name: String, arg: Expr) extends Expr
  /** Common string scalars (real-KQL surface beyond the reference's
    * closed set): name ∈ strlen tolower toupper trim substring
    * replace_string. substring is 0-based like KQL, clamped at 0.
    */
  final case class StrFn(name: String, args: Seq[Expr]) extends Expr
  /** Datetime scalars (real-KQL surface beyond the reference): name ∈
    * startofday startofhour startofweek startofmonth startofyear endofday
    * hourofday dayofmonth monthofyear dayofweek weekofyear. Timestamps
    * are UTC throughout (session timezone pinned), so truncations and
    * field extractions agree across engines. Weeks start on Sunday
    * (KQL convention): startofweek truncates to the preceding Sunday and
    * dayofweek yields 0 (Sunday) … 6 (Saturday); weekofyear is ISO 8601. */
  final case class DtFn(name: String, arg: Expr) extends Expr
  /** `datetime_diff(period, dt1, dt2)` → signed count of PERIOD BOUNDARIES
    * crossed between dt2 and dt1 (KQL semantics — datetime_diff('year',
    * 2015-01-01, 2014-12-31) is 1): both sides truncate to the period then
    * difference, not elapsed-time division. period ∈ year month day hour
    * minute second. */
  final case class DtDiff(period: String, a: Expr, b: Expr) extends Expr
  /** datetime_add(period, n, ts) — calendar-aware for year/month
    * (add_months semantics: day-of-month clamps), exact micros arithmetic
    * for day/hour/minute/second. */
  final case class DtAdd(period: String, n: Expr, ts: Expr) extends Expr
  /** Null/empty scalars (real-KQL): isnull isnotnull isempty isnotempty
    * take one arg; coalesce takes 2+. KQL's isempty treats null and the
    * empty string alike, and coalesce likewise skips empty *strings*, not
    * just nulls. */
  final case class NullFn(name: String, args: Seq[Expr]) extends Expr
  /** Math scalars (real-KQL): abs round exp log log10 log2 sqrt pow sign.
    * `log` is the natural logarithm (KQL convention); round takes an
    * optional precision. abs preserves int-ness; the rest yield real. */
  final case class MathFn(name: String, args: Seq[Expr]) extends Expr
  /** Array/string scalars (real-KQL): split(s, delim[, index]) — literal
    * (non-regex) delimiter, 0-based index form returns the single element;
    * indexof(s, lookup) — 0-based, -1 when absent; array_length(arr);
    * strcat_delim(delim, e1, e2, …). */
  final case class ArrFn(name: String, args: Seq[Expr]) extends Expr
  /** Serialized window scalars (real-KQL): row_number([start]),
    * prev(col[, offset[, default]]), next(col[, offset[, default]]),
    * row_cumsum(term). Only valid on a SERIALIZED row set — i.e. after a
    * `sort`/`top` step whose keys then define the window order (KQL's
    * serialize-then-window model); the compiler rejects them otherwise. */
  final case class WinFn(name: String, args: Seq[Expr]) extends Expr
  /** toscalar(subquery) — first column of the first row, evaluated
    * EAGERLY when the outer query compiles (Kusto's semantics; explain
    * included). One bounded single-value driver fetch per distinct
    * subquery, memoized within a compilation. */
  final case class ToScalar(q: Query) extends Expr
  /** `column_ifexists(name, default)` — the column when the input schema
    * has it (case-insensitive), else the default expression. Resolution
    * is per compile site, so the same query text survives schema drift —
    * Kusto's tool for heterogeneous tables. */
  final case class ColumnIfExists(name: String, dflt: Expr) extends Expr
}

sealed trait SortOrder
object SortOrder { case object Asc extends SortOrder; case object Desc extends SortOrder }
sealed trait NullsOrder
object NullsOrder { case object First extends NullsOrder; case object Last extends NullsOrder }

/** Reference defaults: asc + nulls last (`miso-workflow-types/src/sort.rs:7-22`).
  * `expr` carries a non-field sort key (real-KQL `sort by strlen(x)`);
  * such keys clear the serialized-window order — window scalars need
  * named keys. `field` is then a display placeholder. */
final case class SortKey(
    field: FieldPath,
    order: SortOrder = SortOrder.Asc,
    nulls: NullsOrder = NullsOrder.Last,
    expr: Option[Expr] = None)

sealed trait Aggregation
object Aggregation {
  case object Count extends Aggregation
  final case class Countif(e: Expr) extends Aggregation
  final case class DCount(f: FieldPath) extends Aggregation
  /** Beyond-the-reference fast mode: HyperLogLog++ distinct estimate —
    * no exact-distinct shuffle, mergeable sketch state (SURVEY §2.2 notes
    * `approx_count_distinct` as the documented fast mode of `dcount`). */
  final case class DCountApprox(f: FieldPath) extends Aggregation
  final case class Sum(f: FieldPath) extends Aggregation
  final case class Avg(f: FieldPath) extends Aggregation
  final case class Min(f: FieldPath) extends Aggregation
  final case class Max(f: FieldPath) extends Aggregation
  /** `percentile(f, 95)` — approximate percentile via a mergeable quantile
    * sketch (Azure KQL's percentile is likewise approximate/T-digest;
    * beyond the reference's closed agg set). `p` ∈ [0, 100]. */
  final case class Percentile(f: FieldPath, p: Double) extends Aggregation
  /** `make_list(f)` / `make_set(f)` — collect group values into an array.
    * KQL leaves the order unspecified; we SORT the result (nulls dropped,
    * set additionally dedups) so output is deterministic across engines,
    * partitionings, and re-runs — the only sane contract for a distributed
    * engine. */
  final case class MakeList(f: FieldPath) extends Aggregation
  final case class MakeSet(f: FieldPath) extends Aggregation
  /** Conditional forms: collect only predicate-truthy rows. */
  final case class MakeListIf(f: FieldPath, pred: Expr) extends Aggregation
  final case class MakeSetIf(f: FieldPath, pred: Expr) extends Aggregation
  /** `make_list_with_nulls(f)` — like make_list but null inputs survive
    * as null elements (collected through a one-field struct wrapper so
    * collect_list can't drop them; sorted nulls-last like make_list). */
  final case class MakeListNulls(f: FieldPath) extends Aggregation
  /** `arg_max(f, ret)` / `arg_min(f, ret)` — value of `ret` on the row
    * where `f` is extreme. Ties break by the larger (resp. smaller) `ret`
    * — KQL leaves ties unspecified; a total rule keeps results stable
    * under repartitioning. */
  final case class ArgMax(f: FieldPath, ret: FieldPath) extends Aggregation
  final case class ArgMin(f: FieldPath, ret: FieldPath) extends Aggregation
  /** Multi-return / star forms: `arg_max(f, r1, r2, …)` and
    * `arg_max(f, *)` (rets empty = every input column except the group
    * keys). The whole winning row travels as ONE struct through the
    * aggregate (same total tie rule as [[ArgMax]]) and expands to columns
    * named after the returns post-aggregation — Kusto's output shape. */
  final case class ArgExtremeRows(isMax: Boolean, f: FieldPath,
      rets: Seq[FieldPath]) extends Aggregation
  /** `stdev(f)` / `variance(f)` — sample standard deviation / variance
    * (n−1 denominator, KQL convention); empty/single-row groups → null. */
  final case class Stdev(f: FieldPath) extends Aggregation
  final case class Variance(f: FieldPath) extends Aggregation
  /** `tdigest(f)` / `merge_tdigest(f)` — mergeable percentile sketches,
    * the rank analog of the hll family: sketch per rollup group, merge
    * across groups, estimate with `percentile_tdigest()`. */
  final case class TDigestA(f: FieldPath) extends Aggregation
  final case class TDigestMerge(f: FieldPath) extends Aggregation
  /** `topk_approx(f, k)` / `topk_accum(f)` / `merge_topk(f)` — mergeable
    * heavy-hitters sketches (the frequency analog of the hll/tdigest
    * rollup families, lowered to Spark's DataSketches-backed
    * approx_top_k/accumulate/combine aggregates): sketch per rollup
    * group, combine across groups, estimate (item, count) pairs with the
    * scalar `topk_estimate(state, k)`. Counts are EXACT whenever the
    * sketch's tracked-item budget covers the true distinct count —
    * which is what lets the gate oracle compare against a plain
    * GROUP BY. */
  final case class TopKApprox(f: FieldPath, k: Int) extends Aggregation
  final case class TopKAccum(f: FieldPath) extends Aggregation
  final case class TopKMerge(f: FieldPath) extends Aggregation
  /** Population (n denominator) forms: `stdevp(f)` / `variancep(f)`. */
  final case class StdevP(f: FieldPath) extends Aggregation
  final case class VarianceP(f: FieldPath) extends Aggregation
  /** `covariance(a, b)` / `covariancep(a, b)` — sample / population
    * covariance over pairwise non-null rows. */
  final case class Covariance(pop: Boolean, a: FieldPath, b: FieldPath)
      extends Aggregation
  /** `correlation(a, b)` — Pearson correlation over pairwise non-null
    * rows (round 9). */
  final case class Correlation(a: FieldPath, b: FieldPath)
      extends Aggregation
  /** Conditional aggregate family (real-KQL): `sumif/avgif/minif/maxif
    * (f, predicate)` and `dcountif(f, predicate)` — aggregate only the
    * rows where the predicate is truthy. sumif of no matching rows is 0.0
    * (KQL/reference sum convention); the others yield null. */
  final case class AggIf(kind: String, f: FieldPath, pred: Expr) extends Aggregation
  /** Kusto take_any(col) — "an arbitrary value per group"; made
    * DETERMINISTIC here (the minimum, same policy as make_set's sort):
    * arbitrary-but-stable beats arbitrary under shuffles and re-runs. */
  final case class TakeAny(f: FieldPath) extends Aggregation
  /** binary_all_and / binary_all_or / binary_all_xor — bitwise aggregate
    * over long values; op ∈ and|or|xor. */
  final case class BinaryAll(op: String, f: FieldPath) extends Aggregation
  /** make_bag(f) / make_bag_if(f, pred) — shallow merge of the group's
    * property bags into one. Kusto leaves the collision winner arbitrary;
    * ours is deterministic: bags merge in canonical JSON-text sort order,
    * first bag wins each key (stable under repartitioning, like
    * take_any/make_set). Empty group → `{}`. */
  final case class MakeBag(f: FieldPath, pred: Option[Expr]) extends Aggregation
  /** hll(col) — mergeable HLL sketch state (binary), the pre-aggregated
    * rollup primitive; hll_merge(col) unions stored sketches. Estimate
    * with the dcount_hll() scalar. */
  final case class Hll(f: FieldPath) extends Aggregation
  final case class HllMerge(f: FieldPath) extends Aggregation
  /** percentiles(f, p1, p2, …) — marker expanded by the SUMMARIZE parser
    * into one [[Percentile]] per p (Kusto's multi-column form); reaching
    * the compiler unexpanded is a parse-context error. */
  final case class Percentiles(f: FieldPath, ps: Seq[Double]) extends Aggregation
  /** `buildschema(f)` — minimal merged schema of a dynamic column (per-row
    * shape kernel + distinct-set merge; see
    * [[graft.functions.BuildSchemaUtil]]). */
  final case class BuildSchema(f: FieldPath) extends Aggregation
  /** `percentiles_array(f, p1…pN)` — ONE dynamic array column of the same
    * approximate percentiles `percentiles()` expands to columns. */
  final case class PercentilesArray(f: FieldPath, ps: Seq[Double]) extends Aggregation
  /** `percentilew(f, w, p)` — weighted percentile: each row counts `w`
    * times. Exact (Spark's frequency-weighted percentile, linear
    * interpolation over the expanded multiset); weights must be
    * non-negative integers. Memory is O(distinct values) per group — the
    * tdigest family is the sketch path at scale. */
  final case class PercentileW(f: FieldPath, w: FieldPath, p: Double) extends Aggregation

  /** Default output names (reference parser.rs:290-301). */
  def defaultName(a: Aggregation): String = a match {
    case Count       => "count_"
    case Countif(_)  => "countif_"
    case DCount(f)   => s"dcount_${f.flat}"
    case DCountApprox(f) => s"dcount_approx_${f.flat}"
    case Sum(f)      => s"sum_${f.flat}"
    case Avg(f)      => s"avg_${f.flat}"
    case Min(f)      => s"min_${f.flat}"
    case Max(f)      => s"max_${f.flat}"
    case Percentile(f, p) =>
      val ps = if (p == p.floor) p.toLong.toString else p.toString.replace('.', '_')
      s"percentile_${f.flat}_$ps"
    case MakeList(f)  => s"list_${f.flat}"
    case MakeSet(f)   => s"set_${f.flat}"
    case MakeListIf(f, _) => s"list_${f.flat}"
    case MakeSetIf(f, _)  => s"set_${f.flat}"
    case MakeListNulls(f) => s"list_${f.flat}"
    case MakeBag(f, _) => s"bag_${f.flat}"
    case ArgMax(f, _) => s"max_${f.flat}"
    case ArgMin(f, _) => s"min_${f.flat}"
    case ArgExtremeRows(isMax, f, _) =>
      s"${if (isMax) "max" else "min"}_${f.flat}"
    case Stdev(f)     => s"stdev_${f.flat}"
    case Variance(f)  => s"variance_${f.flat}"
    case TDigestA(f)     => s"tdigest_${f.flat}"
    case TDigestMerge(f) => s"merge_tdigest_${f.flat}"
    case TopKApprox(f, _) => s"topk_approx_${f.flat}"
    case TopKAccum(f)    => s"topk_accum_${f.flat}"
    case TopKMerge(f)    => s"merge_topk_${f.flat}"
    case StdevP(f)    => s"stdevp_${f.flat}"
    case VarianceP(f) => s"variancep_${f.flat}"
    case Covariance(pop, a, b) =>
      s"covariance${if (pop) "p" else ""}_${a.flat}_${b.flat}"
    case Correlation(a, b) => s"correlation_${a.flat}_${b.flat}"
    case AggIf(k, f, _) => s"${k}_${f.flat}"
    case TakeAny(f)     => s"any_${f.flat}"
    case BinaryAll(op, f) => s"binary_all_${op}_${f.flat}"
    case Hll(f)         => s"hll_${f.flat}"
    case HllMerge(f)    => s"hll_merge_${f.flat}"
    case Percentiles(f, _) => s"percentiles_${f.flat}"
    case BuildSchema(f) => s"schema_${f.flat}"
    case PercentilesArray(f, _) => s"percentiles_array_${f.flat}"
    case PercentileW(f, _, p) =>
      val ps = if (p == p.floor) p.toLong.toString else p.toString.replace('.', '_')
      s"percentilew_${f.flat}_$ps"
  }
}

final case class AggField(agg: Aggregation, name: String)
final case class ByField(expr: Expr, name: String)

sealed trait JoinKind
object JoinKind {
  case object Inner extends JoinKind
  case object Outer extends JoinKind
  case object Left extends JoinKind
  case object Right extends JoinKind
  // beyond the reference's four kinds (join.rs accepts inner/outer/left/
  // right only): existence joins, the blocklist/allowlist primitives of a
  // curation pipeline — emit one side filtered by key presence/absence in
  // the other, never widening the row
  // real ADX's default join kind (the reference defaults plain `join` to
  // inner — join.rs:10-11 — and we keep that parity for the bare form;
  // the keyword is accepted explicitly): the left side is deduplicated
  // on the join keys before an inner join, so each left key contributes
  // ONE row's matches. ADX picks the surviving left row arbitrarily; we
  // pick deterministically (min under the left row's orderable columns)
  // — deviation documented in SCALE.md
  case object InnerUnique extends JoinKind
  case object LeftSemi extends JoinKind
  case object LeftAnti extends JoinKind
  case object RightSemi extends JoinKind
  case object RightAnti extends JoinKind
}

sealed trait ExpandKind
object ExpandKind { case object Bag extends ExpandKind; case object Arr extends ExpandKind }

/** One segment of a `parse` pattern: a literal to match, or a capture
  * `(name, castKind)` where castKind is "string" or a numeric cast name. */
final case class ParseSeg(literal: Option[String], capture: Option[(String, String)])

/** One level of a `top-nested` step: keep the top `n` values of `of` ranked
  * by `agg` (descending), within each combination of the previous levels'
  * keys. Ties break by the smaller key value — KQL leaves ties unspecified;
  * a total rule keeps results stable under repartitioning.
  *
  * `others`: Kusto's `with others = "label"` — the excluded keys collapse
  * into one labeled bucket per parent, re-AGGREGATED FROM RAW ROWS (so
  * non-algebraic aggregates like dcount stay exact), and deeper levels
  * nest inside the bucket like any other key. The key column widens to
  * string to carry the label. */
final case class TopNestedLevel(n: Long, of: FieldPath, agg: AggField,
    others: Option[String] = None)

sealed trait QueryStep
object QueryStep {
  final case class Scan(source: String) extends QueryStep
  /** `range name from lo to hi step s` — generated table source (KQL's
    * range operator): inclusive of `hi` when the grid lands on it. Works
    * over ints and datetimes (timespan step). */
  final case class RangeScan(
      name: String, lo: Expr, hi: Expr, step: Expr) extends QueryStep
  /** `datatable (a: long, b: string) [1, 'x', 2, 'y']` — inline literal
    * table source (KQL surface): row-major literal list, column types ∈
    * long int real string bool datetime timespan. Bounded by query text,
    * so driver-side construction is correct here. */
  final case class DataTable(
      cols: Seq[(String, String)], values: Seq[Expr]) extends QueryStep
  /** `conn.coll.raw("…")` — pass a native query to the backing engine
    * (reference: connector `raw_query`, `miso-connectors/src/lib.rs:320-327`).
    * Here the "native language" of the backing store is Spark SQL.
    */
  final case class RawScan(sql: String) extends QueryStep
  /** `evaluate sequence_detect(timeline, step_window, max_duration,
    * flag1, …, flagN, key)` — ordered event-sequence detection per key.
    * DECLARATIVE semantics (the Spark-first shape — a cascaded as-of
    * chain, not a sequential machine): every flagN event anchors a
    * candidate and binds each earlier step to its NEAREST preceding
    * occurrence (latest flag_{i} at-or-before flag_{i+1}'s time); the
    * candidate survives when every inter-step gap ≤ step_window and the
    * whole span ≤ max_duration. Overlapping sequences all report
    * (documented — Kusto's exact overlap rule is unpublished). One key
    * column (compose multi-keys with strcat — documented narrowing).
    * Output: key, one datetime column per flag, duration (micros). */
  final case class SequenceDetect(
      timeline: FieldPath, stepWindowMicros: Long, maxDurMicros: Long,
      flags: Seq[FieldPath], key: FieldPath) extends QueryStep
  /** `evaluate basket(threshold)` — frequent attribute-combination
    * segments (market-basket / Apriori family) over ALL current columns:
    * every non-empty column subset of every row is a candidate segment;
    * segments with ≥ threshold·N rows survive. Output: SegmentId, Count,
    * Percent, then the columns (null = wildcard). Columns capped at 10
    * (2^c row amplification; project first — Kusto's plugin takes the
    * same advice). Genuine null values group per-mask, so a null-valued
    * segment and its wildcard twin stay separate counts (documented). */
  final case class Basket(threshold: Double) extends QueryStep
  /** `evaluate autocluster([threshold[, ratio]])` — the basket lattice
    * with dominance pruning: a segment drops when a STRICTLY more
    * specific frequent segment explains ≥ ratio (default 0.9) of its
    * rows. Kusto's plugin algorithm is unpublished; this is our
    * documented deterministic rule for the same "small informative
    * segment set" intent. */
  final case class AutoCluster(
      threshold: Double, ratio: Double) extends QueryStep
  /** `evaluate diffpatterns(threshold, splitColumn, valueA, valueB)` —
    * segment-frequency comparison between the two row subsets selected
    * by the split column: the basket lattice is mined on each side
    * (threshold against that side's row count), segments full-outer
    * merge on identity, and output ranks by |PercentA − PercentB|
    * descending. The split column leaves the segment attribute set. */
  final case class DiffPatterns(
      threshold: Double, split: FieldPath,
      valueA: Expr, valueB: Expr) extends QueryStep
  /** `evaluate diffpatterns_text(threshold, textColumn, splitColumn,
    * valueA, valueB)` — the diffpatterns lattice over the text's first
    * FOUR whitespace tokens as positional attributes; output `Pattern`
    * renders wildcard and absent positions as `*`. ADX's exact
    * algorithm is unpublished, so this documented basket-lattice rule
    * is the replayable analog (the house convention — see
    * series_decompose). */
  final case class DiffPatternsText(threshold: Double, text: FieldPath,
      split: FieldPath, valueA: Expr, valueB: Expr) extends QueryStep
  /** `evaluate funnel_sequence_completion(id, ts, start, end, bin,
    * state, (s1, s2, …), (w1, w2, …))` — ADX's third funnel plugin.
    * Documented rule (the greedy chain): per id, t1 = FIRST occurrence
    * of s1 within [start, end]; t_{j+1} = first occurrence of s_{j+1}
    * strictly after t_j (windows do not steer chain construction — they
    * only gate counting). Prefix j counts in bin(t1) when
    * t_j − t1 ≤ w_j. Output: (ts bin, state, period, dcount). */
  final case class FunnelCompletion(id: FieldPath, tl: FieldPath,
      start: Long, end: Long, step: Long, state: FieldPath,
      states: Seq[String], windows: Seq[Long]) extends QueryStep
  /** `externaldata (a: long, …) ['uri', …] with(format='csv', …)` —
    * ad-hoc file source with a declared schema (Kusto's operator; URIs
    * here are local/cluster-visible paths — no network egress). Reads
    * any path the process can see, so servers gate it with `allowRaw`
    * exactly like `raw()`. Formats: csv (ignorefirstrecord → header),
    * json (JSON-lines), parquet, txt (one string column per line). */
  final case class ExternalData(
      cols: Seq[(String, String)], uris: Seq[String],
      options: Map[String, String]) extends QueryStep
  final case class Filter(e: Expr) extends QueryStep
  /** (expr, outputName) pairs; Project keeps only these, Extend adds them. */
  final case class Project(fields: Seq[(Expr, String)]) extends QueryStep
  final case class Extend(fields: Seq[(Expr, String)]) extends QueryStep
  /** project-rename pairs (to, from) — `from` keeps its parsed structure. */
  final case class Rename(pairs: Seq[(String, FieldPath)]) extends QueryStep
  /** project-away: drop the listed columns, keep everything else (KQL
    * sugar — not in the reference; complement-of-project semantics). */
  final case class ProjectAway(fields: Seq[FieldPath]) extends QueryStep
  /** project-keep: keep only the listed columns, in their original schema
    * order (KQL semantics — order comes from the table, not the list). */
  final case class ProjectKeep(fields: Seq[FieldPath]) extends QueryStep
  /** `mv-expand [kind=bag|array] [with_itemindex=Col] f1, f2 …`.
    * `with_itemindex` adds the 0-based element index per expanded row
    * (null for rows that pass through unexpanded — no element, no index). */
  final case class Expand(fields: Seq[FieldPath], kind: ExpandKind,
      itemIndex: Option[String] = None,
      casts: Seq[Option[String]] = Nil,
      limit: Option[Long] = None) extends QueryStep
  /** `mv-apply x = arr on ( <steps> )` — run a subpipeline over each ROW's
    * expanded array elements (KQL's per-row subquery). Supported inner
    * steps: `where`, `extend`, `summarize` (no `by` — the implicit group
    * is the source row), and `sort by … | take N` (per-row top-k).
    * Without a summarize the output is one row per surviving element
    * (original columns + element + extensions); with one it is one row
    * per source row (original columns + aggregates). Rows whose array is
    * null/empty produce nothing, like mv-apply. */
  final case class MvApply(
      name: String, src: FieldPath, sub: Seq[QueryStep],
      castKind: Option[String] = None,
      // additional `name = arr [to typeof(T)]` specs (ADX's multi-column
      // mv-apply): elements zip positionally, shorter arrays pad null —
      // the mv-expand multi-field rule
      extraSpecs: Seq[(String, FieldPath, Option[String])] = Nil)
      extends QueryStep
  final case class Limit(n: Long) extends QueryStep
  /** `top-nested N1 of k1 by agg1, top-nested N2 of k2 by agg2, …` —
    * hierarchical top-k (real-KQL surface beyond the reference): level 1
    * keeps the top N1 `k1` groups by `agg1`; level 2 aggregates within
    * those and keeps the top N2 `k2` per surviving `k1`; and so on.
    * Output columns: k1, agg1, k2, agg2, … one row per deepest-level
    * survivor. */
  final case class TopNested(levels: Seq[TopNestedLevel]) extends QueryStep
  final case class Sort(keys: Seq[SortKey]) extends QueryStep
  final case class TopN(keys: Seq[SortKey], n: Long) extends QueryStep
  final case class Summarize(aggs: Seq[AggField], by: Seq[ByField]) extends QueryStep
  final case class Distinct(fields: Seq[FieldPath]) extends QueryStep
  /** `union [withsource=Col] [isfuzzy=true] (subquery)` — bag union;
    * `withsource` adds a column naming the scan each row came from (KQL
    * surface; the name of a raw scan is "raw", of a range source
    * "range"). `isfuzzy` tolerates an unresolvable branch source: the
    * branch is skipped with the left side passing through (Kusto's
    * fuzzy-union contract for partially-available tables). Multi-source
    * `union T1, T2, …` desugars at parse into nested Union steps. */
  final case class Union(
      sub: Query, withSource: Option[String] = None,
      fuzzy: Boolean = false,
      // kind=inner: the output keeps only columns COMMON to both sides
      // (Kusto's column-intersection union); default outer = bag union
      // with null fill
      inner: Boolean = false) extends QueryStep
  /** Equi join on one or more key pairs. The reference allows exactly one
    * (`parser.rs:1122-1163`); multi-key conditions (`on $left.a ==
    * $right.a, $left.b == $right.b`) are real-KQL surface beyond it. A
    * row with a null/missing value in ANY key drops from both sides, the
    * one-key rule applied conjunctively — EXCEPT under `lookup` sugar,
    * where null-key left rows survive unmatched and the right key columns
    * are dropped from the output (KQL lookup semantics). */
  final case class Join(
      kind: JoinKind, sub: Query,
      keys: Seq[(FieldPath, FieldPath)],
      lookup: Boolean = false,
      /** `hint.strategy=broadcast|shuffle` — the user's physical-join
        * choice, honored via Spark join hints (broadcast / shuffle_hash).
        * Other Kusto hints (`hint.num_partitions`, `hint.shufflekey`) are
        * accepted and ignored: Spark's shuffle partitioning and AQE skew
        * handling supersede manual partition counts. */
      strategy: Option[String] = None) extends QueryStep
  case object CountStep extends QueryStep
  /** `getschema` — one row per column: (ColumnName, ColumnOrdinal,
    * DataType, ColumnType), KQL's schema-introspection step. Computed from
    * the compile-time schema; never touches data. */
  case object GetSchema extends QueryStep
  /** `consume [decodeblocks=true]` — execute and swallow: the result is a
    * single stats row {Count: n} (Kusto emits an empty result and side
    * stats; a visible count row is our documented shape — a lazy engine
    * must force SOMETHING for consume to mean anything). */
  case object Consume extends QueryStep
  /** `write sink` — terminal: consume the stream into a sink, emit nothing
    * (reference: `miso-workflow/src/write.rs:19-105`). */
  final case class Write(target: String) extends QueryStep
  /** `tee sink` — write to a sink AND pass rows downstream
    * (reference: `miso-workflow/src/tee.rs:20-104`). */
  final case class Tee(target: String) extends QueryStep
  /** `search [kind=case_sensitive] "term"` — free-text filter across every
    * string column (KQL's log-exploration staple; beyond the reference's
    * step set). Case-insensitive substring by default.
    */
  final case class Search(term: String, caseSensitive: Boolean) extends QueryStep
  /** `parse src with "lit" name1 "lit2" name2:long …` — pattern-split
    * extraction into typed columns (KQL's structured-log extractor;
    * beyond the reference's step set). Non-matching rows keep null
    * captures (`strict=false`) or are DROPPED (`strict=true` —
    * `parse-where`); the pattern finds its first occurrence anywhere in
    * the source (unanchored), captures are non-greedy except the last.
    */
  /** `kind`: "simple" quotes literal segments; "regex" treats them as raw
    * regex fragments (with optional `flags=` i/m/s/U prepended as an
    * inline group); "relaxed" behaves like simple — our simple mode
    * already nulls just the failing typed capture rather than the whole
    * match, which IS Kusto's relaxed rule (documented deviation: Kusto's
    * strict-simple fails the whole pattern on a cast miss). */
  final case class Parse(
      src: FieldPath, segs: Seq[ParseSeg], strict: Boolean = false,
      kind: String = "simple", flags: String = "") extends QueryStep
  /** `evaluate pivot(col, agg(...), v1, v2, …)` — rotate the values of
    * `col` into one aggregated output column per listed value, grouped by
    * every other column (KQL pivot plugin semantics). Values are required
    * literals: the output schema stays static, so no extra distinct scan
    * runs and plans stay cacheable. */
  final case class Pivot(
      col: FieldPath, agg: AggField, values: Seq[Expr]) extends QueryStep
  /** `serialize` — KQL's order-freeze marker. Order here only ever comes
    * from an explicit sort, so this is a validated no-op: legal (and
    * inert) on an already-serialized prefix, rejected otherwise to keep
    * the window-function contract explicit. */
  case object Serialize extends QueryStep
  /** `top-hitters N of col [by sumCol]` — most frequent values of `col`
    * (or highest sum of `sumCol` per value). Kusto surface (beyond the
    * reference's step set); Kusto computes it approximately, this engine
    * exactly (partial-agg + TakeOrderedAndProject — see the compiler note
    * on the sketch upgrade path). Ties break by value ascending so the
    * result is deterministic; output columns follow Kusto's naming
    * (`col`, `approximate_count_col` / `approximate_sum_sumCol`). */
  final case class TopHitters(
      n: Long, of: FieldPath, by: Option[FieldPath]) extends QueryStep
  /** `sample-distinct N of col` — N distinct values of `col`. Kusto's is
    * arbitrary/nondeterministic; this engine picks the N values with the
    * smallest `xxhash64(value)` (ties by value) so the sample is
    * REPRODUCIBLE across runs, partitionings, and engines — the same
    * philosophy as [[graft.functions.Sampling]], and hash-uniform so it
    * is still a fair sample of the distinct set. */
  final case class SampleDistinct(n: Long, of: FieldPath) extends QueryStep
  /** `sample N` — N rows. Kusto's pick is arbitrary/nondeterministic;
    * this engine keeps the N rows with the smallest `xxhash64` of the
    * full row (ties by the hash are identical rows, so the output
    * multiset is deterministic) — reproducible across runs,
    * partitionings, and engines, same philosophy as [[SampleDistinct]]. */
  final case class Sample(n: Long) extends QueryStep
  /** `project-reorder spec [asc|desc], …` — move the matched columns to
    * the front in spec order; wildcards (`prefix*`) expand in schema
    * order, or sorted by name when `asc`/`desc` is given. Unmatched
    * columns keep their relative order after the matched ones (Kusto's
    * rule). */
  final case class Reorder(specs: Seq[(String, Option[Boolean])])
      extends QueryStep
  /** `parse-kv expr as (key: type, …) with (pair_delimiter=…,
    * kv_delimiter=…[, quote=…])` — extract the named keys from a
    * delimited key=value string into typed columns. A missing key or a
    * failed typed parse yields null (the missing≡null model). The
    * first occurrence of a key wins (str_to_map keeps the LAST in Spark,
    * so the compile dedups via the map-from-entries path). Quoted values
    * have the quote stripped. */
  final case class ParseKv(src: Expr, keys: Seq[(String, String)],
      pairDelim: String, kvDelim: String, quote: Option[String])
      extends QueryStep
  /** `fork [name =] (steps…) [name =] (steps…)` — Kusto runs each
    * branch's steps against the shared parent and returns one table per
    * branch; the single-table contract STACKS them instead: bag union by
    * name (missing columns null-filled) with a `fork_table` provenance
    * column carrying the branch name (`fork_N` when unnamed) — the same
    * re-expression as [[Facet]]. Branches share the compiled parent plan
    * subtree, so the source scans once per branch at most and Spark's
    * exchange/subquery reuse collapses the common prefix. */
  final case class Fork(branches: Seq[(String, Seq[QueryStep])])
      extends QueryStep
  /** `facet by c1, c2, …` — per-column value distributions. Kusto
    * returns one table per column; this engine's single-table contract
    * STACKS them instead: `(facet_column, value, count_)` rows, one
    * group per (column, distinct value) — same information, one result.
    * Kusto's `with (subquery)` rest-table clause is rejected with a
    * pointer at running the subquery separately. */
  final case class Facet(cols: Seq[FieldPath]) extends QueryStep
  /** `reduce by col [with (…)]` — cluster strings by pattern. Kusto's
    * clustering heuristic is unspecified; this engine derives the
    * pattern DETERMINISTICALLY by collapsing every maximal run of
    * digits to `*`, then summarizes `Count = count()`,
    * `Representative = min(value)` per pattern — the same output shape
    * with a documented, engine-replayable rule. `with (threshold=…,
    * characters=…)` options are accepted and ignored. */
  final case class ReduceBy(f: Expr) extends QueryStep
  /** `evaluate bag_unpack(col [, 'prefix'])` — expand a dynamic property
    * bag (variant) column into one top-level column per key, dropping the
    * bag column; other columns pass through. The merged key/type schema
    * comes from one `schema_of_variant_agg` pass (a scalar aggregate —
    * the only driver-visible result is the schema string, never rows).
    * Unpacked columns are appended in alphabetical key order (Kusto
    * leaves the order unspecified). */
  final case class BagUnpack(
      col: FieldPath, prefix: Option[String]) extends QueryStep
  /** `print [name =] expr [, …]` — single-row scalar source (Kusto's
    * calculator statement). Unnamed columns get Kusto's `print_N`
    * positional names. Compiles to a 1-row relation; expressions may not
    * reference columns (there are none). */
  final case class Print(cols: Seq[(Option[String], Expr)]) extends QueryStep
  /** `partition by Col ( step | step … )` — run the sub-pipeline over each
    * distinct value of `Col` independently and union the per-key results.
    * Kusto materializes/spreads subtables per key; here every per-key step
    * lowers to a key-partitioned window or aggregate over ONE hash shuffle
    * on the key, so the whole operator distributes across executors — in
    * particular the serialized window scalars (`row_number`/`prev`/`next`/
    * `row_cumsum`), which outside a partition require a single total
    * order. `hint.strategy=…` is accepted and ignored (the lowering is
    * always the distributed shuffle shape; Kusto's native/legacy
    * 64-partition limits don't apply). */
  final case class Partition(by: FieldPath, sub: Seq[QueryStep]) extends QueryStep
  /** `make-series [name =] agg [default = lit] [, …] on axis
    * [from lo to hi] step dt [by keys]` — fixed-step gap-filled series:
    * one row per group, the axis projected as an array of bin starts
    * (anchored at `from`, Kusto's bin_at semantics) and each aggregate as
    * an equally-shaped array with missing bins filled by its default
    * (default default 0, Kusto's). Omitted bounds derive from the data's
    * GLOBAL axis [min, max] (Kusto's make-series range default). */
  final case class MakeSeries(
      aggs: Seq[(AggField, Expr)], axis: FieldPath,
      lo: Option[Expr], hi: Option[Expr], step: Expr,
      by: Seq[ByField]) extends QueryStep
  /** One declared scan variable (`declare (name: long = 0)`);
    * typ ∈ long | real, default is a numeric literal. */
  final case class ScanVar(name: String, typ: String, default: Double)
  /** One per-step assignment (`=> v = v + e`). op ∈ set|add|sub|mul|
    * min|max; `expr` is variable-free (parser-enforced — the supported
    * assignment grammar is `v = e`, `v = v ± e`, `v = v * e`,
    * `v = min_of(v, e)`, `v = max_of(v, e)` with var-free e, which
    * covers the cumulative-sum/count/extrema uses scan variables exist
    * for; a fully general RHS would need a per-row expression
    * interpreter the engine deliberately doesn't have). */
  final case class ScanAssign(varName: String, op: String, expr: Expr)
  /** `scan [with_match_id=m] [declare (v: long = 0, …)]
    * with (step s1: cond [=> v = v + e, …]; …)` — ordered sequence
    * matching (Kusto's scan, restricted single-active-match semantics,
    * precisely defined in the compiler scaladoc): rows advance a step
    * machine in serialized order, matched rows are emitted with a
    * `step` column and a 1-based match id. Declared variables live PER
    * SEQUENCE INSTANCE (reset to defaults when a new sequence starts,
    * ADX's rule); step conditions stay variable-free (narrowing). */
  final case class ScanMatch(
      matchIdCol: Option[String],
      steps: Seq[(String, Expr)],
      declares: Seq[ScanVar] = Nil,
      assigns: Seq[Seq[ScanAssign]] = Nil) extends QueryStep
  /** `invoke f(args…)` — a TABULAR function let applied to the pipeline:
    * `let f = (T: table, x: long) { T | where v > x };` declares it, and
    * the parser splices the body's steps (table param dropped, scalar
    * params substituted) at the invoke site. `name` is kept for the
    * explain renderer only — the compiler folds `steps` like any inline
    * prefix. */
  final case class Invoke(name: String, steps: Seq[QueryStep]) extends QueryStep
  /** `render timechart [with (…)]` — a client-side visualization
    * directive, accepted and ignored (rows pass through untouched) so
    * dashboard-tail queries run as-is. The kind is kept for explain. */
  final case class RenderHint(kind: String) extends QueryStep
  /** `evaluate narrow()` — transposes each row into (Row, Column, Value)
    * triples, every value rendered as a string: the interactive
    * wide-row-exploration plugin. Requires a serialized input (the Row
    * index needs a total order), like the window scalars. */
  case object Narrow extends QueryStep
  /** Kusto `find in (T1, T2, …) where pred [project …]` — cross-table
    * predicate search: tables union by name (a column missing from one
    * table reads as null there, Kusto's rule), `source_` tags the origin.
    * Output = `source_` + the columns the predicate references in
    * first-reference order, or the explicit project list. Documented
    * deviation: no `pack_` remainder column. */
  final case class Find(tables: Seq[String], pred: Expr,
      project: Seq[(Expr, String)]) extends QueryStep
  /** Kusto `as name` — binds the pipeline prefix to `name` for later
    * reference in the same query (join/union subqueries); rows pass
    * through unchanged. */
  final case class AsBind(name: String) extends QueryStep

  /** Kusto `evaluate activity_engagement(id, ts, inner, outer)` — sliding
    * DAU/MAU-style engagement: per inner-aligned bin t, the distinct ids
    * active in (t, t+inner] over the distinct ids active in the outer
    * window of the last outer/inner bins, as `activity_ratio`. Bins with
    * no activity anywhere in their outer window are absent (documented).
    */
  final case class ActivityEngagement(id: FieldPath, ts: FieldPath,
      innerMicros: Long, outerMicros: Long) extends QueryStep
  /** Kusto `evaluate sliding_window_counts(id, ts, start, end, lookback,
    * bin)` — per bin in [start, end]: row count + distinct-id count over
    * the lookback window ending at that bin.
    */
  final case class SlidingWindowCounts(id: FieldPath, ts: FieldPath,
      startMicros: Long, endMicros: Long, lookbackMicros: Long,
      binMicros: Long) extends QueryStep
  /** Kusto `evaluate session_count(id, ts, start, end, bin, lookback)` —
    * per bin: the count of active sessions, where an id's session is
    * active in a bin iff the id appears within the lookback window
    * ending at that bin (the ADX definition — a sliding distinct count).
    */
  final case class SessionCount(id: FieldPath, ts: FieldPath,
      startMicros: Long, endMicros: Long, binMicros: Long,
      lookbackMicros: Long) extends QueryStep
  /** Kusto `evaluate activity_counts_metrics(id, ts, start, end, step)` —
    * per step bin: activity count, distinct ids, distinct NEW ids (first
    * appearance within [start,end] falls in this bin), and the cumulative
    * distinct count through this bin (= running sum of new ids).
    */
  final case class ActivityCountsMetrics(id: FieldPath, ts: FieldPath,
      startMicros: Long, endMicros: Long, stepMicros: Long) extends QueryStep

  /** Kusto `evaluate dcount_intersect(hll1, hll2[, …])` — estimates the
    * cardinality of the cumulative intersections of the sketched sets via
    * inclusion-exclusion over sketch unions: output `s0..s{k-1}` replace
    * the sketch columns (s_i = |set0 ∩ … ∩ set_i|). Up to 4 sketches
    * (2^k union terms).
    */
  final case class DcountIntersect(cols: Seq[FieldPath]) extends QueryStep

  /** Kusto `evaluate activity_metrics(id, ts, start, end, step)` — per
    * step bin: distinct ids, distinct new ids, retention rate (ids also
    * active in the previous bin / previous bin's distinct count) and
    * churn rate (previous ids NOT active now / previous count); a bin
    * with no previous activity reports rate 0.
    */
  final case class ActivityMetrics(id: FieldPath, ts: FieldPath,
      startMicros: Long, endMicros: Long, stepMicros: Long) extends QueryStep

  /** Kusto `evaluate funnel_sequence(id, ts, start, end, maxStepWindow,
    * step, stateCol, s1, s2, …)` — restructured to ONE table (the fork/
    * facet precedent; ADX returns three): rows are
    * `(kind, ts, state, dcount)` where kind `count` gives per-step-bin
    * distinct ids whose EARLIEST sequence match starts in the bin, and
    * kinds `prev`/`next` give distinct-id counts of the state
    * immediately before the first / after the last step of that earliest
    * match (ties at one timestamp resolve to the lexicographically
    * largest state — documented). Matching is the sequence_detect
    * contract: nearest preceding steps, ≤ maxStepWindow between
    * consecutive steps.
    */
  final case class FunnelSequence(id: FieldPath, ts: FieldPath,
      startMicros: Long, endMicros: Long, maxWinMicros: Long,
      stepMicros: Long, state: FieldPath, states: Seq[String])
      extends QueryStep

  /** Kusto `evaluate new_activity_metrics(id, ts, start, end, step)` —
    * the cohort retention matrix: for each cohort (ids first seen in bin
    * c) and each activity bin t ≥ c, the distinct ids of cohort c active
    * in t, the cohort size, and their ratio. Bins with no activity from
    * the cohort are absent (documented).
    */
  final case class NewActivityMetrics(id: FieldPath, ts: FieldPath,
      startMicros: Long, endMicros: Long, stepMicros: Long) extends QueryStep

  /** Kusto `evaluate rolling_percentile(value, p, index, binSize,
    * window[, dims…])` — per index bin and dims: the EXACT rank-rule
    * percentile (q(p) = sorted[ceil(p·n/100)], the series_outliers rule)
    * of the values in the rolling window of the last `window` bins.
    * Exact by collect (oracle-replayable); swap percentile_approx for
    * the sketch path at corpus scale.
    */
  final case class RollingPercentile(value: FieldPath, p: Double,
      index: FieldPath, binMicros: Long, window: Int,
      dims: Seq[FieldPath]) extends QueryStep

  /** Kusto `evaluate rows_near(cond, before[, after])` — serialized
    * context rows: keeps rows within `before` rows before or `after`
    * rows after any row satisfying the condition.
    */
  final case class RowsNear(cond: Expr, before: Long, after: Long)
      extends QueryStep

  /** Kusto `evaluate ipv4_lookup(LookupTable, srcCol, netCol
    * [, return_unmatched])` — joins each row to the lookup rows whose
    * IPv4 network (CIDR or plain address) contains the source IP; on
    * multiple matches only the longest prefix survives (ties keep all).
    * Documented narrowing: no extra equi-keys. Lookup columns must not
    * collide with the input's.
    */
  final case class Ipv4Lookup(table: String, src: FieldPath, net: FieldPath,
      returnUnmatched: Boolean) extends QueryStep

  /** A graph-match pattern node: `(a)` / `()` (anonymous). */
  final case class GraphNode(name: Option[String])
  /** A graph-match pattern edge: `-[e]->` (dir 1), `<-[e]-` (dir -1),
    * `-[e]-` (dir 0 = either), `-->`/`<--`/`--` anonymous shorthands;
    * `-[e*1..3]->` variable length (minHops..maxHops).
    */
  final case class GraphEdge(
      name: Option[String], direction: Int, minHops: Int, maxHops: Int)
  /** Kusto `make-graph src --> dst [with NodesTable on id]` — turns the
    * pipeline (an edge list) into a graph context for a following
    * `graph-match`. Identical parallel edges collapse to one (they are
    * indistinguishable; gives the uniqueness constraint a replayable
    * row identity). Without `with`, nodes are the distinct endpoints
    * exposed as the single property `id` (ref has no graph surface —
    * this is the real-KQL step a miso user would miss next).
    */
  final case class MakeGraph(src: FieldPath, dst: FieldPath,
      nodes: Option[(String, FieldPath)]) extends QueryStep
  /** Kusto `graph-match [cycles=...] (a)-[e]->(b) [where pred]
    * project …` — pattern matching over the make-graph context. Each hop
    * compiles to one shuffle equi-join on node ids (the Spark-native
    * plan; bounded pattern length, never transitive closure).
    */
  final case class GraphMatch(cycles: String, nodes: Seq[GraphNode],
      edges: Seq[GraphEdge], where: Option[Expr],
      project: Seq[(Expr, String)]) extends QueryStep
  /** Kusto `graph-shortest-paths [output=any|all] (a)-[e*1..k]->(b)
    * [where pred] project …` — shortest (by hop count) paths between
    * endpoint pairs among the paths satisfying the constraints.
    * output=all keeps every minimal-length path per (a, b) pair; any
    * (the ADX default) keeps one, picked deterministically.
    */
  final case class GraphShortestPaths(output: String, nodes: Seq[GraphNode],
      edge: GraphEdge, where: Option[Expr],
      project: Seq[(Expr, String)]) extends QueryStep
  /** Kusto `graph-to-table nodes [with_node_id=n]` /
    * `graph-to-table edges [with_source_id=s] [with_target_id=t]` —
    * exports the graph context back to tabular form. */
  final case class GraphToTable(what: String, nodeId: Option[String],
      sourceId: Option[String], targetId: Option[String]) extends QueryStep
  /** Kusto `graph-mark-components [kind=weak|strong]
    * [with_component_id=name]` — connected components over the graph
    * context; the node table gains the component column (the component's
    * MIN node id — a deterministic representative where ADX's is
    * arbitrary) and the graph context stays set for a following graph
    * operator. kind=strong computes strongly connected components
    * (forward/backward class refinement, round 9).
    */
  final case class GraphMarkComponents(componentCol: String,
      strong: Boolean = false) extends QueryStep
}

/** A parsed pipe query: first step is a Scan (or a let-reference). */
final case class Query(steps: Seq[QueryStep])

/** A full parse result: let-bindings (macro-expanded at compile) + main query. */
final case class Parsed(
    lets: Map[String, Query], query: Query,
    materialized: Set[String] = Set.empty)
