package graft.kql

/** KQL-style pretty-printer for expressions — used by the explain surface so
  * plans read like the query language, not like AST case classes (the
  * reference's `miso-workflow/src/display.rs` analog).
  */
object Render {
  import Expr._

  def expr(e: Expr): String = e match {
    case TupleGet(inner, i) => s"${expr(inner)}[tuple $i]"
    case IntLit(v) => v.toString
    case FloatLit(v) => v.toString
    case BoolLit(v) => v.toString
    case StrLit(v) => "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case NullLit => "null"
    case TimespanLit(m) => renderTimespan(m)
    case DatetimeLit(m) =>
      "datetime(" + java.time.Instant.ofEpochSecond(m / 1000000L, (m % 1000000L) * 1000L) + ")"
    case Field(p) => p.render
    case LetRef(p, _) => p.render
    case And(l, r) => s"${paren(l)} and ${paren(r)}"
    case Or(l, r) => s"${paren(l)} or ${paren(r)}"
    case Not(x) => s"not(${expr(x)})"
    case Cmp(op, l, r) => s"${paren(l)} $op ${paren(r)}"
    case Arith(op, l, r) => s"${paren(l)} $op ${paren(r)}"
    case Neg(x) => s"-${paren(x)}"
    case In(x, items, neg) =>
      s"${paren(x)} ${if (neg) "!in" else "in"} (${items.map(expr).mkString(", ")})"
    case Between(x, lo, hi, neg) =>
      s"${paren(x)} ${if (neg) "!between" else "between"} (${expr(lo)} .. ${expr(hi)})"
    case StrOp(op, l, r, neg) =>
      val word = op match {
        case "matches_regex" => "matches regex"
        case "=~" => if (neg) "!~" else "=~"
        case o => o
      }
      val shown = if (neg && op != "=~") "!" + word else word
      s"${paren(l)} $shown ${paren(r)}"
    case Case(branches, default) =>
      "case(" + branches.map { case (c, v) => s"${expr(c)}, ${expr(v)}" }
        .mkString(", ") + s", ${expr(default)})"
    case Extract(re, g, src) => s"""extract("$re", $g, ${expr(src)})"""
    case Bin(x, w) => s"bin(${expr(x)}, ${expr(w)})"
    case Cast(kind, x) => s"$kind(${expr(x)})"
    case Exists(x) => s"exists(${expr(x)})"
    case StrCat(args) => s"strcat(${args.map(expr).mkString(", ")})"
    case TextFn(name, x) => s"$name(${expr(x)})"
    case StrFn(name, args) => s"$name(${args.map(expr).mkString(", ")})"
    case DtFn(name, x) => s"$name(${expr(x)})"
    case DtDiff(p, a, b) => s"datetime_diff('$p', ${expr(a)}, ${expr(b)})"
    case DtAdd(p, n, t) => s"datetime_add('$p', ${expr(n)}, ${expr(t)})"
    case ToScalar(_) => "toscalar(<subquery>)"
    case NullFn(name, args) => s"$name(${args.map(expr).mkString(", ")})"
    case MathFn(name, args) => s"$name(${args.map(expr).mkString(", ")})"
    case ArrFn(name, args) => s"$name(${args.map(expr).mkString(", ")})"
    case WinFn(name, args) => s"$name(${args.map(expr).mkString(", ")})"
    case BinAt(x, w, a) => s"bin_at(${expr(x)}, ${expr(w)}, ${expr(a)})"
    case ColumnIfExists(n, d) => s"column_ifexists($n, ${expr(d)})"
  }

  private def paren(e: Expr): String = e match {
    case And(_, _) | Or(_, _) | Cmp(_, _, _) | Arith(_, _, _) |
         In(_, _, _) | Between(_, _, _, _) | StrOp(_, _, _, _) => s"(${expr(e)})"
    case _ => expr(e)
  }

  def renderTimespan(micros: Long): String = {
    val units = Seq(
      86400000000L -> "d", 3600000000L -> "h", 60000000L -> "m",
      1000000L -> "s", 1000L -> "ms", 1L -> "us")
    units.find { case (u, _) => micros != 0 && micros % u == 0 }
      .map { case (u, s) => s"${micros / u}$s" }
      .getOrElse(s"${micros}us")
  }

  def sortKey(k: SortKey): String = {
    val ord = k.order match { case SortOrder.Asc => "asc"; case SortOrder.Desc => "desc" }
    val n = k.nulls match { case NullsOrder.First => " nulls first"; case NullsOrder.Last => "" }
    s"${k.expr.map(expr).getOrElse(k.field.render)} $ord$n"
  }

  def agg(a: Aggregation): String = a match {
    case Aggregation.Count => "count()"
    case Aggregation.Countif(e) => s"countif(${expr(e)})"
    case Aggregation.DCount(f) => s"dcount(${f.render})"
    case Aggregation.DCountApprox(f) => s"dcount_approx(${f.render})"
    case Aggregation.Sum(f) => s"sum(${f.render})"
    case Aggregation.Avg(f) => s"avg(${f.render})"
    case Aggregation.Min(f) => s"min(${f.render})"
    case Aggregation.Max(f) => s"max(${f.render})"
    case Aggregation.Percentile(f, p) =>
      val ps = if (p == p.floor) p.toLong.toString else p.toString
      s"percentile(${f.render}, $ps)"
    case Aggregation.MakeList(f) => s"make_list(${f.render})"
    case Aggregation.MakeSet(f) => s"make_set(${f.render})"
    case Aggregation.MakeListIf(f, p) =>
      s"make_list_if(${f.render}, ${expr(p)})"
    case Aggregation.MakeSetIf(f, p) =>
      s"make_set_if(${f.render}, ${expr(p)})"
    case Aggregation.MakeListNulls(f) =>
      s"make_list_with_nulls(${f.render})"
    case Aggregation.ArgMax(f, r) => s"arg_max(${f.render}, ${r.render})"
    case Aggregation.ArgMin(f, r) => s"arg_min(${f.render}, ${r.render})"
    case Aggregation.MakeBag(f, None) => s"make_bag(${f.render})"
    case Aggregation.MakeBag(f, Some(p)) =>
      s"make_bag_if(${f.render}, ${expr(p)})"
    case Aggregation.ArgExtremeRows(isMax, f, rets) =>
      val fn = if (isMax) "arg_max" else "arg_min"
      val rs = if (rets.isEmpty) "*" else rets.map(_.render).mkString(", ")
      s"$fn(${f.render}, $rs)"
    case Aggregation.Stdev(f) => s"stdev(${f.render})"
    case Aggregation.Variance(f) => s"variance(${f.render})"
    case Aggregation.TDigestA(f) => s"tdigest(${f.render})"
    case Aggregation.TDigestMerge(f) => s"merge_tdigest(${f.render})"
    case Aggregation.TopKApprox(f, k) => s"topk_approx(${f.render}, $k)"
    case Aggregation.TopKAccum(f) => s"topk_accum(${f.render})"
    case Aggregation.TopKMerge(f) => s"merge_topk(${f.render})"
    case Aggregation.StdevP(f) => s"stdevp(${f.render})"
    case Aggregation.VarianceP(f) => s"variancep(${f.render})"
    case Aggregation.Covariance(pop, a, b) =>
      s"covariance${if (pop) "p" else ""}(${a.render}, ${b.render})"
    case Aggregation.Correlation(a, b) =>
      s"correlation(${a.render}, ${b.render})"
    case Aggregation.AggIf(k, f, p) => s"$k(${f.render}, ${expr(p)})"
    case Aggregation.TakeAny(f) => s"take_any(${f.render})"
    case Aggregation.BinaryAll(op, f) => s"binary_all_$op(${f.render})"
    case Aggregation.Hll(f) => s"hll(${f.render})"
    case Aggregation.HllMerge(f) => s"hll_merge(${f.render})"
    case Aggregation.Percentiles(f, ps) =>
      s"percentiles(${f.render}, ${ps.map(p =>
        if (p == p.floor) p.toLong.toString else p.toString).mkString(", ")})"
    case Aggregation.BuildSchema(f) => s"buildschema(${f.render})"
    case Aggregation.PercentilesArray(f, ps) =>
      s"percentiles_array(${f.render}, ${ps.map(p =>
        if (p == p.floor) p.toLong.toString else p.toString).mkString(", ")})"
    case Aggregation.PercentileW(f, w, p) =>
      val ps = if (p == p.floor) p.toLong.toString else p.toString
      s"percentilew(${f.render}, ${w.render}, $ps)"
  }
}
