package graft.kql

import Token._
import Expr._

/** Recursive-descent KQL parser (analog of `miso-kql/src/parser.rs`, written
  * fresh). `now()` is bound once at construction, matching the reference's
  * parse-time binding (`parser.rs:368-372`).
  */
final class Parser(src: String, nowMicros: Long) {
  private val toks: Vector[Token] = Lexer.lex(src)
  private var p = 0
  // diagnostics recovered past (reference parser.rs:39-72 collects multiple
  // labelled errors instead of stopping at the first)
  private val errors = Seq.newBuilder[ParseError]
  private var nErrors = 0

  // clamp to the trailing Eof: error recovery may resync after a helper
  // consumed the Eof token itself
  private def peek: Token = toks(math.min(p, toks.length - 1))
  private def next(): Token = { val t = peek; p += 1; t }
  private def fail(msg: String): Nothing = throw KqlParseException(msg, peek.pos)
  private def fail(msg: String, expected: Seq[String]): Nothing =
    throw KqlParseException(msg, peek.pos,
      Seq(toError(KqlParseException(msg, peek.pos)).copy(expected = expected)))

  private def lineCol(pos: Int): (Int, Int) = {
    val upto = src.substring(0, math.min(math.max(pos, 0), src.length))
    (upto.count(_ == '\n') + 1, pos - upto.lastIndexOf('\n'))
  }

  private def toError(e: KqlParseException): ParseError =
    e.errors.headOption.getOrElse {
      val (l, c) = lineCol(e.pos)
      ParseError(e.msg, e.pos, l, c)
    }

  private def record(e: KqlParseException): Unit = { errors += toError(e); nErrors += 1 }

  /** Scalar `let` bindings (`let x = 5;`). Bare references compile to a
    * deferred [[Expr.LetRef]] (column-over-let precedence is decided
    * against the schema at compile time); query lets live in
    * [[Parsed.lets]] instead. */
  private var scalarLets = Map.empty[String, Expr]

  /** Function `let` bindings (`let f = (a: long) { a * 2 };`) — scalar
    * lambdas, expanded at each call site by RE-PARSING the body's token
    * range with [[paramEnv]] bound to the (already-parsed) argument
    * expressions. Params therefore shadow columns and lets (innermost
    * scope, Kusto's rule), with no tree-rewrite machinery. Value =
    * (param names, body token start, body token end). Scalar-valued only;
    * tabular parameters are out of scope (views/lets cover that shape). */
  private var funcLets = Map.empty[String, (Seq[String], Int, Int)]

  /** TABULAR function lets (`let f = (T: table, x: long) { T | … };`) —
    * the first param is the input table; the body is a PIPELINE headed by
    * a scan of that param. `invoke f(args)` re-parses the body range with
    * the scalar params bound and splices the steps after the current
    * pipeline. Value = (table param, scalar params, body start, body end). */
  private var funcTabLets = Map.empty[String, (String, Seq[String], Int, Int)]

  /** In-scope function-let parameters during a body (re-)parse: a simple
    * reference to a param name resolves to the bound expression directly. */
  private var paramEnv = Map.empty[String, Expr]

  /** Expansion-depth guard: mutually/self-recursive function lets would
    * re-parse forever; Kusto rejects recursive functions too. */
  private var funcDepth = 0

  /** Unwrap a literal-bound [[Expr.LetRef]] to its literal. Used in
    * literal-required positions — function arguments (widths, offsets,
    * delimiters, regex/extract patterns) and has/matches phrases — where a
    * column reference could never be legal, so the let is unambiguous. */
  private def delit(e: Expr): Expr = e match {
    case LetRef(_, b @ (IntLit(_) | FloatLit(_) | StrLit(_) | BoolLit(_) |
                        TimespanLit(_) | DatetimeLit(_) | NullLit)) => b
    case LetRef(_, Neg(b @ (IntLit(_) | FloatLit(_)))) => Neg(b)
    case x => x
  }

  private def isIdent(t: Token, s: String): Boolean = t match {
    case Ident(w, _) => w.equalsIgnoreCase(s)
    case _ => false
  }
  private def atIdent(s: String): Boolean = isIdent(peek, s)
  private def eatIdent(s: String): Unit =
    if (atIdent(s)) p += 1 else fail(s"expected '$s'", Seq(s))
  private def atPunct(s: String): Boolean = peek match {
    case Punct(w, _) => w == s
    case _ => false
  }
  private def eatPunct(s: String): Unit =
    if (atPunct(s)) p += 1 else fail(s"expected '$s'", Seq(s))
  private def tryPunct(s: String): Boolean =
    if (atPunct(s)) { p += 1; true } else false
  private def tryIdent(s: String): Boolean =
    if (atIdent(s)) { p += 1; true } else false

  private def identText(): String = next() match {
    case Ident(w, _) => w
    case t => throw KqlParseException("expected identifier", t.pos)
  }

  // ───────────────────────── top level ─────────────────────────

  def parse(): Parsed = {
    var lets = Map.empty[String, Query]
    var mats = Set.empty[String]
    // `set option [= value];` client/session options (notruncation,
    // truncationmaxsize, query_timeout, …) — accepted and discarded: the
    // engine's truncation/timeout behavior is governed by Spark confs
    while (atIdent("set")) {
      p += 1
      identText()
      if (tryPunct("=")) next()
      eatPunct(";")
    }
    while (atIdent("let")) {
      p += 1
      val name = identText()
      eatPunct("=")
      // `let x = (query);` binds a subquery (reference semantics);
      // `let x = materialize(query);` additionally caches the compiled
      // subquery so N references compute it once (Kusto materialize);
      // `let x = <expr>;` binds a SCALAR, substituted at parse time
      // (real-KQL surface; write scalar lets without outer parens)
      // `let f = (a: long, …) { expr };` — a FUNCTION let: "(" followed by
      // `ident :` (or an immediate `) {`) can't be a query pipeline
      val isFuncLet = atPunct("(") && {
        (toks.lift(p + 1), toks.lift(p + 2)) match {
          case (Some(Punct(")", _)), Some(Punct("{", _))) => true
          case (Some(Ident(_, _)), Some(Punct(":", _))) => true
          case _ => false
        }
      }
      if (isFuncLet) {
        p += 1
        val params = Seq.newBuilder[(String, String)]
        if (!atPunct(")")) {
          var done = false
          while (!done) {
            val pn = identText()
            eatPunct(":")
            // scalar types are doc (arity is what's enforced); `table`
            // marks the tabular input param
            params += ((pn, identText().toLowerCase))
            done = !tryPunct(",")
          }
        }
        eatPunct(")")
        eatPunct("{")
        val ps = params.result()
        val savedEnv = paramEnv
        if (ps.headOption.exists(_._2 == "table")) {
          // TABULAR function: body is a pipeline headed by the table param
          arity(ps.count(_._2 == "table") == 1,
            "a tabular function takes exactly one table parameter")
          val scalars = ps.tail.map(_._1)
          arity(ps.tail.forall(_._2 != "table"),
            "the table parameter must come first")
          val bodyStart = p
          paramEnv = paramEnv ++ scalars.map(n =>
            n -> Expr.Field(FieldPath(Seq(FieldAccess(n)))))
          val q = try parsePipeline() finally paramEnv = savedEnv
          arity(q.steps.headOption.contains(QueryStep.Scan(ps.head._1)),
            s"a tabular function body must start from its table " +
              s"parameter '${ps.head._1}'")
          val bodyEnd = p
          eatPunct("}")
          eatPunct(";")
          funcTabLets += name -> ((ps.head._1, scalars, bodyStart, bodyEnd))
        } else {
          // scalar function: validation parse with params bound to
          // themselves; call sites re-parse this exact token range
          val names = ps.map(_._1)
          val bodyStart = p
          paramEnv = paramEnv ++ names.map(n =>
            n -> Expr.Field(FieldPath(Seq(FieldAccess(n)))))
          try parseExpr() finally paramEnv = savedEnv
          val bodyEnd = p
          eatPunct("}")
          eatPunct(";")
          funcLets += name -> ((names, bodyStart, bodyEnd))
        }
      } else if (atPunct("(")) {
        p += 1
        val q = parsePipeline()
        eatPunct(")")
        eatPunct(";")
        lets += name -> q
      } else if (atIdent("materialize")) {
        p += 1
        eatPunct("(")
        val q = parsePipeline()
        eatPunct(")")
        eatPunct(";")
        lets += name -> q
        mats += name
      } else if (atIdent("datatable") ||
          (atIdent("range") && toks.lift(p + 2).exists {
            case Ident(w, _) => w.equalsIgnoreCase("from")
            case _ => false
          })) {
        // generated sources (inline literal table / range) bind as query
        // lets without requiring the outer parens
        val q = parsePipeline()
        eatPunct(";")
        lets += name -> q
      } else {
        val e = parseExpr()
        eatPunct(";")
        scalarLets += name -> e
      }
    }
    val q = parsePipeline()
    peek match {
      case Eof(_) => ()
      case t =>
        record(KqlParseException("trailing input after query", t.pos))
    }
    val errs = errors.result()
    if (errs.nonEmpty)
      throw KqlParseException(errs.head.msg, errs.head.pos, errs)
    Parsed(lets, q, mats)
  }

  private def parsePipeline(): Query = {
    // `range name from lo to hi step s` as a generated source (only when
    // the 'from' keyword follows, so a table named `range` still scans)
    if (atIdent("range") && toks.lift(p + 2).exists {
        case Ident(w, _) => w.equalsIgnoreCase("from"); case _ => false }) {
      p += 1
      val name = identText()
      eatIdent("from"); val lo = parseExpr()
      eatIdent("to"); val hi = parseExpr()
      eatIdent("step"); val st = parseExpr()
      val steps = Seq.newBuilder[QueryStep]
      steps += QueryStep.RangeScan(name, lo, hi, st)
      parseStepTail(steps)
      return Query(steps.result())
    }
    // `datatable (a: long, b: string) [1, 'x', …]` inline literal source
    if (atIdent("datatable") && toks.lift(p + 1).exists {
        case Punct("(", _) => true; case _ => false }) {
      p += 1
      eatPunct("(")
      val cols = Seq.newBuilder[(String, String)]
      var more = true
      while (more) {
        val n = identText()
        eatPunct(":")
        val t = identText().toLowerCase match {
          case k @ ("long" | "int" | "real" | "double" | "string" | "bool" |
                    "boolean" | "datetime" | "timespan") => k
          case other => fail(s"unknown datatable column type '$other'")
        }
        cols += ((n, t))
        more = tryPunct(",")
      }
      eatPunct(")")
      eatPunct("[")
      val values = Seq.newBuilder[Expr]
      if (!atPunct("]")) {
        var vmore = true
        while (vmore) { values += parseExpr(); vmore = tryPunct(",") }
      }
      eatPunct("]")
      val colSeq = cols.result()
      val valSeq = values.result()
      arity(colSeq.nonEmpty, "datatable needs at least one column")
      arity(valSeq.length % colSeq.length == 0,
        s"datatable value count ${valSeq.length} is not a multiple of " +
          s"${colSeq.length} columns")
      val steps = Seq.newBuilder[QueryStep]
      steps += QueryStep.DataTable(colSeq, valSeq)
      parseStepTail(steps)
      return Query(steps.result())
    }
    // `externaldata (a: long, …) ['uri', …] with(format='csv', …)` ad-hoc
    // file source with declared schema (only when '(' follows, so a table
    // named externaldata still scans)
    if (atIdent("externaldata") && toks.lift(p + 1).exists {
        case Punct("(", _) => true; case _ => false }) {
      p += 1
      eatPunct("(")
      val cols = Seq.newBuilder[(String, String)]
      var more = true
      while (more) {
        val n = identText()
        eatPunct(":")
        val t = identText().toLowerCase match {
          case k @ ("long" | "int" | "real" | "double" | "string" | "bool" |
                    "boolean" | "datetime" | "timespan" | "dynamic") => k
          case other => fail(s"unknown externaldata column type '$other'")
        }
        cols += ((n, t))
        more = tryPunct(",")
      }
      eatPunct(")")
      eatPunct("[")
      val uris = Seq.newBuilder[String]
      var umore = true
      while (umore) {
        peek match {
          case StrTok(u, _) => p += 1; uris += u
          case t => fail("externaldata URIs must be string literals")
        }
        umore = tryPunct(",")
      }
      eatPunct("]")
      var opts = Map.empty[String, String]
      if (atIdent("with")) {
        p += 1
        eatPunct("(")
        var omore = true
        while (omore) {
          val k = identText().toLowerCase
          eatPunct("=")
          val v = peek match {
            case StrTok(s, _) => p += 1; s
            case Ident(w, _) => p += 1; w
            case t => fail("externaldata option value must be a literal")
          }
          opts += k -> v
          omore = tryPunct(",")
        }
        eatPunct(")")
      }
      val steps = Seq.newBuilder[QueryStep]
      steps += QueryStep.ExternalData(cols.result(), uris.result(), opts)
      parseStepTail(steps)
      return Query(steps.result())
    }
    // `union [mods] S1, S2, … | steps` as a pipeline HEAD (Kusto's
    // source-operator form): the first source becomes the head, the rest
    // fold in as union steps; withsource lands on the last union (per-row
    // provenance carries through the hidden source column), and a
    // single-source head with withsource degrades to a constant label
    if (atIdent("union") && toks.lift(p + 1).exists {
        case Punct("|", _) | _: Eof => false; case _ => true }) {
      p += 1
      val (ws, fuzzy, inner, srcs) = parseUnionParts()
      val steps = Seq.newBuilder[QueryStep]
      steps ++= srcs.head.steps
      if (srcs.length == 1) {
        ws.foreach { c =>
          val label = srcs.head.steps.headOption match {
            case Some(QueryStep.Scan(s)) => s
            case _ => "union"
          }
          steps += QueryStep.Extend(Seq((StrLit(label): Expr, c)))
        }
      } else {
        srcs.tail.zipWithIndex.foreach { case (q, i) =>
          val wsHere = if (i == srcs.length - 2) ws else None
          steps += QueryStep.Union(q, wsHere, fuzzy, inner)
        }
      }
      parseStepTail(steps)
      return Query(steps.result())
    }
    // `print [name =] expr [, …]` single-row scalar source; a table
    // actually NAMED print is still reachable (bare `print | …` or EOF
    // scans it — Kusto's print always has at least one expression)
    if (atIdent("print") && toks.lift(p + 1).exists {
        case Punct("|", _) | _: Eof => false; case _ => true }) {
      p += 1
      val cols = Seq.newBuilder[(Option[String], Expr)]
      var more = true
      while (more) {
        val alias = (peek, toks.lift(p + 1)) match {
          case (Ident(a, _), Some(Punct("=", _)))
              if !reservedWords(a.toLowerCase) => p += 2; Some(a)
          case _ => None
        }
        cols += ((alias, parseExpr()))
        more = tryPunct(",")
      }
      val steps = Seq.newBuilder[QueryStep]
      steps += QueryStep.Print(cols.result())
      parseStepTail(steps)
      return Query(steps.result())
    }
    // `find in (T1, T2) where pred [project …]` cross-table search (only
    // when 'in' follows, so a table named `find` still scans)
    if (atIdent("find") && toks.lift(p + 1).exists {
        case Ident(w, _) => w.equalsIgnoreCase("in"); case _ => false }) {
      p += 1
      eatIdent("in"); eatPunct("(")
      val tabs = Seq.newBuilder[String]
      var more = true
      while (more) { tabs += parseSourceRef(); more = tryPunct(",") }
      eatPunct(")")
      eatIdent("where")
      val pred = parseExpr()
      val proj =
        if (atIdent("project")) { p += 1; parseProjFields() }
        else Seq.empty[(Expr, String)]
      val tabSeq = tabs.result()
      arity(tabSeq.nonEmpty, "find needs at least one table")
      val steps = Seq.newBuilder[QueryStep]
      steps += QueryStep.Find(tabSeq, pred, proj)
      parseStepTail(steps)
      return Query(steps.result())
    }
    val source = parseSourceRef()
    val steps = Seq.newBuilder[QueryStep]
    // `conn.coll.raw("…")` / `raw("…")`: native (Spark SQL) pass-through
    if ((source == "raw" || source.endsWith(".raw")) && atPunct("(")) {
      p += 1
      val sql = next() match {
        case StrTok(s, _) => s
        case t => throw KqlParseException("raw() takes a string literal", t.pos)
      }
      eatPunct(")")
      steps += QueryStep.RawScan(sql)
    } else {
      steps += QueryStep.Scan(source)
    }
    parseStepTail(steps)
    Query(steps.result())
  }

  /** The `| step | step …` tail, with error recovery (reference
    * parser.rs:39-72): a step that fails to parse records its diagnostic
    * and resyncs at the next step boundary (`|`, or `)` so a broken
    * join/union subquery doesn't eat the outer query), letting one pass
    * surface every broken step. */
  private def parseStepTail(
      steps: scala.collection.mutable.Builder[QueryStep, Seq[QueryStep]]): Unit =
    while (tryPunct("|")) {
      val startP = p
      try steps += parseStep()
      catch {
        case e: KqlParseException =>
          record(e)
          if (p == startP) p += 1 // guarantee progress
          while (!atPunct("|") && !atPunct(")") && !peek.isInstanceOf[Eof]) p += 1
      }
    }

  /** `conn.collection` / bare name / view ref — plus ADX scoping sugar:
    * `table('T')`, `database('D').T`, `database('D').table('T')`, and
    * `cluster('C').database('D').T`. The cluster scope is accepted and
    * DISCARDED (single-cluster engine); the database scope maps onto the
    * dotted conn.collection form the catalog already uses.
    */
  private def parseSourceRef(): String = {
    def fnArg(what: String): String = {
      eatPunct("(")
      val s = next() match {
        case StrTok(v, _) => v
        case t => throw KqlParseException(
          s"$what() takes a string literal", t.pos)
      }
      eatPunct(")")
      s
    }
    def callAhead(name: String): Boolean =
      atIdent(name) && toks.lift(p + 1).exists {
        case Punct("(", _) => true
        case _ => false
      }
    if (callAhead("cluster")) {
      p += 1; fnArg("cluster"); eatPunct(".")
    }
    if (callAhead("database")) {
      p += 1
      val db = fnArg("database")
      eatPunct(".")
      val t =
        if (callAhead("table")) { p += 1; fnArg("table") }
        else {
          val sb = new StringBuilder(identText())
          while (atPunct(".")) { p += 1; sb += '.'; sb ++= identText() }
          sb.toString
        }
      return s"$db.$t"
    }
    if (callAhead("table")) { p += 1; return fnArg("table") }
    val sb = new StringBuilder(identText())
    while (atPunct(".")) { p += 1; sb += '.'; sb ++= identText() }
    sb.toString
  }

  // ───────────────────────── steps ─────────────────────────

  private def parseStep(): QueryStep = peek match {
    case Ident(w, _) => w.toLowerCase match {
      case "where" | "filter" => p += 1; QueryStep.Filter(parseExpr())
      case "project"          => p += 1; QueryStep.Project(parseProjFields())
      case "extend"           => p += 1; QueryStep.Extend(parseProjFields())
      case "project-rename"   => p += 1; QueryStep.Rename(parseRenames())
      case "project-away"     => p += 1; QueryStep.ProjectAway(parseFieldList())
      case "project-keep"     => p += 1; QueryStep.ProjectKeep(parseFieldList())
      case "mv-expand"        => p += 1; parseExpand()
      case "mv-apply"         => p += 1; parseMvApply()
      case "limit" | "take"   => p += 1; QueryStep.Limit(parseIntLit())
      case "top-nested"       => p += 1; parseTopNested()
      case "sort" | "order"   => p += 1; eatIdent("by"); QueryStep.Sort(parseSortKeys())
      case "top"              => p += 1
        val n = parseIntLit(); eatIdent("by"); QueryStep.TopN(parseSortKeys(), n)
      case "top-hitters"      => p += 1
        val n = parseIntLit(); eatIdent("of"); val f = parseFieldPath()
        val by = peek match {
          case Ident(w, _) if w.equalsIgnoreCase("by") => p += 1; Some(parseFieldPath())
          case _ => None
        }
        QueryStep.TopHitters(n, f, by)
      case "sample-distinct"  => p += 1
        val n = parseIntLit(); eatIdent("of")
        QueryStep.SampleDistinct(n, parseFieldPath())
      case "sample"           => p += 1; QueryStep.Sample(parseIntLit())
      case "project-reorder"  => p += 1; parseReorder()
      case "parse-kv"         => p += 1; parseParseKv()
      case "reduce"           => p += 1; eatIdent("by"); parseReduceBy()
      case "fork"             => p += 1; parseFork()
      case "facet"            => p += 1; eatIdent("by")
        val fs = parseFieldList()
        if (atIdent("with"))
          fail("facet with (subquery) is not supported — run the " +
            "subquery as its own pipeline; facet by returns the stacked " +
            "(facet_column, value, count_) distribution")
        QueryStep.Facet(fs)
      case "summarize"        => p += 1; parseSummarize()
      case "make-series"      => p += 1; parseMakeSeries()
      case "distinct"         => p += 1
        // `distinct *` = all current columns (empty field list)
        if (atPunct("*")) { p += 1; QueryStep.Distinct(Nil) }
        else QueryStep.Distinct(parseFieldList())
      case "union"            => p += 1; parseUnion()
      case "join"             => p += 1; parseJoin()
      case "lookup"           => p += 1; parseJoin(lookup = true)
      case "count"            => p += 1; QueryStep.CountStep
      case "getschema"        => p += 1; QueryStep.GetSchema
      case "consume"          => p += 1
        // tolerate Kusto's decodeblocks=true knob
        if (atIdent("decodeblocks")) { p += 1; eatPunct("="); identText() }
        QueryStep.Consume
      case "write"            => p += 1; QueryStep.Write(parseSourceRef())
      case "tee"              => p += 1; QueryStep.Tee(parseSourceRef())
      case "search"           => p += 1; parseSearch()
      case "parse"            => p += 1; parseParse()
      case "parse-where"      => p += 1; parseParse(strict = true)
      case "evaluate"         => p += 1; parseEvaluate()
      case "serialize"        => p += 1; QueryStep.Serialize
      case "partition"        => p += 1; parsePartition()
      case "scan"             => p += 1; parseScanMatch()
      case "invoke"           => p += 1; parseInvoke()
      case "render"           => p += 1; parseRender()
      case "make-graph"       => p += 1; parseMakeGraph()
      case "graph-match"      => p += 1; parseGraphMatch()
      case "graph-shortest-paths" => p += 1; parseGraphShortestPaths()
      case "graph-to-table"   => p += 1; parseGraphToTable()
      case "graph-mark-components" => p += 1; parseGraphMarkComponents()
      case "as"               => p += 1
        // tolerate Kusto's `hint.materialized=true|false` prefix (the
        // binding is a plan splice either way — accepted and ignored,
        // like the other physical hints AQE supersedes)
        if (atIdent("hint")) {
          p += 1; eatPunct("."); eatIdent("materialized"); eatPunct("=")
          identText()
        }
        QueryStep.AsBind(identText())
      case other => fail(s"unknown step '$other'", Parser.stepKeywords)
    }
    case t => fail("expected a step name after '|'", Parser.stepKeywords)
  }

  /** Project/extend fields with the reference's auto-naming
    * (`parser.rs:303-348`): explicit alias > field-ish default name >
    * `Column1`, `Column2`, … with `{base}{n}` dedup.
    */
  /** Lookahead for the multi-assign form `(n1, n2, …) =` (≥2 names, the
    * `=` not `==`); consumes through the `=` and returns the names. */
  private def tryMultiAssign(): Option[Seq[String]] = {
    if (!atPunct("(")) return None
    var q = p + 1
    val names = Seq.newBuilder[String]
    var expectIdent = true
    var ok = true
    var closed = false
    while (!closed && ok) {
      toks.lift(q) match {
        case Some(Ident(w, _)) if expectIdent =>
          names += w; expectIdent = false; q += 1
        case Some(Punct(",", _)) if !expectIdent => expectIdent = true; q += 1
        case Some(Punct(")", _)) if !expectIdent => closed = true; q += 1
        case _ => ok = false
      }
    }
    if (!ok) return None
    (toks.lift(q), toks.lift(q + 1)) match {
      case (Some(Punct("=", _)), next) if !next.exists {
          case Punct("=", _) => true; case _ => false } =>
        val out = names.result()
        if (out.length >= 2) { p = q + 1; Some(out) } else None
      case _ => None
    }
  }

  private def parseProjFields(): Seq[(Expr, String)] = {
    final case class Raw(e: Expr, alias: Option[String])
    val raw = Seq.newBuilder[Raw]
    var done = false
    while (!done) {
      // multi-assign: (n1, n2, …) = f(…) — each name binds the i-th
      // field of the struct-valued result (ADX's tuple functions)
      tryMultiAssign() match {
        case Some(names) =>
          val e = parseExpr()
          names.zipWithIndex.foreach { case (n, i) =>
            raw += Raw(TupleGet(e, i), Some(n)) }
        case None =>
          // alias = expr  (lookahead: ident '=' not '==')
          val alias = (peek, toks.lift(p + 1)) match {
            case (Ident(a, _), Some(Punct("=", _)))
                if !reservedWords(a.toLowerCase) =>
              p += 2; Some(a)
            case _ => None
          }
          raw += Raw(parseExpr(), alias)
      }
      done = !tryPunct(",")
    }
    nameFields(raw.result().map(r => (r.e, r.alias)))
  }

  private def defaultExprName(e: Expr): Option[String] = e match {
    case Field(f) => Some(f.render)
    case LetRef(f, _) => Some(f.render)
    case Cast(_, inner) => defaultExprName(inner)
    case Bin(inner, _) => defaultExprName(inner)
    case _ => None
  }

  private def nameFields(fields: Seq[(Expr, Option[String])]): Seq[(Expr, String)] = {
    val used = scala.collection.mutable.Set[String]()
    def unique(base: String, initial: String): String = {
      var cand = initial
      var i = 1
      while (used.contains(cand)) { cand = s"$base$i"; i += 1 }
      used += cand
      cand
    }
    fields.map { case (e, alias) =>
      val name = alias match {
        case Some(a) => unique(a, a)
        case None => defaultExprName(e) match {
          case Some(d) => unique(d, d)
          case None    => unique("Column", "Column1")
        }
      }
      (e, name)
    }
  }

  private def parseRenames(): Seq[(String, FieldPath)] = {
    val out = Seq.newBuilder[(String, FieldPath)]
    var done = false
    while (!done) {
      val to = identText()
      eatPunct("=")
      out += ((to, parseFieldPath()))
      done = !tryPunct(",")
    }
    out.result()
  }

  private def parseSearch(): QueryStep = {
    var cs = false
    if (atIdent("kind")) {
      next(); eatPunct("=")
      identText().toLowerCase match {
        case "case_sensitive" => cs = true
        case "default" => cs = false
        case other => fail(s"unknown search kind '$other'")
      }
    }
    peek match {
      case StrTok(s, _) => p += 1; QueryStep.Search(s, cs)
      case t => throw KqlParseException("search expects a quoted term", t.pos)
    }
  }

  private def parseParse(strict: Boolean = false): QueryStep = {
    // `parse [kind=simple|regex|relaxed] [flags=imsU]`
    var kind = "simple"
    var flags = ""
    while (atIdent("kind") || atIdent("flags")) {
      val which = identText().toLowerCase
      eatPunct("=")
      val v = identText()
      which match {
        case "kind" => v.toLowerCase match {
          case k @ ("simple" | "regex" | "relaxed") => kind = k
          case other => fail(s"unknown parse kind '$other'")
        }
        case _ =>
          arity(v.matches("[imsU]+"), "parse flags must be from [imsU]")
          flags = v
      }
    }
    val src = parseFieldPath()
    eatIdent("with")
    val segs = Seq.newBuilder[ParseSeg]
    var nCaptures = 0
    var scanning = true
    while (scanning) {
      peek match {
        case StrTok(s, _) =>
          p += 1
          segs += ParseSeg(Some(s), None)
        case Ident(w, _) => // pattern ends at `|`/EOF, so any ident is a capture
          p += 1
          val kind =
            if (atPunct(":")) {
              next()
              identText().toLowerCase match {
                case k @ ("string" | "long" | "int" | "real" | "double") => k
                case other => fail(s"unknown parse capture type '$other'")
              }
            } else "string"
          segs += ParseSeg(None, Some((w, kind)))
          nCaptures += 1
        case _ => scanning = false
      }
    }
    arity(nCaptures >= 1, "parse needs at least one capture column")
    QueryStep.Parse(src, segs.result(), strict, kind, flags)
  }

  /** `evaluate pivot(col, agg(...), v1, v2, …)` or
    * `evaluate bag_unpack(col [, 'prefix'])` */
  private def parseEvaluate(): QueryStep = {
    val plugin = identText().toLowerCase
    if (plugin == "bag_unpack") {
      eatPunct("(")
      val f = parseFieldPath()
      val prefix =
        if (tryPunct(",")) peek match {
          case StrTok(s, _) => p += 1; Some(s)
          case _ => fail("bag_unpack prefix must be a string literal")
        } else None
      eatPunct(")")
      return QueryStep.BagUnpack(f, prefix)
    }
    if (plugin == "narrow") {
      eatPunct("("); eatPunct(")")
      return QueryStep.Narrow
    }
    if (plugin == "sequence_detect") {
      eatPunct("(")
      val tl = parseFieldPath()
      eatPunct(",")
      def span(what: String): Long = peek match {
        case TimespanTok(v, _) => p += 1; v
        case t => fail(s"sequence_detect $what must be a timespan literal")
      }
      val win = span("step window"); eatPunct(",")
      val dur = span("max duration"); eatPunct(",")
      val cols = Seq.newBuilder[FieldPath]
      var more = true
      while (more) { cols += parseFieldPath(); more = tryPunct(",") }
      eatPunct(")")
      val cs = cols.result()
      arity(cs.length >= 3,
        "sequence_detect() needs at least two step flags and one key")
      return QueryStep.SequenceDetect(tl, win, dur, cs.dropRight(1), cs.last)
    }
    if (plugin == "ipv4_lookup") {
      eatPunct("(")
      val table = parseSourceRef()
      eatPunct(",")
      val src = parseFieldPath()
      eatPunct(",")
      val net = parseFieldPath()
      val unmatched = if (tryPunct(",")) peek match {
        case Ident("return_unmatched", _) => p += 1
          if (atPunct("=")) { p += 1 }
          peek match {
            case Ident(b, _) if b == "true" || b == "false" => p += 1
              b == "true"
            case _ => true // bare return_unmatched flag
          }
        case Ident(b, _) if b == "true" || b == "false" => p += 1; b == "true"
        case _ => fail("ipv4_lookup: expected return_unmatched flag")
      } else false
      eatPunct(")")
      return QueryStep.Ipv4Lookup(table, src, net, unmatched)
    }
    if (plugin == "activity_engagement") {
      eatPunct("(")
      val id = parseFieldPath(); eatPunct(",")
      val ts = parseFieldPath(); eatPunct(",")
      def span(what: String): Long = peek match {
        case TimespanTok(v, _) => p += 1; v
        case _ => fail(s"activity_engagement $what must be a timespan literal")
      }
      val inner = span("inner window"); eatPunct(",")
      val outer = span("outer window")
      eatPunct(")")
      arity(inner > 0 && outer >= inner && outer % inner == 0,
        "outer window must be a positive multiple of the inner window")
      return QueryStep.ActivityEngagement(id, ts, inner, outer)
    }
    if (plugin == "sliding_window_counts" || plugin == "session_count") {
      eatPunct("(")
      val id = parseFieldPath(); eatPunct(",")
      val ts = parseFieldPath(); eatPunct(",")
      def dt(what: String): Long = delit(parseExpr()) match {
        case DatetimeLit(v) => v
        case _ => fail(s"sliding_window_counts $what must be a datetime literal")
      }
      def span(what: String): Long = peek match {
        case TimespanTok(v, _) => p += 1; v
        case _ => fail(s"sliding_window_counts $what must be a timespan literal")
      }
      val start = dt("start"); eatPunct(",")
      val end = dt("end"); eatPunct(",")
      // session_count takes (…, Bin, LookBack); sliding_window_counts
      // takes (…, LookBack, Bin) — Kusto's argument orders
      val a5 = span("window"); eatPunct(",")
      val a6 = span("window")
      val (lookback, bin) =
        if (plugin == "session_count") (a6, a5) else (a5, a6)
      eatPunct(")")
      arity(bin > 0 && lookback >= bin && lookback % bin == 0,
        "lookback must be a positive multiple of the bin")
      arity(end >= start, "end must be >= start")
      return if (plugin == "session_count")
        QueryStep.SessionCount(id, ts, start, end, bin, lookback)
      else QueryStep.SlidingWindowCounts(id, ts, start, end, lookback, bin)
    }
    if (plugin == "activity_counts_metrics" || plugin == "activity_metrics" ||
        plugin == "new_activity_metrics") {
      eatPunct("(")
      val id = parseFieldPath(); eatPunct(",")
      val ts = parseFieldPath(); eatPunct(",")
      def dt(what: String): Long = delit(parseExpr()) match {
        case DatetimeLit(v) => v
        case _ => fail(s"activity_counts_metrics $what must be a datetime literal")
      }
      val start = dt("start"); eatPunct(",")
      val end = dt("end"); eatPunct(",")
      val step = peek match {
        case TimespanTok(v, _) => p += 1; v
        case _ => fail("activity_counts_metrics step must be a timespan literal")
      }
      eatPunct(")")
      arity(step > 0, "step must be positive")
      arity(end >= start, "end must be >= start")
      return plugin match {
        case "activity_metrics" =>
          QueryStep.ActivityMetrics(id, ts, start, end, step)
        case "new_activity_metrics" =>
          QueryStep.NewActivityMetrics(id, ts, start, end, step)
        case _ => QueryStep.ActivityCountsMetrics(id, ts, start, end, step)
      }
    }
    if (plugin == "rolling_percentile") {
      eatPunct("(")
      val value = parseFieldPath(); eatPunct(",")
      val pv = peek match {
        case IntTok(v, _) => p += 1; v.toDouble
        case FloatTok(v, _) => p += 1; v
        case _ => fail("rolling_percentile percentile must be numeric")
      }
      eatPunct(",")
      val index = parseFieldPath(); eatPunct(",")
      val bin = peek match {
        case TimespanTok(v, _) => p += 1; v
        case _ => fail("rolling_percentile bin size must be a timespan literal")
      }
      eatPunct(",")
      val win = parseIntLit().toInt
      val dims = Seq.newBuilder[FieldPath]
      while (tryPunct(",")) dims += parseFieldPath()
      eatPunct(")")
      arity(pv >= 0 && pv <= 100, "percentile must be in [0, 100]")
      arity(win >= 1, "window must be >= 1 bins")
      return QueryStep.RollingPercentile(value, pv, index, bin, win,
        dims.result())
    }
    if (plugin == "funnel_sequence_completion") {
      eatPunct("(")
      val id = parseFieldPath(); eatPunct(",")
      val ts = parseFieldPath(); eatPunct(",")
      def dt(what: String): Long = delit(parseExpr()) match {
        case DatetimeLit(v) => v
        case _ => fail(
          s"funnel_sequence_completion $what must be a datetime literal")
      }
      def span(what: String): Long = peek match {
        case TimespanTok(v, _) => p += 1; v
        case _ => fail(
          s"funnel_sequence_completion $what must be a timespan literal")
      }
      val start = dt("start"); eatPunct(",")
      val end = dt("end"); eatPunct(",")
      val step = span("bin"); eatPunct(",")
      val state = parseFieldPath(); eatPunct(",")
      eatPunct("(")
      val states = Seq.newBuilder[String]
      var more = true
      while (more) {
        peek match {
          case StrTok(s, _) => p += 1; states += s
          case _ => fail("sequence states must be string literals")
        }
        more = tryPunct(",")
      }
      eatPunct(")"); eatPunct(","); eatPunct("(")
      val wins = Seq.newBuilder[Long]
      more = true
      while (more) { wins += span("window"); more = tryPunct(",") }
      eatPunct(")"); eatPunct(")")
      val ss = states.result()
      val ws = wins.result()
      arity(ss.length >= 2, "the sequence needs at least 2 states")
      arity(ws.length == ss.length,
        "one window per sequence state is required")
      arity(step > 0 && ws.forall(_ > 0), "windows must be positive")
      return QueryStep.FunnelCompletion(id, ts, start, end, step, state,
        ss, ws)
    }
    if (plugin == "funnel_sequence") {
      eatPunct("(")
      val id = parseFieldPath(); eatPunct(",")
      val ts = parseFieldPath(); eatPunct(",")
      def dt(what: String): Long = delit(parseExpr()) match {
        case DatetimeLit(v) => v
        case _ => fail(s"funnel_sequence $what must be a datetime literal")
      }
      def span(what: String): Long = peek match {
        case TimespanTok(v, _) => p += 1; v
        case _ => fail(s"funnel_sequence $what must be a timespan literal")
      }
      val start = dt("start"); eatPunct(",")
      val end = dt("end"); eatPunct(",")
      val maxWin = span("max step window"); eatPunct(",")
      val step = span("step"); eatPunct(",")
      val state = parseFieldPath()
      val states = Seq.newBuilder[String]
      while (tryPunct(",")) peek match {
        case StrTok(s, _) => p += 1; states += s
        case _ => fail("funnel_sequence states must be string literals")
      }
      eatPunct(")")
      val ss = states.result()
      arity(ss.length >= 2, "funnel_sequence needs at least 2 states")
      arity(maxWin > 0 && step > 0, "windows must be positive")
      return QueryStep.FunnelSequence(id, ts, start, end, maxWin, step,
        state, ss)
    }
    if (plugin == "dcount_intersect") {
      eatPunct("(")
      val cols = Seq.newBuilder[FieldPath]
      var more = true
      while (more) { cols += parseFieldPath(); more = tryPunct(",") }
      eatPunct(")")
      val cs = cols.result()
      arity(cs.length >= 2 && cs.length <= 4,
        "dcount_intersect() takes 2 to 4 hll columns")
      return QueryStep.DcountIntersect(cs)
    }
    if (plugin == "rows_near") {
      eatPunct("(")
      val cond = parseExpr()
      eatPunct(",")
      val before = parseIntLit()
      val after = if (tryPunct(",")) parseIntLit() else before
      eatPunct(")")
      arity(before >= 0 && after >= 0, "rows_near counts must be >= 0")
      return QueryStep.RowsNear(cond, before, after)
    }
    if (plugin == "diffpatterns_text") {
      eatPunct("(")
      val th = peek match {
        case FloatTok(v, _) => p += 1; v
        case IntTok(v, _) => p += 1; v.toDouble
        case t => fail("diffpatterns_text threshold must be a numeric literal")
      }
      eatPunct(",")
      val text = parseFieldPath()
      eatPunct(",")
      val split = parseFieldPath()
      eatPunct(",")
      val va = delit(parseExpr())
      eatPunct(",")
      val vb = delit(parseExpr())
      eatPunct(")")
      arity(th > 0 && th <= 1,
        "diffpatterns_text threshold must be in (0, 1]")
      arity(va.isInstanceOf[StrLit] && vb.isInstanceOf[StrLit],
        "diffpatterns_text split values must be string literals")
      return QueryStep.DiffPatternsText(th, text, split, va, vb)
    }
    if (plugin == "diffpatterns") {
      eatPunct("(")
      val th = peek match {
        case FloatTok(v, _) => p += 1; v
        case IntTok(v, _) => p += 1; v.toDouble
        case t => fail("diffpatterns threshold must be a numeric literal")
      }
      eatPunct(",")
      val split = parseFieldPath()
      eatPunct(",")
      val va = delit(parseExpr())
      eatPunct(",")
      val vb = delit(parseExpr())
      eatPunct(")")
      arity(th > 0 && th <= 1, "diffpatterns threshold must be in (0, 1]")
      arity(va.isInstanceOf[StrLit] || va.isInstanceOf[IntLit] ||
        va.isInstanceOf[BoolLit], "diffpatterns values must be literals")
      arity(vb.isInstanceOf[StrLit] || vb.isInstanceOf[IntLit] ||
        vb.isInstanceOf[BoolLit], "diffpatterns values must be literals")
      return QueryStep.DiffPatterns(th, split, va, vb)
    }
    if (plugin == "autocluster") {
      eatPunct("(")
      def num(dflt: Double): Double = peek match {
        case FloatTok(v, _) => p += 1; v
        case IntTok(v, _) => p += 1; v.toDouble
        case _ => dflt
      }
      val th = num(0.05)
      val ratio = if (tryPunct(",")) num(0.9) else 0.9
      eatPunct(")")
      arity(th > 0 && th <= 1, "autocluster threshold must be in (0, 1]")
      arity(ratio > 0 && ratio <= 1, "autocluster ratio must be in (0, 1]")
      return QueryStep.AutoCluster(th, ratio)
    }
    if (plugin == "basket") {
      eatPunct("(")
      val th = peek match {
        case FloatTok(v, _) => p += 1; v
        case IntTok(v, _) => p += 1; v.toDouble
        case Punct(")", _) => 0.05 // Kusto's default threshold
        case t => fail("basket threshold must be a numeric literal")
      }
      eatPunct(")")
      arity(th > 0 && th <= 1, "basket threshold must be in (0, 1]")
      return QueryStep.Basket(th)
    }
    if (plugin != "pivot")
      fail(s"unknown evaluate plugin '$plugin' " +
        "(supported: pivot, bag_unpack, narrow, basket)")
    eatPunct("(")
    val col = parseFieldPath()
    eatPunct(",")
    val alias = (peek, toks.lift(p + 1)) match {
      case (Ident(a, _), Some(Punct("=", _))) => p += 2; Some(a)
      case _ => None
    }
    val agg = parseAggCall()
    val values = Seq.newBuilder[Expr]
    while (tryPunct(",")) values += parseExpr()
    eatPunct(")")
    // empty values = Kusto's auto-schema form; the compiler runs a
    // bounded eager distinct scan (like toscalar's documented eagerness)
    QueryStep.Pivot(col,
      AggField(agg, alias.getOrElse(Aggregation.defaultName(agg))),
      values.result())
  }

  /** `partition [hint.…=…] by Col ( step | step … )` — hints are accepted
    * and discarded: the compiler's lowering is always the distributed
    * shuffle shape, so Kusto's strategy/partition-count knobs are inert. */
  private def parsePartition(): QueryStep = {
    while (atIdent("hint")) {
      eatIdent("hint"); eatPunct("."); identText(); eatPunct("="); next()
    }
    eatIdent("by")
    val f = parseFieldPath()
    eatPunct("(")
    val steps = Seq.newBuilder[QueryStep]
    steps += parseStep()
    while (tryPunct("|")) steps += parseStep()
    eatPunct(")")
    QueryStep.Partition(f, steps.result())
  }

  /** `render <kind> [with (prop = value, …)]` — visualization directive,
    * tolerated as a row-preserving no-op (the `with` clause is consumed
    * and discarded). */
  private def parseRender(): QueryStep = {
    val kind = identText()
    if (atIdent("with")) {
      p += 1
      eatPunct("(")
      var depth = 1
      while (depth > 0) {
        peek match {
          case Punct("(", _) => depth += 1; p += 1
          case Punct(")", _) => depth -= 1; p += 1
          case Eof(_) => fail("unterminated render with(…) clause")
          case _ => p += 1
        }
      }
    }
    QueryStep.RenderHint(kind)
  }

  /** `make-graph src --> dst [with NodesTable on id]`. */
  private def parseMakeGraph(): QueryStep = {
    val src = parseFieldPath()
    eatPunct("-"); eatPunct("-"); eatPunct(">")
    val dst = parseFieldPath()
    val nodes = if (atIdent("with")) {
      p += 1
      val t = parseSourceRef()
      eatIdent("on")
      Some((t, parseFieldPath()))
    } else None
    QueryStep.MakeGraph(src, dst, nodes)
  }

  /** `graph-match [cycles=none|unique_edges] (a)-[e]->(b)…
    * [where pred] project fields` — edges: `-[e]->`, `<-[e]-`, `-[e]-`
    * (either direction), shorthands `-->`/`<--`/`--`, variable length
    * `-[e*1..3]->` (hop range 1..5).
    */
  private def parseGraphMatch(): QueryStep = {
    var cycles = "unique_edges"
    if (atIdent("cycles")) {
      p += 1; eatPunct("=")
      cycles = identText().toLowerCase match {
        case c @ ("none" | "unique_edges") => c
        case o => fail(s"cycles must be none or unique_edges, got '$o'")
      }
    }
    val (ns, es, where, proj) = parseGraphPattern()
    QueryStep.GraphMatch(cycles, ns, es, where, proj)
  }

  /** `graph-shortest-paths [output=any|all] (a)-[e*1..k]->(b)
    * [where pred] project fields` — ADX's shortest-path operator;
    * exactly one source-edge-target pattern.
    */
  private def parseGraphShortestPaths(): QueryStep = {
    var output = "any"
    if (atIdent("output")) {
      p += 1; eatPunct("=")
      output = identText().toLowerCase match {
        case o @ ("any" | "all") => o
        case o => fail(s"output must be any or all, got '$o'")
      }
    }
    val (ns, es, where, proj) = parseGraphPattern()
    arity(ns.length == 2 && es.length == 1,
      "graph-shortest-paths takes exactly one (source)-[edge]->(target) pattern")
    QueryStep.GraphShortestPaths(output, ns, es.head, where, proj)
  }

  /** `graph-to-table nodes|edges [with_node_id=… | with_source_id=…
    * with_target_id=…]`. */
  private def parseGraphToTable(): QueryStep = {
    val what = identText().toLowerCase
    arity(what == "nodes" || what == "edges",
      "graph-to-table takes nodes or edges")
    var nodeId: Option[String] = None
    var srcId: Option[String] = None
    var dstId: Option[String] = None
    while (atIdent("with_node_id") || atIdent("with_source_id") ||
        atIdent("with_target_id")) {
      val k = identText().toLowerCase
      eatPunct("=")
      val v = identText()
      k match {
        case "with_node_id" =>
          arity(what == "nodes", "with_node_id applies to nodes")
          nodeId = Some(v)
        case "with_source_id" =>
          arity(what == "edges", "with_source_id applies to edges")
          srcId = Some(v)
        case _ =>
          arity(what == "edges", "with_target_id applies to edges")
          dstId = Some(v)
      }
    }
    QueryStep.GraphToTable(what, nodeId, srcId, dstId)
  }

  /** `graph-mark-components [kind=weak|strong] [with_component_id=name]`. */
  private def parseGraphMarkComponents(): QueryStep = {
    var strong = false
    if (atIdent("kind")) {
      p += 1; eatPunct("=")
      identText().toLowerCase match {
        case "weak" => ()
        case "strong" => strong = true
        case o => fail(
          s"graph-mark-components supports kind=weak|strong (got '$o')")
      }
    }
    var name = "ComponentId"
    if (atIdent("with_component_id")) { p += 1; eatPunct("="); name = identText() }
    QueryStep.GraphMarkComponents(name, strong)
  }

  /** Shared graph pattern tail: `(a)-[e]->(b)… [where pred] project …`. */
  private def parseGraphPattern(): (Seq[QueryStep.GraphNode],
      Seq[QueryStep.GraphEdge], Option[Expr], Seq[(Expr, String)]) = {
    def parseNode(): QueryStep.GraphNode = {
      eatPunct("(")
      val n = if (atPunct(")")) None else Some(identText())
      eatPunct(")")
      QueryStep.GraphNode(n)
    }
    def parseEdge(): QueryStep.GraphEdge = {
      val back = atPunct("<")
      if (back) p += 1
      eatPunct("-")
      var name: Option[String] = None
      var minH = 1
      var maxH = 1
      if (atPunct("[")) {
        p += 1
        if (!atPunct("]")) {
          name = Some(identText())
          if (atPunct("*")) {
            p += 1
            minH = parseIntLit().toInt
            eatPunct("..")
            maxH = parseIntLit().toInt
            arity(minH >= 1 && maxH >= minH && maxH <= 5,
              "variable-length hop range must satisfy 1 <= min <= max <= 5")
          }
        }
        eatPunct("]")
        eatPunct("-")
      } else eatPunct("-") // shorthand --> / <-- / --
      val fwd = atPunct(">")
      if (fwd) { arity(!back, "edge cannot be both <- and ->"); p += 1 }
      QueryStep.GraphEdge(name, if (back) -1 else if (fwd) 1 else 0,
        minH, maxH)
    }
    val nodes = Seq.newBuilder[QueryStep.GraphNode]
    val edges = Seq.newBuilder[QueryStep.GraphEdge]
    nodes += parseNode()
    while (atPunct("-") || atPunct("<")) {
      edges += parseEdge()
      nodes += parseNode()
    }
    val where = if (atIdent("where")) { p += 1; Some(parseExpr()) } else None
    eatIdent("project")
    val proj = parseProjFields()
    val ns = nodes.result()
    val es = edges.result()
    // edge variables must be distinct (each names one edge instance);
    // a REPEATED NODE variable is legal — it is a same-node constraint
    // (cyclic pattern like (a)-[e1]->(b)-[e2]->(a)), lowered as an id
    // equality against the first occurrence
    val edgeNamed = es.flatMap(_.name)
    arity(edgeNamed.distinct.length == edgeNamed.length,
      "graph-match edge variable names must be distinct")
    arity(ns.flatMap(_.name).toSet.intersect(edgeNamed.toSet).isEmpty,
      "graph-match node and edge variables must not share names")
    (ns, es, where, proj)
  }

  /** `fork [name =] (steps…) …` — at least one parenthesized branch;
    * branch steps may lead with a `|`. Unnamed branches get `fork_N`. */
  private def parseFork(): QueryStep = {
    val branches = Seq.newBuilder[(String, Seq[QueryStep])]
    var i = 0
    var more = true
    while (more) {
      val nm = (peek, toks.lift(p + 1)) match {
        case (Ident(a, _), Some(Punct("=", _)))
            if !reservedWords(a.toLowerCase) =>
          p += 2; a
        case _ => s"fork_$i"
      }
      eatPunct("(")
      tryPunct("|") // tolerate a leading pipe inside the branch
      val steps = Seq.newBuilder[QueryStep]
      steps += parseStep()
      while (tryPunct("|")) steps += parseStep()
      eatPunct(")")
      branches += ((nm, steps.result()))
      i += 1
      more = atPunct("(") || ((peek, toks.lift(p + 1)) match {
        case (Ident(a, _), Some(Punct("=", _))) =>
          !reservedWords(a.toLowerCase) &&
            toks.lift(p + 2).exists {
              case Punct("(", _) => true; case _ => false }
        case _ => false
      })
    }
    val out = branches.result()
    arity(out.nonEmpty, "fork needs at least one (branch)")
    QueryStep.Fork(out)
  }

  /** `project-reorder spec [asc|desc|granny-asc|granny-desc], …` —
    * specs are names or wildcard patterns (`*`, `pre*`, `*suf`); the
    * granny-* orders are accepted as plain asc/desc (numeric-aware
    * collation is a documented deviation). */
  private def parseReorder(): QueryStep = {
    val specs = Seq.newBuilder[(String, Option[Boolean])]
    var done = false
    while (!done) {
      val pat = new StringBuilder
      if (atPunct("*")) { p += 1; pat += '*' }
      peek match {
        case Ident(w, _) if !reservedWords(w.toLowerCase) &&
            !Set("asc", "desc", "granny-asc", "granny-desc")(w.toLowerCase) =>
          p += 1; pat ++= w
          if (atPunct("*")) { p += 1; pat += '*' }
        case _ => ()
      }
      arity(pat.nonEmpty, "project-reorder expects a column name or pattern")
      val order = peek match {
        case Ident(o, _) if o.equalsIgnoreCase("asc") ||
            o.equalsIgnoreCase("granny-asc") => p += 1; Some(true)
        case Ident(o, _) if o.equalsIgnoreCase("desc") ||
            o.equalsIgnoreCase("granny-desc") => p += 1; Some(false)
        case _ => None
      }
      specs += ((pat.toString, order))
      done = !tryPunct(",")
    }
    QueryStep.Reorder(specs.result())
  }

  private val parseKvTypes = Set(
    "string", "long", "int", "real", "double", "datetime", "bool", "boolean")

  /** `parse-kv expr as (key: type, …) with (pair_delimiter='…',
    * kv_delimiter='…'[, quote='…'])`. */
  private def parseParseKv(): QueryStep = {
    val src = parseExpr()
    eatIdent("as")
    eatPunct("(")
    val keys = Seq.newBuilder[(String, String)]
    var done = false
    while (!done) {
      val k = peek match {
        case Ident(w, _) => p += 1; w
        case StrTok(s, _) => p += 1; s
        case t => throw KqlParseException("parse-kv expects a key name", t.pos)
      }
      eatPunct(":")
      val t = identText().toLowerCase
      arity(parseKvTypes.contains(t), s"parse-kv: unsupported type '$t'")
      keys += ((k, t))
      done = !tryPunct(",")
    }
    eatPunct(")")
    var pairD = ","
    var kvD = "="
    var quote: Option[String] = None
    if (atIdent("with")) {
      p += 1; eatPunct("(")
      var wdone = atPunct(")")
      while (!wdone) {
        val opt = identText().toLowerCase
        eatPunct("=")
        val v = peek match {
          case StrTok(s, _) => p += 1; s
          case t => throw KqlParseException(
            s"parse-kv option '$opt' expects a string literal", t.pos)
        }
        opt match {
          case "pair_delimiter" => pairD = v
          case "kv_delimiter" => kvD = v
          case "quote" => quote = Some(v)
          case other => fail(s"parse-kv: unknown option '$other'")
        }
        wdone = !tryPunct(",")
      }
      eatPunct(")")
    }
    arity(pairD.nonEmpty && kvD.nonEmpty,
      "parse-kv delimiters must be non-empty")
    QueryStep.ParseKv(src, keys.result(), pairD, kvD, quote)
  }

  /** `reduce by expr [with (threshold=…, characters=…)]` — the with
    * options steer Kusto's (unspecified) clustering heuristic; ours is
    * deterministic, so they parse and discard. */
  private def parseReduceBy(): QueryStep = {
    val e = parseExpr()
    if (atIdent("with")) {
      p += 1; eatPunct("(")
      var depth = 1
      while (depth > 0) {
        peek match {
          case Punct("(", _) => depth += 1; p += 1
          case Punct(")", _) => depth -= 1; p += 1
          case Eof(_) => fail("unterminated reduce with(…) clause")
          case _ => p += 1
        }
      }
    }
    QueryStep.ReduceBy(e)
  }

  /** `invoke f(args…)` — splice a tabular function let's body into the
    * pipeline: re-parse the stored body range with the scalar params
    * bound, drop the table-param scan head, and emit the remaining steps
    * as one [[QueryStep.Invoke]] group. */
  private def parseInvoke(): QueryStep = {
    val name = identText()
    val (_, scalars, bodyStart, bodyEnd) = funcTabLets.getOrElse(name,
      fail(s"unknown tabular function '$name' — declare it with " +
        s"let $name = (T: table, …) { … }; first"))
    eatPunct("(")
    val args = Seq.newBuilder[Expr]
    if (!atPunct(")")) {
      var done = false
      while (!done) { args += parseExpr(); done = !tryPunct(",") }
    }
    eatPunct(")")
    val a = args.result()
    arity(a.length == scalars.length,
      s"$name() takes ${scalars.length} argument(s), got ${a.length}")
    if (funcDepth >= 32)
      fail(s"tabular function '$name' expands too deep — recursion is not supported")
    val savedP = p
    val savedEnv = paramEnv
    p = bodyStart
    paramEnv = paramEnv ++ scalars.zip(a)
    funcDepth += 1
    val q = try parsePipeline()
    finally { paramEnv = savedEnv; funcDepth -= 1 }
    if (p != bodyEnd)
      fail(s"tabular function '$name' body did not re-parse to the same extent")
    p = savedP
    QueryStep.Invoke(name, q.steps.tail)
  }

  /** `scan [with_match_id=m] with (step s1: cond; …)` — steps are
    * `step <name>: <condition>` separated by semicolons (trailing `;`
    * optional). Kusto's `declare (…)` clause is rejected with a pointer
    * to the supported alternative. */
  /** Does the expression reference any of `vars` as a simple field?
    * (Generic product walk over the Expr ADT.) */
  private def refsVar(e: Any, vars: Set[String]): Boolean = e match {
    case Field(fp) => fp.isSimple && vars.contains(fp.simpleName)
    case s: Seq[_] => s.exists(refsVar(_, vars))
    case o: Option[_] => o.exists(refsVar(_, vars))
    case p: Product => p.productIterator.exists(refsVar(_, vars))
    case _ => false
  }

  private def parseScanMatch(): QueryStep = {
    var matchId: Option[String] = None
    while (atIdent("with_match_id")) {
      p += 1; eatPunct("="); matchId = Some(identText())
    }
    var declares = Seq.empty[QueryStep.ScanVar]
    if (atIdent("declare")) {
      p += 1
      eatPunct("(")
      val b = Seq.newBuilder[QueryStep.ScanVar]
      var more = true
      while (more) {
        val n = identText()
        eatPunct(":")
        val t = identText().toLowerCase match {
          case "long" | "int" => "long"
          case "real" | "double" => "real"
          case o => fail(
            s"scan declare supports long and real variables (got '$o')")
        }
        eatPunct("=")
        val d = delit(parseExpr()) match {
          case IntLit(v) => v.toDouble
          case FloatLit(v) => v
          case Neg(IntLit(v)) => -v.toDouble
          case Neg(FloatLit(v)) => -v
          case _ => fail("scan variable default must be a numeric literal")
        }
        b += QueryStep.ScanVar(n, t, d)
        more = tryPunct(",")
      }
      eatPunct(")")
      declares = b.result()
      arity(declares.map(_.name).distinct.length == declares.length,
        "scan variable names must be distinct")
    }
    val varNames = declares.map(_.name).toSet
    eatIdent("with")
    eatPunct("(")
    val steps = Seq.newBuilder[(String, Expr)]
    val assigns = Seq.newBuilder[Seq[QueryStep.ScanAssign]]
    var done = false
    while (!done) {
      eatIdent("step")
      val n = identText()
      eatPunct(":")
      val cond = parseExpr()
      arity(!refsVar(cond, varNames),
        "scan step conditions must not reference declared variables " +
          "(documented narrowing)")
      steps += ((n, cond))
      // `=> v = <rhs>, …` — the restricted assignment grammar (Ast note)
      val as = Seq.newBuilder[QueryStep.ScanAssign]
      if (tryPunct("=>")) {
        var moreA = true
        while (moreA) {
          val v = identText()
          arity(varNames.contains(v), s"'$v' is not a declared scan variable")
          eatPunct("=")
          val rhs = parseExpr()
          def varField(e: Expr): Boolean = e match {
            case Field(fp) => fp.isSimple && fp.simpleName == v
            case _ => false
          }
          val assign = rhs match {
            case Arith("+", l, r) if varField(l) && !refsVar(r, varNames) =>
              QueryStep.ScanAssign(v, "add", r)
            case Arith("+", l, r) if varField(r) && !refsVar(l, varNames) =>
              QueryStep.ScanAssign(v, "add", l)
            case Arith("-", l, r) if varField(l) && !refsVar(r, varNames) =>
              QueryStep.ScanAssign(v, "sub", r)
            case Arith("*", l, r) if varField(l) && !refsVar(r, varNames) =>
              QueryStep.ScanAssign(v, "mul", r)
            case Arith("*", l, r) if varField(r) && !refsVar(l, varNames) =>
              QueryStep.ScanAssign(v, "mul", l)
            case MathFn("min_of", Seq(l, r)) if varField(l) &&
                !refsVar(r, varNames) =>
              QueryStep.ScanAssign(v, "min", r)
            case MathFn("max_of", Seq(l, r)) if varField(l) &&
                !refsVar(r, varNames) =>
              QueryStep.ScanAssign(v, "max", r)
            case e if !refsVar(e, varNames) =>
              QueryStep.ScanAssign(v, "set", e)
            case _ => fail(
              s"unsupported scan assignment for '$v' — supported: " +
                "v = e, v = v + e, v = v - e, v = v * e, " +
                "v = min_of(v, e), v = max_of(v, e) with variable-free e")
          }
          as += assign
          moreA = tryPunct(",")
        }
      }
      assigns += as.result()
      done = if (tryPunct(";")) atPunct(")") else true
    }
    eatPunct(")")
    val ss = steps.result()
    arity(ss.nonEmpty, "scan needs at least one step")
    arity(ss.map(_._1).distinct.length == ss.length,
      "scan step names must be distinct")
    QueryStep.ScanMatch(matchId, ss, declares, assigns.result())
  }

  /** `mv-apply [x =] arrField on ( step | step … )` — the inner pipeline
    * has no source of its own (it runs over the row's expanded elements). */
  private def parseTypeof(): String = {
    eatIdent("typeof"); eatPunct("(")
    val t = identText().toLowerCase match {
      case k @ ("string" | "long" | "int" | "real" | "double" | "bool" |
                "boolean" | "datetime" | "dynamic") => k
      case other => fail(s"unsupported typeof($other)")
    }
    eatPunct(")")
    t
  }

  private def parseMvApply(): QueryStep = {
    def oneSpec(): (String, FieldPath, Option[String]) = {
      val (name, src) = (peek, toks.lift(p + 1)) match {
        case (Ident(a, _), Some(Punct("=", _))) =>
          p += 2; (a, parseFieldPath())
        case _ =>
          val f = parseFieldPath(); (f.flat, f)
      }
      val cast = if (atIdent("to")) { p += 1; Some(parseTypeof()) } else None
      (name, src, cast)
    }
    val first = oneSpec()
    val extras = Seq.newBuilder[(String, FieldPath, Option[String])]
    while (tryPunct(",")) extras += oneSpec()
    val extraSpecs = extras.result()
    val allNames = first._1 +: extraSpecs.map(_._1)
    arity(allNames.map(_.toLowerCase).distinct.length == allNames.length,
      "mv-apply element names must be distinct")
    eatIdent("on")
    eatPunct("(")
    val steps = Seq.newBuilder[QueryStep]
    steps += parseStep()
    while (tryPunct("|")) steps += parseStep()
    eatPunct(")")
    QueryStep.MvApply(first._1, first._2, steps.result(), first._3,
      extraSpecs)
  }

  private def parseExpand(): QueryStep = {
    var kind: ExpandKind = ExpandKind.Bag
    var itemIndex: Option[String] = None
    var opts = true
    while (opts) {
      if (atIdent("kind")) {
        p += 1; eatPunct("=")
        kind = identText().toLowerCase match {
          case "bag" => ExpandKind.Bag
          case "array" => ExpandKind.Arr
          case other => fail(s"unknown mv-expand kind '$other'")
        }
      } else if (atIdent("with_itemindex")) {
        p += 1; eatPunct("=")
        itemIndex = Some(identText())
      } else opts = false
    }
    // per-field `to typeof(T)` casts the expanded element
    val fs = Seq.newBuilder[FieldPath]
    val casts = Seq.newBuilder[Option[String]]
    var more = true
    while (more) {
      val f = parseFieldPath()
      val c = if (atIdent("to")) { p += 1; Some(parseTypeof()) } else None
      arity(c.isEmpty || f.isSimple,
        "mv-expand 'to typeof' needs a simple column")
      fs += f; casts += c
      more = tryPunct(",")
    }
    // `limit N` caps the expanded rows PER INPUT ROW (Kusto's RowLimit)
    val limit = if (atIdent("limit")) {
      p += 1
      val n = parseIntLit()
      arity(n >= 1, "mv-expand limit must be >= 1")
      Some(n)
    } else None
    QueryStep.Expand(fs.result(), kind, itemIndex, casts.result(), limit)
  }

  private def parseFieldList(): Seq[FieldPath] = {
    val out = Seq.newBuilder[FieldPath]
    var done = false
    while (!done) { out += parseFieldPath(); done = !tryPunct(",") }
    out.result()
  }

  private def parseIntLit(): Long = next() match {
    case IntTok(v, _) => v
    case t => throw KqlParseException("expected integer literal", t.pos)
  }

  private def parseSortKeys(): Seq[SortKey] = {
    val out = Seq.newBuilder[SortKey]
    var n = 0
    var done = false
    while (!done) {
      // real-KQL allows arbitrary expressions as sort keys; plain field
      // refs stay field keys (they feed the serialized-window machinery)
      val (f, eOpt) = delit(parseExpr()) match {
        case Field(fp) => (fp, None)
        case LetRef(fp, _) => (fp, None)
        case e =>
          n += 1
          (FieldPath.simple(s"__sortexpr_$n"), Some(e))
      }
      var order: SortOrder = SortOrder.Asc
      var nulls: NullsOrder = NullsOrder.Last
      if (tryIdent("asc")) order = SortOrder.Asc
      else if (tryIdent("desc")) order = SortOrder.Desc
      if (tryIdent("nulls")) {
        if (tryIdent("first")) nulls = NullsOrder.First
        else if (tryIdent("last")) nulls = NullsOrder.Last
        else fail("expected 'first' or 'last' after 'nulls'")
      }
      out += SortKey(f, order, nulls, eOpt)
      done = !tryPunct(",")
    }
    out.result()
  }

  /** `top-nested N1 of k1 by [name =] agg1, top-nested N2 of k2 by …` */
  private def parseTopNested(): QueryStep = {
    val levels = Seq.newBuilder[TopNestedLevel]
    val used = scala.collection.mutable.Set[String]()
    def unique(base: String): String = {
      var cand = base; var i = 1
      while (used.contains(cand)) { cand = s"$base$i"; i += 1 }
      used += cand; cand
    }
    def level(): TopNestedLevel = {
      val n = parseIntLit()
      eatIdent("of")
      val of = parseFieldPath()
      used += of.flat
      // `with others = <literal>` — excluded keys bucket under the label
      val others = if (atIdent("with")) {
        p += 1; eatIdent("others"); eatPunct("=")
        peek match {
          case StrTok(s, _) => p += 1; Some(s)
          case IntTok(v, _) => p += 1; Some(v.toString)
          case t => fail("with others = takes a literal label")
        }
      } else None
      eatIdent("by")
      val alias = (peek, toks.lift(p + 1)) match {
        case (Ident(a, _), Some(Punct("=", _))) => p += 2; Some(a)
        case _ => None
      }
      val agg = parseAggCall()
      TopNestedLevel(n, of,
        AggField(agg, unique(alias.getOrElse(Aggregation.defaultName(agg)))),
        others)
    }
    levels += level()
    while (tryPunct(",")) { eatIdent("top-nested"); levels += level() }
    QueryStep.TopNested(levels.result())
  }

  private def parseSummarize(): QueryStep = {
    // `summarize hint.shufflekey=k …` / `hint.num_partitions=N …` —
    // accepted and ignored for compatibility: the Spark analogs (AQE skew
    // handling, the salted-agg operator, conf'd shuffle partitioning)
    // supersede Kusto's manual shuffle hints
    while (atIdent("hint")) {
      eatIdent("hint"); eatPunct("."); identText(); eatPunct("="); next()
    }
    final case class RawAgg(agg: Aggregation, alias: Option[String])
    val aggs = Seq.newBuilder[RawAgg]
    var done = false
    while (!done) {
      val alias = (peek, toks.lift(p + 1)) match {
        case (Ident(a, _), Some(Punct("=", _))) => p += 2; Some(a)
        case _ => None
      }
      aggs += RawAgg(parseAggCall(), alias)
      done = !tryPunct(",")
    }
    var by = Seq.empty[ByField]
    if (tryIdent("by")) {
      final case class RawBy(e: Expr, alias: Option[String])
      val bys = Seq.newBuilder[RawBy]
      var bdone = false
      while (!bdone) {
        val alias = (peek, toks.lift(p + 1)) match {
          case (Ident(a, _), Some(Punct("=", _))) if !reservedWords(a.toLowerCase) =>
            p += 2; Some(a)
          case _ => None
        }
        bys += RawBy(parseExpr(), alias)
        bdone = !tryPunct(",")
      }
      by = nameFields(bys.result().map(r => (r.e, r.alias)))
        .map { case (e, n) => ByField(e, n) }
    }
    val named = {
      val used = scala.collection.mutable.Set[String](by.map(_.name): _*)
      def unique(base: String): String = {
        var cand = base; var i = 1
        while (used.contains(cand)) { cand = s"$base$i"; i += 1 }
        used += cand; cand
      }
      aggs.result().flatMap { ra =>
        ra.agg match {
          // percentiles(f, p1, p2, …) expands to one column per p —
          // Kusto's percentile_f_pN naming, or alias_pN with an alias
          case Aggregation.Percentiles(f, ps) =>
            ps.map { p =>
              val pTxt = if (p == p.floor) p.toLong.toString
              else p.toString.replace('.', '_')
              val base = ra.alias match {
                case Some(a) => s"${a}_$pTxt"
                case None => Aggregation.defaultName(Aggregation.Percentile(f, p))
              }
              AggField(Aggregation.Percentile(f, p), unique(base))
            }
          case a =>
            Seq(AggField(a, unique(ra.alias.getOrElse(Aggregation.defaultName(a)))))
        }
      }
    }
    QueryStep.Summarize(named, by)
  }

  /** `make-series n = count() default = 0 on ts from lo to hi step 1h by k`
    * — aggs parse like summarize's (each with an optional per-agg
    * `default =` literal), the rest is the axis clause. */
  private def parseMakeSeries(): QueryStep = {
    final case class RawAgg(agg: Aggregation, alias: Option[String], dflt: Expr)
    val raw = Seq.newBuilder[RawAgg]
    var done = false
    while (!done) {
      val alias = (peek, toks.lift(p + 1)) match {
        case (Ident(a, _), Some(Punct("=", _))) => p += 2; Some(a)
        case _ => None
      }
      val agg = parseAggCall()
      val dflt = if (tryIdent("default")) { eatPunct("="); parseExpr() }
      else Expr.IntLit(0)
      raw += RawAgg(agg, alias, dflt)
      done = !tryPunct(",")
    }
    eatIdent("on")
    val axis = parseFieldPath()
    val (lo, hi) = if (tryIdent("from")) {
      val l = parseExpr(); eatIdent("to"); val h = parseExpr()
      (Some(l), Some(h))
    } else (None, None)
    eatIdent("step")
    val st = parseExpr()
    var by = Seq.empty[ByField]
    if (tryIdent("by")) {
      final case class RawBy(e: Expr, alias: Option[String])
      val bys = Seq.newBuilder[RawBy]
      var bdone = false
      while (!bdone) {
        val alias = (peek, toks.lift(p + 1)) match {
          case (Ident(a, _), Some(Punct("=", _))) if !reservedWords(a.toLowerCase) =>
            p += 2; Some(a)
          case _ => None
        }
        bys += RawBy(parseExpr(), alias)
        bdone = !tryPunct(",")
      }
      by = nameFields(bys.result().map(r => (r.e, r.alias)))
        .map { case (e, n) => ByField(e, n) }
    }
    val named = {
      val used = scala.collection.mutable.Set[String](
        (by.map(_.name) :+ axis.flat): _*)
      def unique(base: String): String = {
        var cand = base; var i = 1
        while (used.contains(cand)) { cand = s"$base$i"; i += 1 }
        used += cand; cand
      }
      raw.result().map { ra =>
        (AggField(ra.agg,
          unique(ra.alias.getOrElse(Aggregation.defaultName(ra.agg)))), ra.dflt)
      }
    }
    QueryStep.MakeSeries(named, axis, lo, hi, st, by)
  }

  private def parseAggCall(): Aggregation = {
    val name = identText().toLowerCase
    eatPunct("(")
    val agg = name match {
      case "count" => Aggregation.Count
      case "countif" => Aggregation.Countif(parseExpr())
      case "dcount" => Aggregation.DCount(parseFieldPath())
      // Kusto's exact-distinct names (our dcount is already exact)
      case "count_distinct" => Aggregation.DCount(parseFieldPath())
      case "count_distinctif" =>
        val f = parseFieldPath(); eatPunct(",")
        Aggregation.AggIf("dcountif", f, parseExpr())
      case "dcount_approx" => Aggregation.DCountApprox(parseFieldPath())
      case "sum" => Aggregation.Sum(parseFieldPath())
      case "avg" => Aggregation.Avg(parseFieldPath())
      case "min" => Aggregation.Min(parseFieldPath())
      case "max" => Aggregation.Max(parseFieldPath())
      case "percentile" =>
        val f = parseFieldPath()
        eatPunct(",")
        val p = peek match {
          case IntTok(v, _) => next(); v.toDouble
          case FloatTok(v, _) => next(); v
          case t => throw KqlParseException("percentile expects a numeric p", t.pos)
        }
        arity(p >= 0 && p <= 100, "percentile p must be in [0, 100]")
        Aggregation.Percentile(f, p)
      case "make_list" => Aggregation.MakeList(parseFieldPath())
      case "make_set" => Aggregation.MakeSet(parseFieldPath())
      case "make_list_if" =>
        val f = parseFieldPath(); eatPunct(",")
        Aggregation.MakeListIf(f, parseExpr())
      case "make_set_if" =>
        val f = parseFieldPath(); eatPunct(",")
        Aggregation.MakeSetIf(f, parseExpr())
      case "make_list_with_nulls" =>
        Aggregation.MakeListNulls(parseFieldPath())
      case "buildschema" => Aggregation.BuildSchema(parseFieldPath())
      case "make_bag" => Aggregation.MakeBag(parseFieldPath(), None)
      case "make_bag_if" =>
        val f = parseFieldPath(); eatPunct(",")
        Aggregation.MakeBag(f, Some(parseExpr()))
      case k @ ("arg_max" | "arg_min") =>
        val isMax = k == "arg_max"
        val f = parseFieldPath(); eatPunct(",")
        if (atPunct("*")) {
          p += 1
          Aggregation.ArgExtremeRows(isMax, f, Nil)
        } else {
          val rets = Seq.newBuilder[FieldPath]
          rets += parseFieldPath()
          while (tryPunct(",")) rets += parseFieldPath()
          rets.result() match {
            case Seq(one) =>
              if (isMax) Aggregation.ArgMax(f, one)
              else Aggregation.ArgMin(f, one)
            case many => Aggregation.ArgExtremeRows(isMax, f, many)
          }
        }
      case "stdev" => Aggregation.Stdev(parseFieldPath())
      case "variance" => Aggregation.Variance(parseFieldPath())
      case "tdigest" => Aggregation.TDigestA(parseFieldPath())
      case "merge_tdigest" | "tdigest_merge" =>
        Aggregation.TDigestMerge(parseFieldPath())
      case "topk_approx" =>
        val f = parseFieldPath(); eatPunct(",")
        val k = peek match {
          case IntTok(v, _) => next(); v.toInt
          case t => throw KqlParseException(
            "topk_approx expects an integer k", t.pos)
        }
        arity(k > 0, "topk_approx k must be positive")
        Aggregation.TopKApprox(f, k)
      case "topk_accum" => Aggregation.TopKAccum(parseFieldPath())
      case "merge_topk" | "topk_merge" =>
        Aggregation.TopKMerge(parseFieldPath())
      case "stdevp" => Aggregation.StdevP(parseFieldPath())
      case "variancep" => Aggregation.VarianceP(parseFieldPath())
      case k @ ("covariance" | "covariancep") =>
        val a = parseFieldPath(); eatPunct(",")
        Aggregation.Covariance(k.endsWith("p"), a, parseFieldPath())
      case "correlation" =>
        val a = parseFieldPath(); eatPunct(",")
        Aggregation.Correlation(a, parseFieldPath())
      case k @ ("sumif" | "avgif" | "minif" | "maxif" | "dcountif" |
          "take_anyif" | "anyif" | "stdevif" | "varianceif") =>
        val f = parseFieldPath(); eatPunct(",")
        // anyif is ADX's documented alias of take_anyif
        Aggregation.AggIf(if (k == "anyif") "take_anyif" else k, f,
          parseExpr())
      case "take_any" => Aggregation.TakeAny(parseFieldPath())
      case k @ ("binary_all_and" | "binary_all_or" | "binary_all_xor") =>
        Aggregation.BinaryAll(k.stripPrefix("binary_all_"), parseFieldPath())
      case "hll" => Aggregation.Hll(parseFieldPath())
      case "hll_merge" => Aggregation.HllMerge(parseFieldPath())
      case k @ ("percentiles" | "percentiles_array") =>
        val f = parseFieldPath()
        val ps = Seq.newBuilder[Double]
        while (tryPunct(",")) {
          val v = peek match {
            case IntTok(v, _) => next(); v.toDouble
            case FloatTok(v, _) => next(); v
            case t => throw KqlParseException(s"$k expects numeric ps", t.pos)
          }
          arity(v >= 0 && v <= 100, "percentile p must be in [0, 100]")
          ps += v
        }
        val pl = ps.result()
        arity(pl.nonEmpty, s"$k() needs at least one p")
        if (k == "percentiles") Aggregation.Percentiles(f, pl)
        else Aggregation.PercentilesArray(f, pl)
      case "percentilew" =>
        val f = parseFieldPath(); eatPunct(",")
        val w = parseFieldPath(); eatPunct(",")
        val p = peek match {
          case IntTok(v, _) => next(); v.toDouble
          case FloatTok(v, _) => next(); v
          case t => throw KqlParseException("percentilew expects a numeric p", t.pos)
        }
        arity(p >= 0 && p <= 100, "percentile p must be in [0, 100]")
        Aggregation.PercentileW(f, w, p)
      case other => fail(s"unknown aggregation '$other'")
    }
    eatPunct(")")
    agg
  }

  /** Shared head of `union`: modifiers + comma-separated sources. */
  private def parseUnionParts(): (Option[String], Boolean, Boolean, Seq[Query]) = {
    var ws: Option[String] = None
    var fuzzy = false
    var inner = false
    var mods = true
    while (mods) {
      if (atIdent("withsource")) { p += 1; eatPunct("="); ws = Some(identText()) }
      else if (atIdent("isfuzzy")) {
        p += 1; eatPunct("=")
        fuzzy = identText().equalsIgnoreCase("true")
      } else if (atIdent("kind") && toks.lift(p + 1).exists {
          case Punct("=", _) => true; case _ => false }) {
        // kind=outer (default): bag union with null fill;
        // kind=inner: only columns common to all sides survive
        p += 1; eatPunct("=")
        identText().toLowerCase match {
          case "inner" => inner = true
          case "outer" => ()
          case o => fail(s"union kind must be inner or outer, got '$o'")
        }
      } else mods = false
    }
    def one(): Query =
      if (tryPunct("(")) { val q = parsePipeline(); eatPunct(")"); q }
      else Query(Seq(QueryStep.Scan(parseSourceRef())))
    val srcs = Seq.newBuilder[Query]
    srcs += one()
    while (tryPunct(",")) srcs += one()
    (ws, fuzzy, inner, srcs.result())
  }

  private def parseUnion(): QueryStep = {
    // `union T1, T2, …` — trailing sources fold into the branch pipeline
    // as nested unions, preserving per-row provenance for withsource
    val (ws, fuzzy, inner, srcs) = parseUnionParts()
    val combined = srcs.tail.foldLeft(srcs.head) { (acc, q) =>
      Query(acc.steps :+ (QueryStep.Union(q, None, fuzzy, inner): QueryStep))
    }
    QueryStep.Union(combined, ws, fuzzy, inner)
  }

  private def parseJoin(lookup: Boolean = false): QueryStep = {
    // `lookup` is join sugar: default kind leftouter, only
    // leftouter/inner allowed, right key columns dropped, null-key left
    // rows survive unmatched (dimension-enrichment semantics)
    var kind: JoinKind = if (lookup) JoinKind.Left else JoinKind.Inner
    var strategy: Option[String] = None
    while (atIdent("kind") || atIdent("hint")) {
      if (tryIdent("kind")) {
        eatPunct("=")
        kind = identText().toLowerCase match {
          case "inner" => JoinKind.Inner
          case "innerunique" => JoinKind.InnerUnique
          case "outer" | "fullouter" => JoinKind.Outer
          case "left" | "leftouter" => JoinKind.Left
          case "right" | "rightouter" => JoinKind.Right
          case "leftsemi" => JoinKind.LeftSemi
          case "leftanti" | "leftantisemi" => JoinKind.LeftAnti
          case "rightsemi" => JoinKind.RightSemi
          case "rightanti" | "rightantisemi" => JoinKind.RightAnti
          case other => fail(s"unknown join kind '$other'")
        }
      } else {
        eatIdent("hint"); eatPunct(".")
        identText().toLowerCase match {
          // hint.strategy=broadcast|shuffle — the user's physical-join
          // choice, honored via Spark join hints
          case "strategy" =>
            eatPunct("=")
            identText().toLowerCase match {
              case s @ ("broadcast" | "shuffle") => strategy = Some(s)
              case other => fail(
                s"unknown join strategy '$other' (broadcast | shuffle)")
            }
          // hint.num_partitions / hint.shufflekey / … — accepted and
          // ignored: Spark's shuffle partitioning and AQE skew handling
          // supersede manual partition hints
          case _ => eatPunct("="); next()
        }
      }
    }
    eatPunct("(")
    val sub = parsePipeline()
    eatPunct(")")
    eatIdent("on")
    // one or more comma-separated pairs: `$left.a == $right.b` | bare `f`
    def keyPair(): (FieldPath, FieldPath) =
      if (tryPunct("$")) {
        val side1 = identText()
        eatPunct(".")
        val lk = parseFieldPath()
        eatPunct("==")
        eatPunct("$")
        val side2 = identText()
        eatPunct(".")
        val rk = parseFieldPath()
        // reference validation: the condition must compare the two sides,
        // not e.g. $left against $left
        if (!side1.equalsIgnoreCase("left") || !side2.equalsIgnoreCase("right"))
          fail("join condition must compare $left.<field> == $right.<field>",
            Seq("$left", "$right"))
        (lk, rk)
      } else {
        val f = parseFieldPath()
        (f, f)
      }
    val keys = Seq.newBuilder[(FieldPath, FieldPath)]
    keys += keyPair()
    while (tryPunct(",")) keys += keyPair()
    if (lookup && kind != JoinKind.Left && kind != JoinKind.Inner)
      fail("lookup allows kind=leftouter (default) or kind=inner only")
    QueryStep.Join(kind, sub, keys.result(), lookup, strategy)
  }

  // ───────────────────────── expressions ─────────────────────────

  private val reservedWords = Set(
    "and", "or", "not", "in", "between", "contains", "startswith",
    "endswith", "has", "has_cs", "by", "asc", "desc", "nulls", "on", "kind")

  def parseExpr(): Expr = parseOr()

  private def parseOr(): Expr = {
    var l = parseAnd()
    while (atIdent("or")) { p += 1; l = Or(l, parseAnd()) }
    l
  }

  private def parseAnd(): Expr = {
    var l = parsePred()
    while (atIdent("and")) { p += 1; l = And(l, parsePred()) }
    l
  }

  private def parsePred(): Expr = {
    val l = parseAdd()
    peek match {
      case Punct(op @ ("==" | "!=" | "<" | "<=" | ">" | ">="), _) =>
        p += 1
        Cmp(op, l, parseAdd())
      // case-insensitive string equality (real-KQL =~ / !~)
      case Punct("=~", _) => p += 1; StrOp("=~", l, parseAdd(), negated = false)
      case Punct("!~", _) => p += 1; StrOp("=~", l, parseAdd(), negated = true)
      case Punct("!", _) =>
        // negated predicate: !in / !between / !contains / !has …
        p += 1
        parsePredTail(l, negated = true)
      case Ident(w, _) if predWords(w.toLowerCase) =>
        parsePredTail(l, negated = false)
      case _ => l
    }
  }

  private val predWords = Set(
    "in", "between", "contains", "startswith", "endswith", "has", "has_cs",
    "contains_cs", "startswith_cs", "endswith_cs",
    "matches", "has_any", "has_all")

  private def parsePredTail(l: Expr, negated: Boolean): Expr = {
    val w = identText().toLowerCase
    w match {
      case "in" =>
        // `in~` is the case-insensitive variant: desugar to =~ disjunction
        val ci = tryPunct("~")
        val items = parseExprList()
        if (ci) {
          val ors = items
            .map(it => StrOp("=~", l, it, negated = false): Expr)
            .reduce((a, b) => Or(a, b))
          if (negated) Not(ors) else ors
        } else In(l, items, negated)
      case "between" =>
        eatPunct("(")
        val lo = parseAdd()
        eatPunct("..")
        val hi = parseAdd()
        eatPunct(")")
        Between(l, lo, hi, negated)
      case "contains" | "startswith" | "endswith" | "has" | "has_cs" =>
        // has/has_cs require a literal phrase: a let-bound literal is
        // usable there (no column ref could be), so look through LetRef
        StrOp(w, l, delit(parseAdd()), negated)
      // explicit case-sensitive aliases: the base forms already follow the
      // reference's case-sensitive semantics, so these are spelled-out
      // synonyms (documented deviation from Azure KQL's ci base forms)
      case "contains_cs" | "startswith_cs" | "endswith_cs" =>
        StrOp(w.stripSuffix("_cs"), l, delit(parseAdd()), negated)
      case "matches" =>
        eatIdent("regex")
        StrOp("matches_regex", l, delit(parseAdd()), negated)
      // any/all of a phrase list: desugars to a has disjunction/conjunction
      case w2 @ ("has_any" | "has_all") =>
        val items = parseExprList()
        arity(items.forall(_.isInstanceOf[StrLit]),
          s"$w2 takes string literal phrases")
        val preds = items
          .map(it => StrOp("has", l, it, negated = false): Expr)
        val combined =
          if (w2 == "has_any") preds.reduce((a, b) => Or(a, b))
          else preds.reduce((a, b) => And(a, b))
        if (negated) Not(combined) else combined
      case other => fail(s"unknown predicate '$other'")
    }
  }

  /** Parenthesized comma-separated expression list: `(e1, e2, …)`. */
  private def parseExprList(): Seq[Expr] = {
    eatPunct("(")
    val items = Seq.newBuilder[Expr]
    var done = false
    while (!done) { items += parseExpr(); done = !tryPunct(",") }
    eatPunct(")")
    items.result()
  }

  private def parseAdd(): Expr = {
    var l = parseMul()
    var loop = true
    while (loop) {
      if (atPunct("+")) { p += 1; l = Arith("+", l, parseMul()) }
      else if (atPunct("-")) { p += 1; l = Arith("-", l, parseMul()) }
      else loop = false
    }
    l
  }

  private def parseMul(): Expr = {
    var l = parseUnary()
    var loop = true
    while (loop) {
      if (atPunct("*")) { p += 1; l = Arith("*", l, parseUnary()) }
      else if (atPunct("/")) { p += 1; l = Arith("/", l, parseUnary()) }
      else if (atPunct("%")) { p += 1; l = Arith("%", l, parseUnary()) }
      else loop = false
    }
    l
  }

  private def parseUnary(): Expr =
    if (tryPunct("-")) parseUnary() match {
      // fold negation into numeric literals so `-73.75` IS a literal
      case IntLit(v) => IntLit(-v)
      case FloatLit(v) => FloatLit(-v)
      case TimespanLit(m) => TimespanLit(-m)
      case other => Neg(other)
    }
    else parsePrimary()

  private def parsePrimary(): Expr = peek match {
    case IntTok(v, _) => p += 1; IntLit(v)
    case FloatTok(v, _) => p += 1; FloatLit(v)
    case StrTok(v, _) => p += 1; StrLit(v)
    case TimespanTok(v, _) => p += 1; TimespanLit(v)
    case DatetimeTok(v, _) => p += 1; DatetimeLit(v)
    case Punct("(", _) => p += 1; val e = parseExpr(); eatPunct(")"); e
    case Ident(w, _) =>
      w.toLowerCase match {
        case "true" => p += 1; BoolLit(true)
        case "false" => p += 1; BoolLit(false)
        case "null" => p += 1; NullLit
        case _ if toks.lift(p + 1).exists(t => t.isInstanceOf[Punct] &&
            t.asInstanceOf[Punct].s == "(") && funcWords(w.toLowerCase) =>
          parseFuncCall()
        case _ if toks.lift(p + 1).exists(t => t.isInstanceOf[Punct] &&
            t.asInstanceOf[Punct].s == "(") && funcLets.contains(w) =>
          parseFuncLetCall()
        case _ =>
          val fp = parseFieldPath()
          // function-let PARAMETERS shadow everything (innermost scope —
          // they only exist during a body re-parse); scalar lets defer to
          // the compiler's column-over-let precedence via LetRef. Only
          // simple refs — `x.y` always means a field
          if (fp.isSimple && paramEnv.contains(fp.simpleName))
            paramEnv(fp.simpleName)
          else if (fp.isSimple && scalarLets.contains(fp.simpleName))
            LetRef(fp, scalarLets(fp.simpleName))
          else Field(fp)
      }
    case t => throw KqlParseException("expected expression", t.pos)
  }

  private val funcWords = Set(
    "not", "case", "iff", "iif", "extract", "bin", "floor", "exists", "now",
    "toscalar",
    "ago", "datetime", "strcat", "tostring", "toint", "tolong", "toreal",
    "todouble", "todecimal", "tobool", "toboolean",
    "todatetime", "totimespan",
    "tokencount", "simhash", "fingerprint", "langid",
    "strlen", "tolower", "toupper", "trim", "substring", "replace_string",
    "startofday", "startofhour", "hourofday", "dayofmonth", "monthofyear",
    "startofweek", "startofmonth", "startofyear", "endofday", "dayofweek",
    "weekofyear", "datetime_diff", "datetime_add", "format_datetime",
    "isnull", "isnotnull", "isempty", "isnotempty", "coalesce",
    "abs", "round", "exp", "log", "log10", "log2", "sqrt", "pow", "sign",
    "sin", "cos", "tan", "asin", "acos", "atan", "atan2", "cot",
    "degrees", "radians", "ceiling", "exp2", "exp10", "pi",
    "binary_and", "binary_or", "binary_xor", "binary_not",
    "binary_shift_left", "binary_shift_right", "bitset_count_ones",
    "split", "indexof", "array_length", "strcat_delim", "strcat_array",
    "row_number", "prev", "next", "row_cumsum",
    "row_rank_dense", "row_rank_min", "row_window_session",
    "countof", "extract_all", "extract_groups", "bin_at", "tohex",
    "base64_encode_tostring", "base64_decode_tostring",
    "todynamic", "parse_json",
    "array_sort_asc", "array_sort_desc", "array_reverse", "array_concat",
    "array_slice", "array_index_of", "array_sum",
    "getyear", "getmonth", "dayofyear", "startofquarter", "endofweek",
    "endofmonth", "endofyear", "endofquarter", "datetime_part",
    "datetime_utc_to_local", "datetime_local_to_utc",
    "bag_merge", "bag_remove_keys", "bag_zip",
    "gzip_compress_to_base64_string", "gzip_decompress_from_base64_string",
    "zlib_compress_to_base64_string", "zlib_decompress_from_base64_string",
    "extract_json", "parse_path", "has_any_index",
    "geo_distance_2points", "geo_point_in_circle", "geo_point_in_polygon",
    "geo_geohash", "geo_point_to_geohash", "geo_line_length",
    "geo_polygon_perimeter",
    "geo_polygon_area",
    "geo_geohash_to_central_point",
    "parse_ipv6", "ipv6_compare", "ipv6_is_match", "ipv6_is_in_range",
    "format_timespan",
    "array_shift_left", "array_shift_right", "array_rotate_left",
    "array_rotate_right", "array_iff",
    "min_of", "max_of", "isnan", "isinf", "isfinite",
    "repeat", "zip", "range", "set_has_element", "bag_has_key",
    "parse_version", "column_ifexists", "parse_url", "translate", "strcmp",
    "gettype",
    "make_datetime", "make_timespan", "unixtime_seconds_todatetime",
    "unixtime_milliseconds_todatetime", "unixtime_microseconds_todatetime",
    "unixtime_nanoseconds_todatetime",
    "hash_sha256", "hash_sha1", "hash_md5", "toguid", "isascii",
    "unicode_codepoints_from_string", "unicode_codepoints_to_string",
    "base64_decode_toarray", "base64_encode_fromarray",
    "ipv4_compare", "ipv4_is_match", "ipv4_netmask_suffix",
    "format_ipv4_mask", "jaccard_index", "dynamic_to_json", "bag_set_key",
    "parse_xml", "treepath", "replace_regex", "has_ipv4",
    "reverse", "strrep", "trim_start", "trim_end",
    "indexof_regex", "string_size", "regex_quote", "parse_csv",
    "url_encode", "url_encode_component", "url_decode",
    "parse_ipv4", "format_ipv4", "ipv4_is_in_range", "ipv4_is_private",
    "ipv4_is_in_any_range", "has_any_ipv4", "has_ipv4_prefix",
    "replace_strings", "punycode_domain_from_string",
    "punycode_domain_to_string", "parse_user_agent",
    "parse_ipv6_mask",
    "erf", "erfc", "gamma", "loggamma", "parse_urlquery", "welch_test",
    "around", "assert", "array_iif", "bag_pack_columns",
    "estimate_data_size", "to_utf8", "has_any_ipv4_prefix", "rand",
    "new_guid",
    "convert_length", "convert_mass", "convert_speed", "convert_volume",
    "convert_energy", "convert_angle", "convert_force",
    "convert_temperature",
    "hash",
    "series_add", "series_subtract", "series_multiply", "series_divide",
    "series_abs", "series_sum", "series_min", "series_max", "series_avg",
    "series_fir", "dcount_hll", "hll_merge", "series_stats_dynamic",
    "series_exp", "series_log", "series_sign", "series_floor",
    "series_ceiling", "series_pow", "series_greater", "series_less",
    "series_greater_equals", "series_less_equals", "series_equals",
    "series_not_equals", "series_dot_product", "series_magnitude",
    "series_cosine_similarity", "series_pearson_correlation",
    "series_fit_line_dynamic", "series_fit_2lines_dynamic",
    "series_seasonal", "series_iir",
    "series_decompose", "series_decompose_anomalies", "series_periods_detect",
    "series_decompose_forecast", "series_stats", "series_fit_line",
    "series_fit_2lines", "series_fft", "series_ifft",
    "series_fill_const", "series_fill_forward", "series_fill_backward",
    "series_fill_linear",
    "percentile_tdigest", "topk_estimate", "series_outliers",
    "array_split", "format_bytes",
    "set_union", "set_intersect", "set_difference",
    "pack_array", "bag_keys", "bag_pack", "pack", "pack_all")

  private def arity(cond: Boolean, msg: String): Unit =
    if (!cond) fail(msg)

  /** Expand a function-let call: parse the arguments in the CALLER's
    * scope, then re-parse the stored body token range with the params
    * bound to those argument expressions. The result is an ordinary Expr
    * tree — downstream (compiler, pushdown, render) never sees functions. */
  private def parseFuncLetCall(): Expr = {
    val name = identText()
    val (params, bodyStart, bodyEnd) = funcLets(name)
    eatPunct("(")
    val args = Seq.newBuilder[Expr]
    if (!atPunct(")")) {
      var done = false
      while (!done) { args += parseExpr(); done = !tryPunct(",") }
    }
    eatPunct(")")
    val a = args.result()
    arity(a.length == params.length,
      s"$name() takes ${params.length} argument(s), got ${a.length}")
    if (funcDepth >= 32)
      fail(s"function let '$name' expands too deep — recursion is not supported")
    val savedP = p
    val savedEnv = paramEnv
    p = bodyStart
    paramEnv = paramEnv ++ params.zip(a)
    funcDepth += 1
    val e = try parseExpr()
    finally { paramEnv = savedEnv; funcDepth -= 1 }
    if (p != bodyEnd)
      fail(s"function let '$name' body did not re-parse to the same extent")
    p = savedP
    e
  }

  private def parseFuncCall(): Expr = {
    val name = identText().toLowerCase
    eatPunct("(")
    // toscalar takes a TABULAR argument — a pipeline, not an expression
    if (name == "toscalar") {
      val q = parsePipeline()
      eatPunct(")")
      return ToScalar(q)
    }
    def args(): Seq[Expr] = {
      val out = Seq.newBuilder[Expr]
      if (!atPunct(")")) {
        var done = false
        while (!done) { out += parseExpr(); done = !tryPunct(",") }
      }
      // literal-bound lets unwrap inside function arguments so the many
      // literal-required positions (widths, offsets, delimiters, regexes)
      // keep accepting them; non-literal lets stay deferred (LetRef), so
      // column-over-let precedence is preserved wherever it can matter
      out.result().map(delit)
    }
    val e: Expr = name match {
      case "not" =>
        val a = args(); arity(a.length == 1, "not() takes 1 arg"); Not(a.head)
      case "iff" | "iif" =>
        val a = args(); arity(a.length == 3, "iff() takes 3 args")
        Case(Seq((a(0), a(1))), a(2))
      case "case" =>
        val a = args()
        arity(a.length >= 3 && a.length % 2 == 1,
          "case() takes cond,val pairs + default")
        Case(a.dropRight(1).grouped(2).map(g => (g(0), g(1))).toSeq, a.last)
      case "extract" =>
        // 4-arg Kusto form: a trailing typeof(T) casts the capture
        val a0 = Seq.newBuilder[Expr]
        if (!atPunct(")")) {
          var done = false
          while (!done) {
            if (atIdent("typeof")) {
              p += 1; eatPunct("(")
              val t = identText().toLowerCase
              eatPunct(")")
              a0 += StrLit("typeof:" + t)
            } else a0 += parseExpr()
            done = !tryPunct(",")
          }
        }
        val a = a0.result().map(delit)
        arity(a.length == 3 || a.length == 4,
          "extract() takes (regex, group, source[, typeof(T)])")
        val base = (a(0), a(1)) match {
          case (StrLit(re), IntLit(g)) => Extract(re, g.toInt, a(2))
          case _ => fail("extract(regex_literal, group_literal, expr)")
        }
        a.lift(3) match {
          case None => base
          case Some(StrLit(t)) if t.startsWith("typeof:") =>
            val kind = t.stripPrefix("typeof:") match {
              case "int" | "long" => "tolong"
              case "real" | "double" | "decimal" => "toreal"
              case "bool" | "boolean" => "tobool"
              case "datetime" => "todatetime"
              case "timespan" => "totimespan"
              case "string" => "tostring"
              case other => fail(s"extract() unsupported typeof($other)")
            }
            Cast(kind, base)
          case _ => fail("extract() 4th arg must be typeof(T)")
        }
      case "extract_groups" =>
        val a = args()
        arity(a.length == 2, "extract_groups() takes (regex_literal, source)")
        arity(a.head.isInstanceOf[StrLit],
          "extract_groups() regex must be a literal")
        StrFn("extract_groups", a)
      case "bin" | "floor" =>
        val a = args(); arity(a.length == 2, "bin() takes 2 args"); Bin(a(0), a(1))
      case "exists" =>
        val a = args(); arity(a.length == 1, "exists() takes 1 arg"); Exists(a.head)
      case "now" =>
        val a = args()
        if (a.isEmpty) DatetimeLit(nowMicros)
        else a.head match {
          case TimespanLit(t) => DatetimeLit(nowMicros + t)
          case Neg(TimespanLit(t)) => DatetimeLit(nowMicros - t)
          case _ => fail("now() offset must be a timespan literal")
        }
      case "ago" =>
        val a = args()
        a.head match {
          case TimespanLit(t) => DatetimeLit(nowMicros - t)
          case _ => fail("ago() takes a timespan literal")
        }
      case "datetime" =>
        // raw-ish datetime: accept a string literal or bare ISO tokens;
        // re-read the raw source slice up to the matching ')'.
        val startTok = peek
        peek match {
          case StrTok(s, _) =>
            p += 1
            DatetimeLit(parseDatetime(s.trim, startTok.pos))
          // datetime(null) is the null literal (parser_tests.rs:945)
          case Ident(w, _) if w.equalsIgnoreCase("null") => p += 1; NullLit
          case _ =>
            val start = startTok.pos
            var depth = 0
            var endPos = start
            var scanning = true
            while (scanning) {
              peek match {
                case Punct("(", _) => depth += 1; p += 1
                case Punct(")", _) if depth == 0 => endPos = peek.pos; scanning = false
                case Punct(")", _) => depth -= 1; p += 1
                case Eof(_) => fail("unterminated datetime()")
                case _ => p += 1
              }
            }
            DatetimeLit(parseDatetime(src.substring(start, endPos).trim, start))
        }
      case "strcat" => StrCat(args())
      case f @ ("tokencount" | "simhash" | "fingerprint" | "langid") =>
        val a = args(); arity(a.length == 1, s"$f() takes 1 arg")
        TextFn(f, a.head)
      case f @ ("strlen" | "tolower" | "toupper" | "reverse") =>
        val a = args(); arity(a.length == 1, s"$f() takes 1 arg")
        StrFn(f, a)
      // Kusto trim family: (regex_literal, source) removes one anchored
      // match; plain trim(source) (whitespace) kept as a convenience alias
      case "trim" =>
        val a = args()
        arity(a.length == 1 || a.length == 2,
          "trim() takes (source) or (regex_literal, source)")
        if (a.length == 2) {
          arity(a.head.isInstanceOf[StrLit], "trim() regex must be a literal")
          StrFn("trim_re", a)
        } else StrFn("trim", a)
      case f @ ("trim_start" | "trim_end") =>
        val a = args()
        arity(a.length == 2, s"$f() takes (regex_literal, source)")
        arity(a.head.isInstanceOf[StrLit], s"$f() regex must be a literal")
        StrFn(f, a)
      case "strrep" =>
        val a = args()
        arity(a.length == 2 || a.length == 3,
          "strrep() takes (value, multiplier[, delimiter])")
        StrFn("strrep", a)
      case "indexof_regex" =>
        val a = args()
        arity(a.length == 2, "indexof_regex() takes (source, regex)")
        arity(a(1).isInstanceOf[StrLit],
          "indexof_regex() regex must be a literal")
        StrFn("indexof_regex", a)
      case f @ ("string_size" | "regex_quote" | "parse_csv" |
          "url_encode" | "url_encode_component" | "url_decode" |
          "gzip_compress_to_base64_string" |
          "gzip_decompress_from_base64_string" |
          "zlib_compress_to_base64_string" |
          "zlib_decompress_from_base64_string" | "parse_path") =>
        val a = args(); arity(a.length == 1, s"$f() takes 1 arg")
        StrFn(f, a)
      case "extract_json" =>
        val a = args()
        arity(a.length == 2, "extract_json() takes (jsonPath, source)")
        arity(a.head.isInstanceOf[StrLit],
          "extract_json() path must be a string literal")
        StrFn("extract_json", a)
      case "has_any_index" =>
        val a = args()
        arity(a.length == 2, "has_any_index() takes (source, values)")
        StrFn("has_any_index", a)
      case "geo_distance_2points" =>
        val a = args()
        arity(a.length == 4,
          "geo_distance_2points() takes (lon1, lat1, lon2, lat2)")
        MathFn("geo_distance_2points", a)
      case "geo_point_in_circle" =>
        val a = args()
        arity(a.length == 5,
          "geo_point_in_circle() takes (lon, lat, c_lon, c_lat, radius)")
        MathFn("geo_point_in_circle", a)
      case f @ ("geo_line_length" | "geo_polygon_perimeter" |
                "geo_polygon_area") =>
        val a = args(); arity(a.length == 1, s"$f() takes 1 arg")
        ArrFn(f, a)
      case "geo_point_in_polygon" =>
        val a = args()
        arity(a.length == 3,
          "geo_point_in_polygon() takes (lon, lat, polygon_literal)")
        arity(a(2).isInstanceOf[StrLit],
          "geo_point_in_polygon() polygon must be a string literal " +
            "(GeoJSON)")
        MathFn("geo_point_in_polygon", a)
      case "geo_geohash" | "geo_point_to_geohash" =>
        val a = args()
        arity(a.length == 2 || a.length == 3,
          "geo_point_to_geohash() takes (lon, lat[, precision])")
        arity(a.lift(2).forall(_.isInstanceOf[IntLit]),
          "geo_geohash() precision must be an int literal")
        StrFn("geo_geohash", a)
      case "geo_geohash_to_central_point" =>
        val a = args()
        arity(a.length == 1, "geo_geohash_to_central_point() takes 1 arg")
        StrFn("geo_geohash_to_central_point", a)
      case "parse_ipv6" =>
        val a = args(); arity(a.length == 1, "parse_ipv6() takes 1 arg")
        StrFn("parse_ipv6", a)
      case f @ ("ipv6_compare" | "ipv6_is_in_range") =>
        val a = args(); arity(a.length == 2, s"$f() takes 2 args")
        StrFn(f, a)
      case "ipv6_is_match" =>
        val a = args()
        arity(a.length == 2 || a.length == 3,
          "ipv6_is_match() takes (ip1, ip2[, prefix])")
        arity(a.lift(2).forall(_.isInstanceOf[IntLit]),
          "ipv6_is_match() prefix must be an int literal")
        StrFn("ipv6_is_match", a)
      case "format_timespan" =>
        val a = args()
        arity(a.length == 2, "format_timespan() takes (timespan, format)")
        arity(a(1).isInstanceOf[StrLit],
          "format_timespan() format must be a string literal")
        StrFn("format_timespan", a)
      case f @ ("parse_ipv4" | "ipv4_is_private" | "format_ipv4") =>
        val a = args(); arity(a.length == 1, s"$f() takes 1 arg")
        StrFn(f, a)
      case "ipv4_is_in_range" =>
        val a = args()
        arity(a.length == 2, "ipv4_is_in_range() takes (ip, range)")
        StrFn("ipv4_is_in_range", a)
      case "hash" =>
        val a = args()
        arity(a.length == 1 || a.length == 2, "hash() takes (value[, mod])")
        StrFn("hash", a)
      case "parse_version" =>
        val a = args(); arity(a.length == 1, "parse_version() takes 1 arg")
        StrFn("parse_version", a)
      case "parse_url" =>
        val a = args(); arity(a.length == 1, "parse_url() takes 1 arg")
        StrFn("parse_url", a)
      case "translate" =>
        val a = args()
        arity(a.length == 3,
          "translate() takes (search_list, replacement_list, source)")
        arity(a.take(2).forall(_.isInstanceOf[StrLit]),
          "translate() search/replacement lists must be string literals")
        StrFn("translate", a)
      case "strcmp" =>
        val a = args(); arity(a.length == 2, "strcmp() takes (s1, s2)")
        StrFn("strcmp", a)
      // calendar constructor: (y, m, d [, hour [, minute [, second]]]);
      // Kusto's second accepts a fractional real
      case "make_datetime" =>
        val a = args()
        arity(a.length >= 3 && a.length <= 6,
          "make_datetime() takes (year, month, day[, hour[, minute[, second]]])")
        StrFn("make_datetime", a)
      // timespan constructor: (h, m) | (h, m, s) | (d, h, m, s)
      case "make_timespan" =>
        val a = args()
        arity(a.length >= 2 && a.length <= 4,
          "make_timespan() takes (hour, minute[, second]) or (day, hour, minute, second)")
        StrFn("make_timespan", a)
      case f @ ("unixtime_seconds_todatetime" |
                "unixtime_milliseconds_todatetime" |
                "unixtime_microseconds_todatetime" |
                "unixtime_nanoseconds_todatetime") =>
        val a = args(); arity(a.length == 1, s"$f() takes 1 arg")
        StrFn(f, a)
      case f @ ("hash_sha256" | "hash_sha1" | "hash_md5" | "toguid" |
                "isascii" | "unicode_codepoints_from_string" |
                "base64_decode_toarray" | "base64_encode_fromarray" |
                "punycode_domain_from_string" |
                "punycode_domain_to_string") =>
        val a = args(); arity(a.length == 1, s"$f() takes 1 arg")
        StrFn(f, a)
      case f @ ("ipv4_compare" | "ipv4_is_match") =>
        val a = args()
        arity(a.length == 2 || a.length == 3,
          s"$f() takes (ip1, ip2[, prefix])")
        StrFn(f, a)
      case "parse_ipv6_mask" =>
        val a = args()
        arity(a.length == 2, "parse_ipv6_mask() takes (ip, prefix)")
        StrFn("parse_ipv6_mask", a)
      case f @ ("erf" | "erfc" | "gamma" | "loggamma" | "parse_urlquery") =>
        val a = args(); arity(a.length == 1, s"$f() takes 1 arg")
        StrFn(f, a)
      case "around" =>
        val a = args()
        arity(a.length == 3, "around() takes (value, center, delta)")
        StrFn("around", a)
      case "assert" =>
        val a = args()
        arity(a.length == 2, "assert() takes (condition, message)")
        StrFn("assert", a)
      case "array_iif" => // documented alias of array_iff
        val a = args()
        arity(a.length == 3,
          "array_iif() takes (condition_array, when_true, when_false)")
        ArrFn("array_iff", a)
      case "bag_pack_columns" =>
        val a = args()
        arity(a.length >= 1, "bag_pack_columns() takes 1+ columns")
        arity(a.forall(_.isInstanceOf[Expr.Field]),
          "bag_pack_columns() arguments must be column references")
        ArrFn("bag_pack_columns", a)
      case "to_utf8" =>
        val a = args(); arity(a.length == 1, "to_utf8() takes 1 arg")
        StrFn("to_utf8", a)
      case "has_any_ipv4_prefix" =>
        val a = args()
        arity(a.length >= 2,
          "has_any_ipv4_prefix() takes (source, prefix1[, ...])")
        StrFn("has_any_ipv4_prefix", a)
      case "rand" =>
        val a = args()
        arity(a.length <= 1, "rand() takes 0 or 1 args")
        StrFn("rand", a)
      case "new_guid" =>
        val a = args(); arity(a.isEmpty, "new_guid() takes no arguments")
        StrFn("new_guid", a)
      case "welch_test" =>
        val a = args()
        arity(a.length == 6,
          "welch_test() takes (mean1, variance1, count1, mean2, variance2, count2)")
        StrFn("welch_test", a)
      case f @ ("ipv4_netmask_suffix" | "dynamic_to_json" | "parse_xml" |
                "treepath") =>
        val a = args(); arity(a.length == 1, s"$f() takes 1 arg")
        StrFn(f, a)
      case "format_ipv4_mask" =>
        val a = args()
        arity(a.length == 2, "format_ipv4_mask() takes (ip, prefix)")
        StrFn("format_ipv4_mask", a)
      case "jaccard_index" =>
        val a = args()
        arity(a.length == 2, "jaccard_index() takes (set1, set2)")
        ArrFn("jaccard_index", a)
      case "bag_set_key" =>
        val a = args()
        arity(a.length == 3, "bag_set_key() takes (bag, key, value)")
        ArrFn("bag_set_key", a)
      // variadic like Kusto: each arg is a codepoint or an array of them
      case "unicode_codepoints_to_string" =>
        val a = args()
        arity(a.nonEmpty, "unicode_codepoints_to_string() takes 1+ args")
        StrFn("unicode_codepoints_to_string", a)
      case "gettype" =>
        val a = args(); arity(a.length == 1, "gettype() takes 1 arg")
        StrFn("gettype", a)
      case "replace_regex" =>
        val a = args()
        arity(a.length == 3,
          "replace_regex() takes (source, regex_literal, rewrite_literal)")
        arity(a(1).isInstanceOf[StrLit] && a(2).isInstanceOf[StrLit],
          "replace_regex() pattern and rewrite must be string literals")
        StrFn("replace_regex", a)
      case "has_ipv4" =>
        // 1-arg convenience form ("contains ANY valid ipv4 token") or
        // ADX's 2-arg (source, ip) delimited-term check
        val a = args()
        arity(a.length == 1 || a.length == 2,
          "has_ipv4() takes (source[, ip])")
        StrFn("has_ipv4", a)
      case "has_any_ipv4" =>
        val a = args()
        arity(a.length >= 2, "has_any_ipv4() takes (source, ip, ...)")
        StrFn("has_any_ipv4", a)
      case "has_ipv4_prefix" =>
        val a = args()
        arity(a.length == 2, "has_ipv4_prefix() takes (source, prefix)")
        StrFn("has_ipv4_prefix", a)
      case "ipv4_is_in_any_range" =>
        val a = args()
        arity(a.length >= 2,
          "ipv4_is_in_any_range() takes (ip, range, ...)")
        StrFn("ipv4_is_in_any_range", a)
      case "replace_strings" =>
        val a = args()
        arity(a.length == 3,
          "replace_strings() takes (text, lookups, rewrites)")
        StrFn("replace_strings", a)
      case "parse_user_agent" =>
        val a = args()
        arity(a.length == 1 || a.length == 2,
          "parse_user_agent() takes (ua[, 'browser'|'os'])")
        StrFn("parse_user_agent", a)
      case f @ ("convert_length" | "convert_mass" | "convert_speed" |
                "convert_volume" | "convert_energy" | "convert_angle" |
                "convert_force" | "convert_temperature") =>
        val a = args()
        arity(a.length == 3, s"$f() takes (value, from, to)")
        val cat = f.stripPrefix("convert_")
        val units =
          if (cat == "temperature")
            graft.functions.UnitConvert.temperatureUnits
          else graft.functions.UnitConvert.factors(cat).keySet
        Seq(a(1), a(2)).foreach {
          case StrLit(u) => arity(units.contains(u),
            s"$f(): unknown unit '$u' (known: " +
              units.toSeq.sorted.mkString(", ") + ")")
          case _ => fail(s"$f() units must be string literals")
        }
        StrFn(f, a)
      case "column_ifexists" =>
        val a = args()
        arity(a.length == 2,
          "column_ifexists() takes (column_name, default)")
        val nm = a.head match {
          case StrLit(s) => s
          case Field(fp) if fp.isSimple => fp.simpleName
          case LetRef(fp, _) if fp.isSimple => fp.simpleName
          case _ => fail(
            "column_ifexists() column name must be an identifier or string literal")
        }
        ColumnIfExists(nm, a(1))
      case "substring" =>
        val a = args()
        arity(a.length == 2 || a.length == 3,
          "substring() takes (source, start[, length])")
        StrFn("substring", a)
      case "replace_string" =>
        val a = args()
        arity(a.length == 3, "replace_string() takes (source, lookup, rewrite)")
        StrFn("replace_string", a)
      case f @ ("startofday" | "startofhour" | "hourofday" | "dayofmonth" |
                "monthofyear" | "startofweek" | "startofmonth" |
                "startofyear" | "endofday" | "dayofweek" | "weekofyear" |
                "getyear" | "getmonth" | "dayofyear" | "startofquarter" |
                "endofweek" | "endofmonth" | "endofyear" | "endofquarter") =>
        val a = args()
        val periodOffsets = Map(
          "startofday" -> "day", "startofweek" -> "week",
          "startofmonth" -> "month", "startofquarter" -> "quarter",
          "startofyear" -> "year", "endofday" -> "day",
          "endofweek" -> "week", "endofmonth" -> "month",
          "endofquarter" -> "quarter", "endofyear" -> "year",
          "startofhour" -> "hour")
        if (a.length == 2 && periodOffsets.contains(f)) {
          // Kusto's offset arg: startofday(ts, -1) = start of the
          // PREVIOUS day — desugar by shifting the input by n periods
          // (calendar-aware via datetime_add; weeks are 7 exact days)
          val n = a(1) match {
            case IntLit(v) => v
            case Neg(IntLit(v)) => -v
            case _ => fail(s"$f() offset must be an integer literal")
          }
          val shifted = periodOffsets(f) match {
            case "week" => DtAdd("day", IntLit(7 * n), a.head)
            case "quarter" => DtAdd("month", IntLit(3 * n), a.head)
            case p => DtAdd(p, IntLit(n), a.head)
          }
          DtFn(f, shifted)
        } else {
          arity(a.length == 1, s"$f() takes 1 arg")
          DtFn(f, a.head)
        }
      case "datetime_part" =>
        val a = args()
        arity(a.length == 2, "datetime_part() takes (part_literal, datetime)")
        val part = a.head match {
          case StrLit(s) => s.toLowerCase
          case _ => fail("datetime_part() part must be a string literal")
        }
        arity(Set("year", "quarter", "month", "week_of_year", "day",
          "dayofyear", "hour", "minute", "second", "millisecond",
          "microsecond")(part), s"datetime_part: unknown part '$part'")
        DtFn(s"part_$part", a(1))
      case f @ ("datetime_utc_to_local" | "datetime_local_to_utc") =>
        val a = args()
        arity(a.length == 2, s"$f() takes (datetime, timezone_literal)")
        arity(a(1).isInstanceOf[StrLit],
          s"$f() timezone must be a string literal")
        StrFn(f, a)
      case "datetime_diff" =>
        val a = args()
        arity(a.length == 3, "datetime_diff() takes (period, dt1, dt2)")
        a.head match {
          case StrLit(p) if Set("year", "month", "day", "hour", "minute",
              "second").contains(p.toLowerCase) =>
            DtDiff(p.toLowerCase, a(1), a(2))
          case _ => fail(
            "datetime_diff period must be one of 'year' 'month' 'day' " +
              "'hour' 'minute' 'second'")
        }
      case "datetime_add" =>
        val a = args()
        arity(a.length == 3, "datetime_add() takes (period, n, dt)")
        a.head match {
          case StrLit(p) if Set("year", "month", "day", "hour", "minute",
              "second").contains(p.toLowerCase) =>
            DtAdd(p.toLowerCase, a(1), a(2))
          case _ => fail(
            "datetime_add period must be one of 'year' 'month' 'day' " +
              "'hour' 'minute' 'second'")
        }
      case "format_datetime" =>
        val a = args()
        arity(a.length == 2, "format_datetime() takes (dt, format)")
        arity(a(1).isInstanceOf[StrLit],
          "format_datetime() format must be a string literal")
        StrFn("format_datetime", a)
      case f @ ("isnull" | "isnotnull" | "isempty" | "isnotempty") =>
        val a = args(); arity(a.length == 1, s"$f() takes 1 arg")
        NullFn(f, a)
      case "coalesce" =>
        val a = args(); arity(a.length >= 2, "coalesce() takes 2+ args")
        NullFn("coalesce", a)
      case f @ ("abs" | "exp" | "log" | "log10" | "log2" | "sqrt" | "sign") =>
        val a = args(); arity(a.length == 1, s"$f() takes 1 arg")
        MathFn(f, a)
      case "round" =>
        val a = args()
        arity(a.length == 1 || a.length == 2,
          "round() takes (value[, precision])")
        MathFn("round", a)
      case "pow" =>
        val a = args(); arity(a.length == 2, "pow() takes (base, exponent)")
        MathFn("pow", a)
      case f @ ("sin" | "cos" | "tan" | "asin" | "acos" | "atan" | "cot" |
          "degrees" | "radians" | "ceiling" | "exp2" | "exp10") =>
        val a = args(); arity(a.length == 1, s"$f() takes 1 arg")
        MathFn(f, a)
      case "atan2" =>
        val a = args(); arity(a.length == 2, "atan2() takes (y, x)")
        MathFn("atan2", a)
      case f @ ("binary_and" | "binary_or" | "binary_xor" |
          "binary_shift_left" | "binary_shift_right") =>
        val a = args(); arity(a.length == 2, s"$f() takes 2 args")
        MathFn(f, a)
      case f @ ("binary_not" | "bitset_count_ones") =>
        val a = args(); arity(a.length == 1, s"$f() takes 1 arg")
        MathFn(f, a)
      case "pi" =>
        val a = args(); arity(a.isEmpty, "pi() takes no args")
        MathFn("pi", a)
      case "split" =>
        val a = args()
        arity(a.length == 2 || a.length == 3,
          "split() takes (source, delimiter[, index])")
        arity(a(1).isInstanceOf[StrLit],
          "split() delimiter must be a string literal")
        ArrFn("split", a)
      case "indexof" =>
        val a = args()
        arity(a.length >= 2 && a.length <= 5,
          "indexof() takes (source, lookup[, start[, length[, occurrence]]])")
        arity(a.length < 5 ||
          a(4).isInstanceOf[IntLit] && a(4).asInstanceOf[IntLit].v >= 1,
          "indexof() occurrence must be an integer literal >= 1")
        ArrFn("indexof", a)
      case "array_length" =>
        val a = args(); arity(a.length == 1, "array_length() takes 1 arg")
        ArrFn("array_length", a)
      case "strcat_delim" =>
        val a = args()
        arity(a.length >= 2, "strcat_delim() takes (delimiter, e1, …)")
        ArrFn("strcat_delim", a)
      case "strcat_array" =>
        val a = args()
        arity(a.length == 2, "strcat_array() takes (array, delimiter)")
        arity(a(1).isInstanceOf[StrLit],
          "strcat_array() delimiter must be a string literal")
        ArrFn("strcat_array", a)
      case f @ ("array_sort_asc" | "array_sort_desc") =>
        // multi-array form co-sorts the extra arrays by the first one
        val a = args(); arity(a.nonEmpty, s"$f() takes 1+ arrays")
        ArrFn(f, a)
      case f @ ("array_reverse" | "bag_keys") =>
        val a = args(); arity(a.length == 1, s"$f() takes 1 arg")
        ArrFn(f, a)
      case "bag_merge" =>
        val a = args(); arity(a.length >= 2, "bag_merge() takes 2+ bags")
        ArrFn("bag_merge", a)
      case "bag_zip" =>
        val a = args()
        arity(a.length == 2, "bag_zip() takes (keys, values)")
        ArrFn("bag_zip", a)
      case "bag_remove_keys" =>
        val a = args()
        arity(a.length == 2, "bag_remove_keys() takes (bag, keys_array)")
        ArrFn("bag_remove_keys", a)
      case "array_sum" =>
        val a = args(); arity(a.length == 1, "array_sum() takes 1 arg")
        ArrFn("array_sum", a)
      case f @ ("series_add" | "series_subtract" | "series_multiply" |
          "series_divide") =>
        val a = args(); arity(a.length == 2, s"$f() takes 2 series")
        ArrFn(f, a)
      case f @ ("series_abs" | "series_sum" | "series_min" | "series_max" |
          "series_avg" | "series_stats_dynamic" | "series_fill_forward" |
          "series_fill_backward" | "series_fill_linear" | "series_outliers" |
          "series_exp" | "series_log" | "series_sign" | "series_floor" |
          "series_ceiling" | "series_magnitude" |
          "series_fit_line_dynamic" | "series_fit_2lines_dynamic") =>
        val a = args(); arity(a.length == 1, s"$f() takes 1 series")
        ArrFn(f, a)
      case f @ ("series_pow" | "series_greater" | "series_less" |
          "series_greater_equals" | "series_less_equals" |
          "series_equals" | "series_not_equals" | "series_dot_product" |
          "series_cosine_similarity" | "series_pearson_correlation") =>
        val a = args(); arity(a.length == 2, s"$f() takes 2 args")
        ArrFn(f, a)
      case "series_decompose" =>
        val a = args()
        arity(a.length >= 1 && a.length <= 3,
          "series_decompose() takes (series[, period[, trend]])")
        ArrFn("series_decompose", a)
      case "series_seasonal" =>
        val a = args()
        arity(a.length >= 1 && a.length <= 2,
          "series_seasonal() takes (series[, period])")
        ArrFn("series_seasonal", a)
      case "series_iir" =>
        val a = args()
        arity(a.length == 3,
          "series_iir() takes (series, numerators, denominators)")
        ArrFn("series_iir", a)
      case f @ ("series_stats" | "series_fit_line" | "series_fit_2lines") =>
        // ADX's tuple forms — struct-valued, consumed via multi-assign
        // `(a, b, …) = f(s)` (the _dynamic bag forms exist separately)
        val a = args(); arity(a.length == 1, s"$f() takes 1 arg")
        ArrFn(f, a)
      case f @ ("series_fft" | "series_ifft") =>
        // tuple forms: `(re, im) = series_fft(x_real[, x_imaginary])`
        val a = args()
        arity(a.length == 1 || a.length == 2,
          s"$f() takes (x_real[, x_imaginary])")
        ArrFn(f, a)
      case "series_decompose_forecast" =>
        val a = args()
        arity(a.length >= 2 && a.length <= 4,
          "series_decompose_forecast() takes " +
            "(series, points[, seasonality[, trend]])")
        ArrFn("series_decompose_forecast", a)
      case "series_decompose_anomalies" =>
        val a = args()
        arity(a.length >= 1 && a.length <= 4,
          "series_decompose_anomalies() takes " +
            "(series[, threshold[, period[, trend]]])")
        ArrFn("series_decompose_anomalies", a)
      case "series_periods_detect" =>
        val a = args()
        arity(a.length == 4,
          "series_periods_detect() takes (series, min_period, max_period, num_periods)")
        ArrFn("series_periods_detect", a)
      case "series_fill_const" =>
        val a = args()
        arity(a.length == 2,
          "series_fill_const() takes (series, fill_value)")
        ArrFn("series_fill_const", a)
      case "dcount_hll" =>
        val a = args(); arity(a.length == 1, "dcount_hll() takes 1 sketch")
        ArrFn("dcount_hll", a)
      // SCALAR hll_merge (the aggregate form lives in summarize): union
      // of 2+ sketch values within one row
      case "hll_merge" =>
        val a = args()
        arity(a.length >= 2, "scalar hll_merge() takes 2+ sketches")
        ArrFn("hll_merge", a)
      case "series_fir" =>
        val a = args()
        arity(a.length == 2 || a.length == 3,
          "series_fir() takes (series, weights [, normalize])")
        arity(a.length < 3 || a(2).isInstanceOf[BoolLit],
          "series_fir() normalize must be a bool literal")
        ArrFn("series_fir", a)
      case "array_concat" =>
        val a = args(); arity(a.length >= 2, "array_concat() takes 2+ arrays")
        ArrFn("array_concat", a)
      case "array_slice" =>
        val a = args()
        arity(a.length == 3, "array_slice() takes (array, start, end)")
        ArrFn("array_slice", a)
      case f @ ("array_shift_left" | "array_shift_right") =>
        val a = args()
        arity(a.length == 2 || a.length == 3,
          s"$f() takes (array, shift_count[, fill_value])")
        ArrFn(f, a)
      case f @ ("array_rotate_left" | "array_rotate_right") =>
        val a = args()
        arity(a.length == 2, s"$f() takes (array, rotate_count)")
        ArrFn(f, a)
      case "array_iff" =>
        val a = args()
        arity(a.length == 3,
          "array_iff() takes (condition_array, when_true, when_false)")
        ArrFn("array_iff", a)
      case f @ ("min_of" | "max_of") =>
        val a = args(); arity(a.length >= 2, s"$f() takes 2+ args")
        MathFn(f, a)
      case f @ ("isnan" | "isinf" | "isfinite") =>
        val a = args(); arity(a.length == 1, s"$f() takes 1 arg")
        NullFn(f, a)
      case "repeat" =>
        val a = args(); arity(a.length == 2, "repeat() takes (value, count)")
        ArrFn("repeat", a)
      case "percentile_tdigest" =>
        val a = args()
        arity(a.length == 2, "percentile_tdigest() takes (tdigest, percentile)")
        arity(a(1).isInstanceOf[IntLit] || a(1).isInstanceOf[FloatLit],
          "percentile_tdigest() percentile must be a numeric literal")
        ArrFn("percentile_tdigest", a)
      case "topk_estimate" =>
        val a = args()
        arity(a.length == 2, "topk_estimate() takes (state, k)")
        arity(a(1).isInstanceOf[IntLit],
          "topk_estimate() k must be an integer literal")
        ArrFn("topk_estimate", a)
      case "array_split" =>
        val a = args()
        arity(a.length == 2, "array_split() takes (array, index|indices)")
        ArrFn("array_split", a)
      case "format_bytes" =>
        val a = args()
        arity(a.length == 1 || a.length == 2,
          "format_bytes() takes (size[, precision])")
        arity(a.length == 1 || a(1).isInstanceOf[IntLit],
          "format_bytes() precision must be an integer literal")
        StrFn("format_bytes", a)
      case "zip" =>
        val a = args(); arity(a.length >= 2, "zip() takes 2+ arrays")
        ArrFn("zip", a)
      case "range" => // scalar range(start, stop[, step]) — inclusive stop
        val a = args()
        arity(a.length == 2 || a.length == 3,
          "range() takes (start, stop[, step])")
        ArrFn("range_arr", a)
      case "set_has_element" =>
        val a = args()
        arity(a.length == 2, "set_has_element() takes (array, value)")
        ArrFn("set_has_element", a)
      case "bag_has_key" =>
        val a = args()
        arity(a.length == 2, "bag_has_key() takes (bag, key)")
        ArrFn("bag_has_key", a)
      case "array_index_of" =>
        val a = args()
        arity(a.length >= 2 && a.length <= 5,
          "array_index_of() takes (array, value[, start[, length[, occurrence]]])")
        arity(a.length < 5 ||
          a(4).isInstanceOf[IntLit] && a(4).asInstanceOf[IntLit].v >= 1,
          "array_index_of() occurrence must be an integer literal >= 1")
        ArrFn("array_index_of", a)
      case f @ ("set_union" | "set_intersect" | "set_difference") =>
        val a = args(); arity(a.length == 2, s"$f() takes 2 arrays")
        ArrFn(f, a)
      case "pack_array" =>
        val a = args(); arity(a.nonEmpty, "pack_array() takes 1+ elements")
        ArrFn("pack_array", a)
      case f @ ("bag_pack" | "pack") =>
        val a = args()
        arity(a.length >= 2 && a.length % 2 == 0,
          s"$f() takes (key1, value1, key2, value2, …) pairs")
        arity(a.grouped(2).forall(_.head.isInstanceOf[StrLit]),
          s"$f() keys must be string literals")
        ArrFn("bag_pack", a)
      case "pack_all" =>
        val a = args(); arity(a.isEmpty, "pack_all() takes no arguments")
        ArrFn("pack_all", a)
      case "estimate_data_size" =>
        // star form sizes EVERY current column; otherwise explicit refs
        if (atPunct("*")) {
          p += 1; eatPunct(")")
          ArrFn("estimate_data_size", Nil)
        } else {
          val a = args()
          arity(a.nonEmpty && a.forall(_.isInstanceOf[Expr.Field]),
            "estimate_data_size() takes * or column references")
          ArrFn("estimate_data_size", a)
        }
      case "row_number" =>
        val a = args()
        arity(a.length <= 1, "row_number() takes an optional starting index")
        arity(a.forall(_.isInstanceOf[IntLit]),
          "row_number() starting index must be an int literal")
        WinFn("row_number", a)
      case f @ ("prev" | "next") =>
        val a = args()
        arity(a.nonEmpty && a.length <= 3,
          s"$f() takes (column[, offset[, default]])")
        arity(a.lift(1).forall(_.isInstanceOf[IntLit]),
          s"$f() offset must be an int literal")
        WinFn(f, a)
      case "row_cumsum" =>
        val a = args()
        arity(a.length == 1 || a.length == 2,
          "row_cumsum() takes (term[, restart])")
        WinFn("row_cumsum", a)
      case f @ ("row_rank_dense" | "row_rank_min") =>
        val a = args(); arity(a.length == 1, s"$f() takes 1 term")
        WinFn(f, a)
      case "row_window_session" =>
        val a = args()
        arity(a.length == 3,
          "row_window_session() takes (ts, maxDuration, idleTimeout)")
        arity(a.tail.forall(x => x.isInstanceOf[TimespanLit] ||
          x.isInstanceOf[IntLit]),
          "row_window_session() durations must be timespan literals")
        WinFn("row_window_session", a)
      case "countof" =>
        val a = args()
        arity(a.length == 2 || a.length == 3,
          "countof() takes (source, search[, kind])")
        // an empty search would divide 0/0 in the replace-length lowering
        // and silently yield null; reject it where the user can see it
        arity(!a(1).isInstanceOf[StrLit] || a(1).asInstanceOf[StrLit].v.nonEmpty,
          "countof() search string must be non-empty")
        val kind = if (a.length == 3) a(2) match {
          case StrLit(k) if k == "normal" || k == "regex" => k
          case _ => fail("countof() kind must be 'normal' or 'regex'")
        } else "normal"
        if (kind == "regex") {
          arity(a(1).isInstanceOf[StrLit],
            "countof() regex search must be a literal")
          StrFn("countof_re", a.take(2))
        } else StrFn("countof", a.take(2))
      case "tohex" =>
        val a = args()
        arity(a.length == 1 || a.length == 2,
          "tohex() takes (value[, minDigits])")
        arity(a.length < 2 || a(1).isInstanceOf[IntLit],
          "tohex() minDigits must be an integer literal")
        StrFn("tohex", a)
      case f @ ("base64_encode_tostring" | "base64_decode_tostring") =>
        val a = args(); arity(a.length == 1, s"$f() takes 1 arg")
        StrFn(f, a)
      case "extract_all" =>
        val a = args()
        arity(a.length == 2, "extract_all() takes (regex_literal, source)")
        arity(a.head.isInstanceOf[StrLit], "extract_all() regex must be a literal")
        StrFn("extract_all", a)
      case "bin_at" =>
        val a = args()
        arity(a.length == 3, "bin_at() takes (value, width, anchor)")
        BinAt(a(0), a(1), a(2))
      case c @ ("tostring" | "toint" | "tolong" | "toreal" | "todouble" |
                "todecimal" | "tobool" | "toboolean") =>
        val a = args(); arity(a.length == 1, s"$c() takes 1 arg")
        Cast(c, a.head)
      case c @ ("todatetime" | "totimespan") =>
        val a = args(); arity(a.length == 1, s"$c() takes 1 arg")
        Cast(c, a.head)
      case c @ ("todynamic" | "parse_json") =>
        val a = args(); arity(a.length == 1, s"$c() takes 1 arg")
        Cast("todynamic", a.head)
      case other => fail(s"unknown function '$other'")
    }
    eatPunct(")")
    e
  }

  private def parseDatetime(text: String, pos: Int): Long = {
    import java.time._
    import java.time.format.DateTimeFormatter
    val inst: Instant =
      try Instant.parse(text)
      catch {
        case _: Exception =>
          try LocalDateTime.parse(text.replace(' ', 'T')).toInstant(ZoneOffset.UTC)
          catch {
            case _: Exception =>
              try LocalDate.parse(text, DateTimeFormatter.ISO_LOCAL_DATE)
                .atStartOfDay.toInstant(ZoneOffset.UTC)
              catch {
                case _: Exception =>
                  throw KqlParseException(s"cannot parse datetime '$text'", pos)
              }
          }
      }
    inst.getEpochSecond * 1000000L + inst.getNano / 1000L
  }

  private def parseFieldPath(): FieldPath = {
    val parts = Seq.newBuilder[FieldAccess]
    var done = false
    while (!done) {
      val name = identText()
      val idx = Seq.newBuilder[Int]
      while (atPunct("[")) {
        p += 1
        idx += parseIntLit().toInt
        eatPunct("]")
      }
      parts += FieldAccess(name, idx.result())
      done = !tryPunct(".")
    }
    FieldPath(parts.result())
  }
}

object Parser {
  /** Step names reported as the expected set at a broken step boundary. */
  val stepKeywords: Seq[String] = Seq(
    "where", "project", "extend", "project-rename", "project-away",
    "project-keep", "mv-expand", "limit", "take", "sort", "order", "top",
    "top-hitters", "sample-distinct", "summarize", "distinct", "union",
    "join", "count", "write", "tee", "search", "parse", "partition", "as",
    "make-graph", "graph-match", "graph-shortest-paths")

  def parse(src: String): Parsed = parse(src, System.currentTimeMillis() * 1000L)
  def parse(src: String, nowMicros: Long): Parsed =
    new Parser(src, nowMicros).parse()
}
