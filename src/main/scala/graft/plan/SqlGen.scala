package graft.plan

import graft.ast._
import graft.ast.Expr._

/** A pipeline feature the SQL backend cannot express as Spark SQL text. */
final class SqlGenError(msg: String) extends Exception(msg)

/** Renders a PRQL [[Query]] to ONE runnable Spark SQL string — the
  * reference's actual artifact (prql-compiler/src/sql/translator.rs:32-49
  * emits SQL text and hands execution to a database). The DataFrame planner
  * ([[Planner]]) stays the primary backend (Catalyst gets a plan, not
  * text); this surface exists for debugging, for EXPLAIN-less environments,
  * and as the closest-artifact parity claim vs the reference.
  *
  * Architecture mirrors the reference's translator: transforms accumulate
  * into the current SELECT block (FROM+JOINs, WHERE, derived items, GROUP
  * BY, ORDER BY, LIMIT/OFFSET) and the block is closed into a subquery
  * whenever the incoming transform needs the block's OUTPUT as its input
  * (aggregate over an aggregate, filter over an aggregate, window items
  * over a window, take over a take…). Derived columns are tracked in an
  * alias→SQL environment and INLINED where SQL cannot reference a select
  * alias (WHERE, GROUP BY, join conditions) — the reference materializes
  * variables the same way. Window items referencing other window items
  * force a block close (SQL forbids OVER inside WHERE/GROUP BY).
  *
  * Semantics (item shapes, sort-ident rule, frame elision, grouped-take
  * rewrites, user-function inlining) are the SHARED implementations in the
  * [[Planner]] companion — one source of truth for both backends; the
  * equivalence test (SqlBackendSpec) runs the corpus through both and
  * compares rows.
  */
final class SqlGen(query: Query) {
  import Planner._

  private val funcs: Map[String, FuncDef] = query.funcs.map(f => f.name -> f).toMap

  /** CTE name (lowercased) → output names its rendered SELECT certainly
    * emits. `from`/`join` of a CTE seeds the new block's baseNames from
    * this, so a later derive shadowing a CTE column renders as * EXCEPT —
    * the same contract flush() keeps within one pipeline (the seed-55
    * fuzzer find: `from cte | derive x` where the CTE emitted x). */
  private val cteKnown = scala.collection.mutable.Map.empty[String, Set[String]]

  def render(): String = {
    val main = query.main.getOrElse(throw new SqlGenError("query has no main pipeline"))
    val ctes = query.tables.map { t =>
      val out = pipelineOutBlock(t.pipeline)
      cteKnown(t.name.toLowerCase) = emittedNames(out)
      s"${quoteName(t.name)} AS (\n${renderBlock(out, isTop = true)}\n)"
    }
    val body = pipelineSql(main)
    if (ctes.isEmpty) body
    else s"WITH ${ctes.mkString(",\n")}\n$body"
  }

  /** Names a block's rendered SELECT certainly emits (a known SUBSET —
    * an unexpanded base `*` stays unknowable); flush() and the CTE
    * registry share this rule. */
  private def emittedNames(b: Block): Set[String] = b.select match {
    case Some(items) => items.flatMap(_._1).map(_.toLowerCase).toSet
    case None => (b.baseNames -- b.excepts.map(_.toLowerCase)) ++
      b.extras.map(_._1.toLowerCase)
  }

  // ---------------- the SELECT-block state machine ----------------

  /** One SQL SELECT in progress. `select=None` → `*` (plus `extras`, minus
    * `excepts`); language-ambient fields mirror [[Planner]]'s Ctx. */
  private case class Block(
      from: String,                                     // "" = no FROM (unit relation)
      // single-relation alias (from x = t, or the table's own name): kept
      // so flush() can re-alias the subquery and qualified references
      // (x.col) survive a block close. A join clears it — SQL can alias a
      // subquery only once, so multi-relation blocks stay unaliased.
      fromAlias: Option[String] = None,
      // explicit items: (Some(name), sql) → "sql AS name"; (None, sql) →
      // rendered verbatim (wildcards like `t.*` take no alias)
      select: Option[Vector[(Option[String], String)]] = None,
      excepts: Vector[String] = Vector.empty,           // shadowed base columns
      extras: Vector[(String, String)] = Vector.empty,  // appended derive items
      env: Map[String, String] = Map.empty,             // alias -> sql for inlining
      wheres: Vector[String] = Vector.empty,
      groupBy: Option[Vector[String]] = None,
      distinct: Boolean = false,
      sort: List[SortItem] = Nil,
      sortForOutput: Boolean = true,
      limit: Option[Long] = None,
      offset: Option[Long] = None,
      groupKeys: List[Expr] = Nil,
      frameSpec: Option[FrameSpec] = None,
      inGroupBody: Boolean = false,
      inWindowBody: Boolean = false,
      aggregated: Boolean = false,
      // lowercase names the base relation is KNOWN to emit (aliases that
      // survived a flush) — a later `derive` shadowing one of these must
      // render as * EXCEPT + replacement, not a bare appended alias
      // (SELECT *, e AS x over a subquery already emitting x is an
      // ambiguous reference; found by SqlBackendPropertySpec seed 145)
      baseNames: Set[String] = Set.empty)

  private def renderBlock(b: Block, isTop: Boolean): String = {
    val items: Vector[String] = b.select match {
      case Some(its) => its.map {
        case (Some(n), sql) => s"$sql AS ${quoteName(n)}"
        case (None, sql) => sql
      }
      case None =>
        val star =
          if (b.from.isEmpty) Vector.empty // unit relation: extras only
          else if (b.excepts.isEmpty) Vector("*")
          else Vector(s"* EXCEPT (${b.excepts.map(quoteName).mkString(", ")})")
        star ++ b.extras.map { case (n, sql) => s"$sql AS ${quoteName(n)}" }
    }
    val sel = if (items.isEmpty) "*" else items.mkString(", ")
    val sb = new StringBuilder
    sb ++= "SELECT "
    if (b.distinct) sb ++= "DISTINCT "
    sb ++= sel
    if (b.from.nonEmpty) sb ++= s"\nFROM ${b.from}"
    if (b.wheres.nonEmpty) sb ++= s"\nWHERE ${b.wheres.map(w => s"($w)").mkString(" AND ")}"
    b.groupBy.foreach(ks => sb ++= s"\nGROUP BY ${ks.mkString(", ")}")
    if (b.sort.nonEmpty && b.sortForOutput &&
        (isTop || b.limit.isDefined || b.offset.isDefined))
      sb ++= s"\nORDER BY ${b.sort.map(sortSql(b, _)).mkString(", ")}"
    b.limit.foreach(n => sb ++= s"\nLIMIT $n")
    b.offset.foreach(n => sb ++= s"\nOFFSET $n")
    sb.toString
  }

  /** Close the block into a subquery; ambient language state carries over
    * (derived names became real columns, so the env empties).
    *
    * A pending-sort name the block's EXPLICIT select no longer exposes
    * must ride through the subquery under a mangled carry column, or the
    * outer ORDER BY cannot resolve it once another flush interposes
    * (fuzzer seed 222: `sort [-x1] | select [..no x1..] | join` put the
    * ORDER BY two scopes above x1's last one). The carry is EXCEPT'd in
    * the outer block so a star render keeps the output schema; ORDER BY
    * may still reference it as a FROM column. Skipped when any select
    * item is unaliased (wildcards — emitted names unknowable without a
    * schema) and when select is None (`*` keeps every name). */
  /** Mangled carry name for a (possibly qualified) sort ident. */
  private def gsortName(parts: List[String]): String =
    s"__gsort_${parts.mkString("_")}"

  /** Append carry columns for the given sort idents and rewrite the
    * block's pending sort to reference them — the shared mechanism behind
    * flush()'s dropped-name carry and select's rebound-name carry.
    * Multi-part idents mangle through their full path (t.x → __gsort_t_x). */
  private def carrySort(b: Block, idents: List[List[String]]): Block =
    if (idents.isEmpty) b
    else {
      val mangled: List[(List[String], String)] = idents.map(p => p -> gsortName(p))
      val withCols = mangled.foldLeft(b) { case (bb, (p, m)) =>
        val sql = renderExpr(bb, Ident(p), inAgg = false)
        bb.select match {
          case Some(its) => bb.copy(select = Some(its :+ (Some(m) -> sql)))
          case None => bb.copy(extras = bb.extras :+ (m -> sql))
        }
      }
      val mmap = mangled.toMap
      withCols.copy(sort = withCols.sort.map { si =>
        si.e match {
          case Ident(p) if mmap.contains(p) => si.copy(e = Ident(List(mmap(p))))
          case _ => si
        }
      })
    }

  private def flush(b: Block): Block = {
    val canCarry = b.select.exists(_.forall(_._1.isDefined))
    val missing: List[List[String]] =
      if (!canCarry) Nil
      else {
        val emitted = emittedNames(b)
        b.sort.flatMap(_.e match {
          case Ident(parts) if parts.nonEmpty && parts.last != "*" &&
              !emitted.contains(parts.last.toLowerCase) => Some(parts)
          case _ => None
        }).distinct
      }
    val bc = carrySort(b, missing)
    // render the SUBQUERY with the original sort — a limit-forced inner
    // ORDER BY resolves the un-mangled names at that level
    val bi = bc.copy(sort = b.sort)
    Block(from = s"(\n${renderBlock(bi, isTop = false)}\n)" +
        b.fromAlias.map(a => s" AS ${quoteName(a)}").getOrElse(""),
      fromAlias = b.fromAlias,
      select = None,
      excepts = missing.map(gsortName).toVector,
      sort = bc.sort, sortForOutput = b.sortForOutput,
      groupKeys = b.groupKeys, frameSpec = b.frameSpec,
      inGroupBody = b.inGroupBody, inWindowBody = b.inWindowBody,
      aggregated = b.aggregated,
      baseNames = emittedNames(bi))
  }

  /** Positional state that makes the block's OUTPUT differ from its input
    * relation for a new consumer. */
  private def closed(b: Block): Boolean =
    b.groupBy.isDefined || b.distinct || b.limit.isDefined || b.offset.isDefined

  private def pipelineOutBlock(p: Pipeline): Block =
    p.stages.foldLeft(Block(from = ""))(applyStage)

  private def pipelineSql(p: Pipeline): String =
    renderBlock(pipelineOutBlock(p), isTop = true)

  private val legalInGroup = Set("select", "derive", "sort", "window", "aggregate", "take")
  private val legalInWindow = Set("select", "derive")

  private def applyStage(b: Block, stage: Expr): Block = stage match {
    case FuncCall(name, args, named) => applyTransform(b, name, args, named)
    case Ident(List(name)) => applyTransform(b, name, Nil, Nil)
    case other => throw new SqlGenError(s"pipeline stage is not a transform: $other")
  }

  private def applyTransform(b: Block, name: String, args: List[Expr],
                             named: List[(String, Expr)]): Block = {
    if (b.inWindowBody && !legalInWindow(name))
      throw new SqlGenError(s"transform '$name' is not allowed inside window")
    if (!b.inWindowBody && b.inGroupBody && !legalInGroup(name))
      throw new SqlGenError(s"transform '$name' is not allowed inside group")
    name match {
      case "from" =>
        args match {
          case List(Assign(a, Ident(List(t)))) =>
            Block(from = relSql(t, a), fromAlias = Some(a),
              baseNames = cteKnown.getOrElse(t.toLowerCase, Set.empty))
          case List(Ident(List(t))) =>
            Block(from = relSql(t, t), fromAlias = Some(t),
              baseNames = cteKnown.getOrElse(t.toLowerCase, Set.empty))
          case List(JinjaLit(src)) =>
            // `from {{ source(...) }}` → verbatim template table reference
            Block(from = src, fromAlias = None)
          case _ => throw new SqlGenError(s"from expects a table name, got $args")
        }

      case "select" =>
        // A pending sort may reference a name this select is about to drop
        // from the projection, or REBIND to a different expression. Plain
        // ORDER BY must use the alias (see sortSql), so:
        //  - dropped env name (fuzzer seed 131): flush — the derive becomes
        //    a real column of the subquery, and Spark lets the outer ORDER
        //    BY reference a FROM column that is not in the select list;
        //  - rebound name (r9 review): the sort happened at its pipeline
        //    position over the OLD value, but an outer `ORDER BY x` binds
        //    to the new alias — carry the old value through the flush under
        //    a mangled column and point the pending sort at it (the mangled
        //    FROM column is not in the outer select list, so it is
        //    unambiguous and does not change the output schema)
        val items0 = assignItems(args)
        val outNames: Set[String] = items0.flatMap {
          case (Some(n), _) => Some(n)
          case (None, Ident(parts)) => Some(parts.last) // "*" never matches a sort ident
          case (None, e) => Some(prettyName(e))
        }.toSet
        val rebound: Set[String] = items0.collect {
          case (Some(n), e) if e != Ident(List(n)) => n
        }.toSet
        val reboundSorted: List[List[String]] = b.sort.flatMap(_.e match {
          case Ident(List(n)) if rebound.contains(n) => Some(List(n))
          case _ => None
        }).distinct
        val sortDropsEnvName = b.sort.exists(_.e match {
          case Ident(List(n)) => b.env.contains(n) && !outNames.contains(n)
          case _ => false
        })
        // a wildcard select would re-expose the rebind carry column in the
        // output (`t.*` expands the flushed subquery) — refuse the corner
        // shape with a named error rather than leak an internal name or
        // silently order by the rebound value (r9 review)
        val hasWildcard = items0.exists {
          case (None, Ident(parts)) => parts.last == "*"
          case _ => false
        }
        if (hasWildcard && reboundSorted.nonEmpty)
          throw new SqlGenError(
            "a pending sort on a name this wildcard select rebinds is not " +
              "SQL-text-expressible; close the stage with a table CTE first")
        val bPre = carrySort(b, reboundSorted)
        val b1 = if (closed(b) || sortDropsEnvName || reboundSorted.nonEmpty) flush(bPre) else bPre
        val items: List[(Option[String], String)] = items0.map {
          case (Some(n), e) => (Some(n), renderExpr(b1, e, inAgg = false))
          case (None, Ident(parts)) if parts.last == "*" =>
            // wildcard select items pass through verbatim, unaliased
            (None, parts.map(quoteName).mkString("."))
          case (None, e @ Ident(parts)) =>
            // keep the ident's own name even when the env inlines its
            // defining expression (derived-column reference)
            (Some(parts.last), renderExpr(b1, e, inAgg = false))
          case (None, e) => (Some(prettyName(e)), renderExpr(b1, e, inAgg = false))
        }
        val env = items.collect { case (Some(n), sql) if sql != quoteName(n) => n -> sql }.toMap
        b1.copy(select = Some(items.toVector), extras = Vector.empty,
          excepts = Vector.empty, env = b1.env ++ env)

      case "derive" =>
        val b1 = if (closed(b)) flush(b) else b
        assignItems(args).foldLeft(b1) { case (bb, (nameOpt, e)) =>
          val n = nameOpt.getOrElse(prettyName(e))
          val sql = renderExpr(bb, e, inAgg = false)
          val withEnv = bb.copy(env = bb.env + (n -> sql))
          withEnv.select match {
            case Some(items) if items.exists(_._1.exists(_.equalsIgnoreCase(n))) =>
              withEnv.copy(select = Some(items.map {
                case (in @ Some(x), _) if x.equalsIgnoreCase(n) => (in, sql)
                case kv => kv
              }))
            case Some(items) =>
              withEnv.copy(select = Some(items :+ (Some(n) -> sql)))
            case None if withEnv.extras.exists(_._1.equalsIgnoreCase(n)) =>
              withEnv.copy(extras = withEnv.extras.map {
                case (in, _) if in.equalsIgnoreCase(n) => (in, sql)
                case kv => kv
              })
            case None if withEnv.env.contains(n) && !withEnv.extras.exists(_._1 == n) &&
                bb.env.contains(n) =>
              // shadowing an earlier derive already handled above; here a
              // base column: remove from * and append the replacement
              withEnv.copy(excepts = (withEnv.excepts :+ n).distinct,
                extras = withEnv.extras :+ (n -> sql))
            case None =>
              // may shadow a base column we cannot see (no schema): emit
              // EXCEPT when the name is KNOWN to come out of the base (an
              // alias that survived a flush) or when the expression
              // references itself (derive x = x + 1); otherwise treat the
              // unnamed target as fresh.
              val selfRef = referencesName(e, n)
              if (selfRef || withEnv.baseNames.contains(n.toLowerCase))
                withEnv.copy(excepts = (withEnv.excepts :+ n).distinct,
                  extras = withEnv.extras :+ (n -> sql))
              else withEnv.copy(extras = withEnv.extras :+ (n -> sql))
          }
        }

      case "filter" =>
        if (args.isEmpty) throw new SqlGenError("filter expects a condition")
        val b1 = if (closed(b)) flush(b) else b
        val cond = args.map(a => renderExpr(b1, a, inAgg = false)).map(c => s"($c)")
          .mkString(" AND ")
        if (cond.contains(" OVER (")) {
          val b2 = flush(b1)
          val cond2 = args.map(a => renderExpr(b2, a, inAgg = false)).map(c => s"($c)")
            .mkString(" AND ")
          b2.copy(wheres = b2.wheres :+ cond2)
        } else b1.copy(wheres = b1.wheres :+ cond)

      case "sort" =>
        val b1 = if (b.limit.isDefined || b.offset.isDefined) flush(b) else b
        b1.copy(sort = sortItems(args), sortForOutput = !b1.inGroupBody)

      case "aggregate" =>
        val items = aggItems(args)
        if (items.isEmpty) throw new SqlGenError("aggregate expects at least one expression")
        val b0 = if (closed(b)) flush(b) else b
        def render(bb: Block) = (
          bb.groupKeys.map { k =>
            val n = k match { case Ident(parts) => parts.last; case other => prettyName(other) }
            (n, renderExpr(bb, k, inAgg = false))
          },
          items.map { case (nameOpt, e) =>
            (nameOpt.getOrElse(prettyName(e)), renderExpr(bb, e, inAgg = true))
          })
        // a window-DERIVED column referenced in the aggregate inlines its
        // OVER expression through the env; close the block so the window
        // value becomes a real column first (the filter-over-window
        // precedent). Only a window expression written directly inside the
        // aggregate body is genuinely inexpressible.
        val (b1, keyItems, aggItemsR) = {
          val (k0, a0) = render(b0)
          if ((k0 ++ a0).exists(_._2.contains(" OVER ("))) {
            val bf = flush(b0)
            val (k1, a1) = render(bf)
            (bf, k1, a1)
          } else (b0, k0, a0)
        }
        if ((keyItems ++ aggItemsR).exists(_._2.contains(" OVER (")))
          throw new SqlGenError("window expressions inside aggregate are not SQL-expressible")
        b1.copy(
          select = Some((keyItems ++ aggItemsR).map { case (n, sql) => (Some(n), sql) }.toVector),
          extras = Vector.empty, excepts = Vector.empty, env = Map.empty,
          groupBy = if (keyItems.isEmpty) None
            else Some(keyItems.map(ki => deOrdinal(ki._2)).toVector),
          distinct = false,
          sort = Nil,
          groupKeys = if (b1.inGroupBody) b1.groupKeys else Nil,
          aggregated = b1.inGroupBody)

      case "take" => applyTake(b, args)

      case "join" => applyJoin(b, args, named)

      case "group" =>
        val (keys, body) = args match {
          case List(k, bod) => (keyList(k), bodyStages(bod))
          case _ => throw new SqlGenError("group expects keys and a sub-pipeline")
        }
        // a pending LIMIT/OFFSET/DISTINCT must be closed BEFORE the ambient
        // sort is cleared, or the slice loses its ORDER BY in the subquery
        // and selects engine-order rows (found by SqlBackendPropertySpec
        // seed 3: sort | take a..b | group)
        val b0 = if (closed(b)) flush(b) else b
        val entry = b0.copy(sort = Nil, groupKeys = keys, inGroupBody = true,
          aggregated = false)
        val out = body.foldLeft(entry)(applyStage)
        out.copy(groupKeys = Nil, sort = Nil, inGroupBody = b.inGroupBody,
          frameSpec = None, aggregated = b.aggregated)

      case "window" =>
        val body = args match {
          case List(bod) => bodyStages(bod)
          case _ => throw new SqlGenError("window expects a sub-pipeline")
        }
        val spec = frameSpecOf(named, _ => ())
        val entry = b.copy(frameSpec = Some(spec), inWindowBody = true)
        val out = body.foldLeft(entry)(applyStage)
        out.copy(frameSpec = b.frameSpec, inWindowBody = b.inWindowBody)

      case "join_asof" =>
        // documented divergence (the jinja precedent, inverted): the
        // tagged-union rewrite needs both sides' SCHEMAS to type the
        // null-padded union, which the schema-less text backend lacks
        throw new SqlGenError(
          "join_asof is not SQL-text-expressible (schema-dependent tagged union); " +
            "use the DataFrame backend")

      case other =>
        throw new SqlGenError(s"'$other' is not a transform (stage-position call)")
    }
  }

  // ---- take (mirrors Planner.applyTake) ----

  private def applyTake(b: Block, args: List[Expr]): Block = {
    val rng: (Option[Long], Option[Long]) = args match {
      case List(IntLit(n)) => (None, Some(n))
      case List(RangeLit(s, e)) => (s.map(asLong), e.map(asLong))
      case _ => throw new SqlGenError(s"take expects an int or range, got $args")
    }
    if (b.groupKeys.isEmpty) {
      val b1 = if (b.limit.isDefined || b.offset.isDefined) flush(b) else b
      rng match {
        case (None, Some(n)) => b1.copy(limit = Some(n))
        case (Some(a), Some(bn)) => b1.copy(limit = Some(bn - a + 1), offset = Some(a - 1))
        case (Some(a), None) => b1.copy(offset = Some(a - 1))
        case (None, None) => b1
      }
    } else if (b.aggregated && b.sort.isEmpty) {
      val keepsFirst = rng._1.forall(_ <= 1) && rng._2.forall(_ >= 1)
      if (keepsFirst) b
      else {
        val b1 = if (b.limit.isDefined || b.offset.isDefined) flush(b) else b
        b1.copy(limit = Some(0))
      }
    } else rng match {
      case (None | Some(1), Some(1)) if b.sort.isEmpty =>
        val b1 = if (closed(b)) flush(b) else b
        b1.copy(distinct = true)
      case (lo, hi) =>
        if (b.sort.isEmpty)
          throw new SqlGenError(
            "grouped take of a range beyond the first row requires a sort inside the group")
        // flush FIRST and rank over ITS subquery: flush carries any sort
        // name the body's select dropped (r9 review — ranking over the
        // pre-carry render referenced __gsort_* columns that don't exist),
        // and the carried columns leave the output through the same EXCEPT
        // as the rank column
        val fb = flush(b)
        val part = fb.groupKeys.map(k => renderExpr(fb, k, inAgg = false)).mkString(", ")
        val ord = fb.sort.map(sortSql(fb, _, inOver = true)).mkString(", ")
        val rn = "_rn_graft"
        val cond = (lo, hi) match {
          case (None, Some(n)) => s"$rn <= $n"
          case (Some(a), Some(bn)) => s"$rn BETWEEN $a AND $bn"
          case (Some(a), None) => s"$rn >= $a"
          case (None, None) => "TRUE"
        }
        val drop = (rn +: fb.excepts).map(quoteName).mkString(", ")
        val sql =
          s"""SELECT * EXCEPT ($drop)
             |FROM (
             |SELECT *, row_number() OVER (PARTITION BY $part ORDER BY $ord) AS $rn
             |FROM ${fb.from}
             |)
             |WHERE $cond""".stripMargin
        fb.copy(from = s"(\n$sql\n)" +
            fb.fromAlias.map(a => s" AS ${quoteName(a)}").getOrElse(""),
          excepts = Vector.empty,
          baseNames = fb.baseNames -- fb.excepts.map(_.toLowerCase))
    }
  }

  // ---- join (mirrors Planner.applyJoin arg handling) ----

  private def applyJoin(b: Block, args: List[Expr], named: List[(String, Expr)]): Block = {
    var side = "inner"
    named.foreach {
      case ("side", Ident(List(s))) => side = s
      case ("side", other) => throw new SqlGenError(s"bad join side: $other")
      case (n, _) => throw new SqlGenError(s"unknown join named arg: $n")
    }
    val joinKw = side match {
      case "inner" => "JOIN"
      case "left" => "LEFT JOIN"
      case "right" => "RIGHT JOIN"
      case "full" => "FULL JOIN"
      case s => throw new SqlGenError(s"unknown join side '$s'")
    }
    var tableOpt: Option[(String, String)] = None
    var conds: List[Expr] = Nil
    def addConds(cs: List[Expr]): Unit =
      if (conds.isEmpty) conds = cs
      else throw new SqlGenError("join takes one condition argument")
    args.foreach {
      case Assign(a, Ident(List(t))) if tableOpt.isEmpty => tableOpt = Some((a, t))
      case Ident(List(t)) if tableOpt.isEmpty => tableOpt = Some((t, t))
      case EList(items) => addConds(items)
      case e if tableOpt.isDefined => addConds(List(e))
      case e => throw new SqlGenError(s"bad join arg: $e")
    }
    val (alias, tbl) = tableOpt.getOrElse(throw new SqlGenError("join needs a table"))
    val usingCols = conds.collect { case Ident(List(c)) => c }
    val condRefsEnv = conds.exists(c => b.env.keys.exists(k => referencesName(c, k)))
    // right/full joins null the left side's columns on unmatched rows, so
    // anything PENDING that was computed before the join must materialize
    // first: WHERE timing, and (fuzzer seed 115) pending derives — a
    // deferred `coalesce(v, 36)` inlined after the join evaluates over the
    // join's NULLs and yields 36 where the derived column itself is NULL
    val mustFlush = closed(b) || b.select.isDefined || condRefsEnv ||
      ((b.wheres.nonEmpty || b.env.nonEmpty) && (side == "right" || side == "full"))
    val b1 = if (mustFlush) flush(b) else b
    val clause =
      if (conds.nonEmpty && usingCols.length == conds.length)
        s"USING (${usingCols.map(quoteName).mkString(", ")})"
      else {
        val on = conds.map(c => renderExpr(b1.copy(env = Map.empty), c, inAgg = false))
          .map(c => s"($c)").mkString(" AND ")
        if (on.contains(" OVER ("))
          throw new SqlGenError("window expressions in join conditions are not SQL-expressible")
        s"ON $on"
      }
    b1.copy(from = s"${b1.from}\n$joinKw ${relSql(tbl, alias)} $clause",
      fromAlias = None,
      // a joined CTE's known output names enter scope too (USING-deduped
      // keys are still present, so a plain union is correct)
      baseNames = b1.baseNames ++ cteKnown.getOrElse(tbl.toLowerCase, Set.empty))
  }

  private def relSql(tbl: String, alias: String): String =
    if (alias == tbl) quoteName(tbl)
    else s"${quoteName(tbl)} AS ${quoteName(alias)}"

  // ---------------- expression rendering ----------------

  private val aggFns = Set("min", "max", "sum", "avg", "average", "stddev",
    "count", "count_distinct")
  private val rankingFns = Set("rank", "rank_dense", "row_number", "lag", "lead")
  private val windowFns = rankingFns ++ Set("first", "last")

  private def renderExpr(b: Block, e: Expr, inAgg: Boolean): String = e match {
    case Ident(List("count")) =>
      if (inAgg) "count(1)" else s"count(1) ${over(b, withFrame = true)}"
    case Ident(List(n)) if !inAgg && (n == "rank" || n == "rank_dense" || n == "row_number") =>
      windowCall(b, n, Nil)
    case Ident(List(n)) if funcs.get(n).exists(_.params.isEmpty) =>
      renderExpr(b, funcs(n).body, inAgg)
    case Ident(List(n)) if b.env.contains(n) => s"(${b.env(n)})"
    case Ident(parts) => parts.map(quoteName).mkString(".")
    case NullLit => "NULL"
    // FLOAT literals carry a D suffix: a bare `7.5` parses as
    // DECIMAL(2,1) in Spark SQL while the DataFrame backend's F.lit
    // types it DOUBLE — decimal arithmetic silently changes VALUES (a
    // real divergence found by SqlBackendPropertySpec). INT literals
    // stay bare deliberately: an L suffix would fail INT-slot function
    // inputs (element_at, substring) under ANSI coercion (BIGINT does
    // not narrow), while INT-vs-LONG is value-identical under widening.
    case IntLit(v) => v.toString
    case FloatLit(v) => s"${v}D"
    case BoolLit(v) => if (v) "TRUE" else "FALSE"
    case StrLit(v) => strLit(v)
    case DateLit(s) => s"CAST(${strLit(s)} AS DATE)"
    case TimestampLit(s) => s"CAST(${strLit(s)} AS TIMESTAMP)"
    case TimeLit(s) => strLit(s) // no Spark TIME type; string like the reference
    case IntervalLit(n, unit) => s"INTERVAL $n $unit"
    case Binary(op, l, r) => renderBinary(b, op, l, r, inAgg)
    case Unary("-", x) => s"(- ${renderExpr(b, x, inAgg)})"
    case Unary("!", x) => s"(NOT ${renderExpr(b, x, inAgg)})"
    case Unary(op, _) => throw new SqlGenError(s"unknown unary op $op")
    case FStr(parts) =>
      parts.map {
        case IText(s) => strLit(s)
        case IExpr(x) => s"CAST(${renderExpr(b, x, inAgg)} AS STRING)"
      }.mkString("concat(", ", ", ")")
    case SStr(parts) =>
      parts.map {
        case IText(s) => s
        case IExpr(x) => renderExpr(b, x, inAgg)
      }.mkString
    case p: Pipeline => renderExpr(b, inlinePipe(p), inAgg)
    case FuncCall(name, args, named) => renderCall(b, name, args, named, inAgg)
    case Assign(_, x) => renderExpr(b, x, inAgg) // names handled at item level
    case RangeLit(_, _) => throw new SqlGenError("range is only valid in take/in/window")
    // jinja blocks pass through VERBATIM into the SQL text — the
    // reference's exact artifact behavior (translator.rs:44-46 un-mangles
    // `{{`; translate_ident:764 emits jinja idents unquoted): the output
    // is a template for a downstream renderer (dbt-style), not runnable
    // SQL. The DataFrame backend still refuses jinja with a named error —
    // a Catalyst plan cannot defer template expansion.
    case JinjaLit(src) => src
    case other => throw new SqlGenError(s"cannot render expression: $other")
  }

  private def renderBinary(b: Block, op: String, l: Expr, r: Expr, inAgg: Boolean): String =
    (op, l, r) match {
      case ("==", x, NullLit) => s"(${renderExpr(b, x, inAgg)} IS NULL)"
      case ("==", NullLit, x) => s"(${renderExpr(b, x, inAgg)} IS NULL)"
      case ("!=", x, NullLit) => s"(${renderExpr(b, x, inAgg)} IS NOT NULL)"
      case ("!=", NullLit, x) => s"(${renderExpr(b, x, inAgg)} IS NOT NULL)"
      case _ =>
        val o = op match {
          case "==" => "="
          case "!=" => "<>"
          case "and" => "AND"
          case "or" => "OR"
          case x => x
        }
        s"(${renderExpr(b, l, inAgg)} $o ${renderExpr(b, r, inAgg)})"
    }

  private def renderCall(b: Block, name: String, args: List[Expr],
                         named: List[(String, Expr)], inAgg: Boolean): String =
    funcs.get(name) match {
      case Some(fd) => renderExpr(b, inlineFunc(fd, args, named), inAgg)
      case None => name match {
        case n if aggFns(n) =>
          val c = aggSql(b, n, args)
          if (inAgg) c else s"$c ${over(b, withFrame = true)}"
        case n if windowFns(n) =>
          if (inAgg) throw new SqlGenError(s"window function $n inside aggregate")
          windowCall(b, n, args)
        case "round" => args match {
          case List(c, IntLit(n)) => s"round(${renderExpr(b, c, inAgg)}, $n)"
          case List(IntLit(n), c) => s"round(${renderExpr(b, c, inAgg)}, $n)"
          case _ => throw new SqlGenError("round expects (column, n_digits)")
        }
        case "in" => args match {
          case List(RangeLit(lo, hi), v) =>
            val c = renderExpr(b, v, inAgg)
            (lo, hi) match {
              case (Some(a), Some(z)) =>
                s"($c BETWEEN ${renderExpr(b, a, inAgg)} AND ${renderExpr(b, z, inAgg)})"
              case (Some(a), None) => s"($c >= ${renderExpr(b, a, inAgg)})"
              case (None, Some(z)) => s"($c <= ${renderExpr(b, z, inAgg)})"
              case _ => "TRUE"
            }
          case _ => throw new SqlGenError("in expects (range, value)")
        }
        case "as" => args match {
          case List(a, c) => (a, c) match {
            case (Ident(List(ty)), v) if isTypeName(ty) =>
              s"CAST(${renderExpr(b, v, inAgg)} AS ${sparkType(ty)})"
            case (v, Ident(List(ty))) if isTypeName(ty) =>
              s"CAST(${renderExpr(b, v, inAgg)} AS ${sparkType(ty)})"
            case _ => throw new SqlGenError("as expects (column, type)")
          }
          case _ => throw new SqlGenError("as expects (column, type)")
        }
        case "coalesce" =>
          args.map(a => renderExpr(b, a, inAgg)).mkString("coalesce(", ", ", ")")
        case other => throw new SqlGenError(s"unknown function '$other'")
      }
    }

  private def aggSql(b: Block, name: String, args: List[Expr]): String = {
    def one: String = args match {
      case List(a) => renderExpr(b, a, inAgg = true)
      case _ => throw new SqlGenError(s"$name expects one argument")
    }
    name match {
      case "min" => s"min($one)"
      case "max" => s"max($one)"
      case "sum" => s"sum($one)"
      case "avg" | "average" => s"avg($one)"
      case "stddev" => s"stddev($one)"
      case "count" => args match {
        case Nil => "count(1)"
        case List(a) => s"count(${renderExpr(b, a, inAgg = true)})"
        case _ => throw new SqlGenError("count expects zero or one argument")
      }
      case "count_distinct" => s"count(DISTINCT $one)"
      case other => throw new SqlGenError(s"unknown aggregate $other")
    }
  }

  private def windowCall(b: Block, name: String, args: List[Expr]): String = {
    val fn = name match {
      case "rank" => "rank()"
      case "rank_dense" => "dense_rank()"
      case "row_number" => "row_number()"
      case "lag" => args match {
        case List(IntLit(off), v) => s"lag(${renderExpr(b, v, inAgg = false)}, $off)"
        case List(v) => s"lag(${renderExpr(b, v, inAgg = false)}, 1)"
        case _ => throw new SqlGenError("lag expects (offset, column)")
      }
      case "lead" => args match {
        case List(IntLit(off), v) => s"lead(${renderExpr(b, v, inAgg = false)}, $off)"
        case List(v) => s"lead(${renderExpr(b, v, inAgg = false)}, 1)"
        case _ => throw new SqlGenError("lead expects (offset, column)")
      }
      case "first" => args match {
        case List(_, v) => s"first(${renderExpr(b, v, inAgg = false)})"
        case List(v) => s"first(${renderExpr(b, v, inAgg = false)})"
        case _ => throw new SqlGenError("first expects a column")
      }
      case "last" => args match {
        case List(_, v) => s"last(${renderExpr(b, v, inAgg = false)})"
        case List(v) => s"last(${renderExpr(b, v, inAgg = false)})"
        case _ => throw new SqlGenError("last expects a column")
      }
    }
    val frameSensitive = name == "first" || name == "last"
    s"$fn ${over(b, withFrame = frameSensitive)}"
  }

  /** OVER (PARTITION BY ambient-group ORDER BY ambient-sort [frame]) —
    * the same frame-elision rule as Planner.windowSpec: the explicit frame
    * is emitted only when it differs from the SQL default for the sortedness
    * (translator.rs:600-617). */
  private def over(b: Block, withFrame: Boolean): String = {
    val parts = Vector.newBuilder[String]
    if (b.groupKeys.nonEmpty)
      parts += s"PARTITION BY ${b.groupKeys.map(k => renderExpr(b, k, inAgg = false)).mkString(", ")}"
    if (b.sort.nonEmpty)
      parts += s"ORDER BY ${b.sort.map(sortSql(b, _, inOver = true)).mkString(", ")}"
    if (withFrame) {
      val frame = b.frameSpec.getOrElse(FrameSpec("rows", None, None))
      val isSqlDefault =
        if (b.sort.isEmpty) frame == FrameSpec("rows", None, None)
        else frame == FrameSpec("range", None, Some(0L))
      if (!isSqlDefault) {
        def lo(x: Option[Long]) = x match {
          case None => "UNBOUNDED PRECEDING"
          case Some(0L) => "CURRENT ROW"
          case Some(n) if n < 0 => s"${-n} PRECEDING"
          case Some(n) => s"$n FOLLOWING"
        }
        def hi(x: Option[Long]) = x match {
          case None => "UNBOUNDED FOLLOWING"
          case Some(0L) => "CURRENT ROW"
          case Some(n) if n < 0 => s"${-n} PRECEDING"
          case Some(n) => s"$n FOLLOWING"
        }
        val kind = if (frame.kind == "rows") "ROWS" else "RANGE"
        parts += s"$kind BETWEEN ${lo(frame.lo)} AND ${hi(frame.hi)}"
      }
    }
    s"OVER (${parts.result().mkString(" ")})"
  }

  /** Spark reads a bare integer literal in GROUP BY as an ORDINAL
    * (position) — a literal-valued group key (`select [s = 91] | group
    * [grp, s]`) rendered as `GROUP BY (91)` means "column 91", not the
    * constant (fuzz seed 19041; ORDER BY had the same rule fixed at seed
    * 123 via aliases). Wrap such keys so they stay constant expressions —
    * grouping semantics are unchanged (a constant key groups nothing
    * apart) and the select list keeps its own literal rendering. */
  private def deOrdinal(sql: String): String = {
    // strip ALL matching outer paren layers — an s-string key can render
    // with nested parens (`((91))`), which Spark still reads as an ordinal.
    // A layer is only stripped when the leading '(' is closed by the FINAL
    // ')' (VERDICT r13 #7): a naive ends-with peel would walk through
    // comma-adjacent keys like `(a),(b)` — harmless before only because
    // the digit regex fails closed, but wrong the day a group key carries
    // a comma expression.
    def outerParenMatches(s: String): Boolean = {
      var depth = 0; var i = 0
      while (i < s.length - 1) {
        val c = s.charAt(i)
        if (c == '(') depth += 1
        else if (c == ')') { depth -= 1; if (depth == 0) return false }
        i += 1
      }
      depth == 1
    }
    var bare = sql
    while (bare.length >= 2 && bare.startsWith("(") && bare.endsWith(")") &&
        outerParenMatches(bare))
      bare = bare.substring(1, bare.length - 1)
    if (bare.matches("-?\\d+")) s"CAST($bare AS BIGINT)" else sql
  }

  private def sortSql(b: Block, s: SortItem, inOver: Boolean = false): String = {
    val base = s.e match {
      case Ident(List(n)) if inOver && b.env.contains(n) =>
        val sql = b.env(n)
        // OVER(ORDER BY) cannot use select aliases, so the env expression
        // must inline there (unless itself windowed); plain ORDER BY uses
        // the ALIAS — inlining is not merely unnecessary, an inlined
        // integer literal would be read as an ordinal position
        // (`ORDER BY (42)` = column 42; fuzzer seed 123)
        if (sql.contains(" OVER (")) quoteName(n) else s"($sql)"
      case Ident(parts) => parts.map(quoteName).mkString(".")
      case other => throw new SqlGenError(s"sort expects identifiers, got $other")
    }
    if (s.desc) s"$base DESC" else base
  }

  private def strLit(v: String): String =
    "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Does `e` reference bare identifier `n` anywhere? (for shadow/env checks) */
  private def referencesName(e: Expr, n: String): Boolean = e match {
    case Ident(List(x)) => x == n
    case Binary(_, l, r) => referencesName(l, n) || referencesName(r, n)
    case Unary(_, x) => referencesName(x, n)
    case FuncCall(_, args, named) =>
      args.exists(referencesName(_, n)) || named.exists(kv => referencesName(kv._2, n))
    case Assign(_, x) => referencesName(x, n)
    case EList(items) => items.exists(referencesName(_, n))
    case SStr(parts) => parts.exists { case IExpr(x) => referencesName(x, n); case _ => false }
    case FStr(parts) => parts.exists { case IExpr(x) => referencesName(x, n); case _ => false }
    case Pipeline(stages) => stages.exists(referencesName(_, n))
    case RangeLit(s, en) =>
      s.exists(referencesName(_, n)) || en.exists(referencesName(_, n))
    case _ => false
  }
}
