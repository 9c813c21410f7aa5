package graft.plan

import graft.ast._
import graft.ast.Expr._
import graft.parse.SpanMap
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Expression, Literal, NamedExpression, SortOrder}
import org.apache.spark.sql.catalyst.plans.{JoinType, UsingJoin}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Distinct, Filter, Join, JoinHint, Limit, LogicalPlan, Offset, Project, Sort, SubqueryAlias}
import org.apache.spark.sql.GraftPlanBridge
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.{functions => F}

/** Planning error, optionally located at a source [[Span]] (attached by the
  * planner from the parser's span table; rendered into an annotated message
  * at the Graft API boundary, where the source text is known). */
final class PlanError(msg: String, val span: Option[Span]) extends Exception(msg) {
  def this(msg: String) = this(msg, None)
}

/** Lowers a resolved PRQL [[Query]] to a Spark DataFrame by folding each
  * pipeline transform into Catalyst logical-plan nodes. Catalyst is the
  * optimizer: we emit declarative plans (Filter/Project/Aggregate/Join/
  * Window) and rely on predicate pushdown, column pruning and AQE for the
  * physical strategy — the role the target DB plays for the reference
  * (SURVEY.md §3.3, §4).
  *
  * The fold builds ONE UNRESOLVED LogicalPlan and analyzes it exactly once
  * at the end (`Dataset.ofRows`): per-DataFrame-op construction would run
  * the Spark analyzer after every stage (~11 growing passes on a typical
  * query — the r3 compile-latency gap vs the reference's ~300 µs,
  * bench.rs:4). Column existence, join USING checks and the annotate-mode
  * frame traces therefore come from a SYMBOLIC frame ([[Planner.Frame]])
  * tracked through the fold — the reference's own design
  * (semantic/frame.rs:10-25), except ours starts from real source schemas
  * so the checks are exact rather than deferred.
  *
  * Transform semantics follow prql-compiler/src/semantic/transforms.rs:7-253
  * and src/sql/{distinct.rs,un_group.rs,translator.rs}.
  */
final class Planner(spark: SparkSession, catalog: String => DataFrame,
                    query: Query, spans: SpanMap = SpanMap.empty) {

  /** Compile-time scale diagnostics (not errors): plans that are correct but
    * degrade on large clusters — e.g. a window over a global ORDER BY with no
    * PARTITION BY funnels every row through one partition. Populated during
    * planning; surfaced via [[graft.Graft.compileWithDiagnostics]]. */
  val diagnostics = scala.collection.mutable.LinkedHashSet.empty[String]

  /** Per-stage trace: (stage node, frame columns AFTER the stage), in
    * application order, including group/window sub-pipeline stages. Feeds
    * the CLI annotate modes (the reference's prql-frames,
    * semantic/reporting.rs:11-60). */
  val stageFrames = scala.collection.mutable.ArrayBuffer.empty[(Expr, Seq[String])]

  // accessors for graft.Annotate (CLI refs/frames modes)
  def spansForAnnotate: SpanMap = spans
  def userFuncNames: Set[String] = funcs.keySet
  def topLevelStages: Seq[Expr] =
    query.tables.flatMap(_.pipeline.stages) ++
      query.main.map(_.stages).getOrElse(Nil)

  import Planner._

  private val funcs: Map[String, FuncDef] = query.funcs.map(f => f.name -> f).toMap
  private val tableDefs: Map[String, TableDef] = query.tables.map(t => t.name -> t).toMap
  private val tableCache = scala.collection.mutable.Map.empty[String, (LogicalPlan, Frame)]

  /** Symbolic relation layout tracked through the fold (frame.rs:10-25):
    * output column names in order, alias → source-table columns (wildcard
    * expansion), and whether the name list is exact. `exact = false` (an
    * unnamed computed select item whose Spark-generated name we don't
    * replicate) downgrades unknown-column checks to analyzer-deferred
    * rather than risking a false rejection. */
  private final case class Frame(cols: Vector[String],
                                 tables: Map[String, Seq[String]] = Map.empty,
                                 exact: Boolean = true) {
    def hasCol(n: String): Boolean = cols.exists(_.equalsIgnoreCase(n))
  }

  private final case class Ctx(
      plan: LogicalPlan,
      frame: Frame,
      sort: List[SortItem] = Nil,      // ambient sort, feeds OVER(ORDER BY)
      groupKeys: List[Expr] = Nil,     // inside `group` — feeds PARTITION BY
      frameSpec: Option[FrameSpec] = None, // explicit frame from `window ...:`
      inGroupBody: Boolean = false,
      inWindowBody: Boolean = false,   // legality gate, independent of frame
      aggregated: Boolean = false,     // a group body ran `aggregate` (1 row/group)
      checkColumns: Boolean = true,    // off where the frame is one join side
      // hidden sort-carry columns (__gsort_*) a select appended so the
      // ambient sort keeps ordering by the PRE-select value of a name the
      // select dropped or rebound; excluded from the frame, dropped at the
      // pipeline edge (planMain / resolveTable)
      carryCols: Set[String] = Set.empty)

  // ---- Column/expression bridge (Column stays the expression-builder
  //      surface; plans are assembled from the underlying Expressions) ----

  private def sortCol(ctx: Ctx, s: SortItem): Column = {
    // sort may reference columns a projection dropped (SQL ORDER BY
    // semantics): Spark's ResolveMissingReferences pulls them through the
    // child and prunes after the Sort — so no frame pre-check here
    val c = lower(ctx.copy(checkColumns = false), s.e)
    if (s.desc) c.desc else c.asc
  }

  private def ex(c: Column): Expression = GraftPlanBridge.expression(spark, c)
  private def nmd(c: Column): NamedExpression = GraftPlanBridge.toNamed(ex(c))
  private def attr(name: String): NamedExpression = UnresolvedAttribute(Seq(name))
  private def sortOrder(c: Column): SortOrder = ex(c) match {
    case so: SortOrder => so
    case e => SortOrder(e, Ascending)
  }

  def planMain(): DataFrame = {
    val main = query.main.getOrElse(throw new PlanError("query has no main pipeline"))
    val c = planPipelineCtx(main)
    val df = toDf(c.plan)
    // hidden sort-carry columns leave at the pipeline edge (drop is
    // name-based and a no-op for columns the plan no longer exposes)
    if (c.carryCols.isEmpty) df else df.drop(c.carryCols.toSeq: _*)
  }

  /** Unresolved plan only, no analysis — the latency probe uses this to
    * split fold cost from the single analyzer run. */
  private[graft] def planMainUnresolved(): LogicalPlan = {
    val main = query.main.getOrElse(throw new PlanError("query has no main pipeline"))
    planPipelineCtx(main).plan
  }

  /** The single analyzer run of a compile (see the class doc).
    *
    * The session enables Spark's single-pass resolver in tentative mode
    * (Graft.localSession) — ~6× faster than the fixed-point analyzer on the
    * compile-bench query. The resolver is experimental in 4.1 and its
    * ResolverGuard approves UsingJoin plans it then mis-resolves (hidden
    * USING-key columns leak into a Project above an Aggregate →
    * MISSING_ATTRIBUTES on e.g. the book's employees-0), so USING-join
    * plans go straight to the fixed-point analyzer, and ANY single-pass
    * failure falls back to it too — legacy behavior (result or error) is
    * always the one that stands. */
  private def toDf(plan: LogicalPlan): DataFrame = {
    val hasUsingJoin = plan.exists {
      case j: Join => j.joinType.isInstanceOf[UsingJoin]
      case _ => false
    }
    if (hasUsingJoin || !singlePassEnabled) analyzeLegacy(plan)
    else
      try GraftPlanBridge.ofRows(spark, plan)
      catch { case scala.util.control.NonFatal(_) => analyzeLegacy(plan) }
  }

  private def singlePassEnabled: Boolean =
    spark.conf.getOption(Planner.TentativeKey).contains("true")

  private def analyzeLegacy(plan: LogicalPlan): DataFrame =
    if (!singlePassEnabled) GraftPlanBridge.ofRows(spark, plan)
    else
      // thread-local conf override: concurrent compiles on this session
      // keep their own resolver mode (a session-conf toggle here would
      // race a single-pass analysis in flight on another thread)
      GraftPlanBridge.ofRowsWithConf(spark, plan,
        Map(Planner.TentativeKey -> "false"))

  def planPipeline(p: Pipeline): DataFrame = {
    val c = planPipelineCtx(p)
    val df = toDf(c.plan)
    if (c.carryCols.isEmpty) df else df.drop(c.carryCols.toSeq: _*)
  }

  private def planPipelineCtx(p: Pipeline): Ctx =
    // Column builders capture a call-site stack trace per node for DataFrame
    // debugging (Origin) UNLESS an origin is already set — ~22 µs/Column vs
    // ~2 µs. Our errors carry PRQL source spans, not JVM stacks, so pin one
    // empty origin for the whole fold (measured 1.0 ms → ~0.2 ms on the
    // reference's compile-bench query).
    org.apache.spark.sql.catalyst.trees.CurrentOrigin.withOrigin(Planner.foldOrigin) {
      // table-less pipelines (`derive x = 5`) start from a one-row relation
      val unit = Planner.unitDf(spark)
      val init = Ctx(unit.queryExecution.analyzed, Frame(Vector.empty))
      p.stages.foldLeft(init)(applyTransform)
    }

  /** Table defs currently being planned: a def that references its own name
    * (`table trips = (from trips | …)`) resolves the inner name to the BASE
    * catalog table, like the reference's non-recursive WITH
    * (translator.rs:97 hardcodes recursive: false). */
  private val planningDefs = scala.collection.mutable.Set.empty[String]

  private def resolveTable(name: String): (LogicalPlan, Frame) =
    tableCache.get(name) match {
      case Some(pf) => pf
      case None =>
        val pf = tableDefs.get(name) match {
          case Some(t) if !planningDefs(name) =>
            planningDefs += name
            val c = try planPipelineCtx(t.pipeline) finally planningDefs -= name
            // a def whose pipeline carried hidden sort columns must not
            // expose them to consumers' wildcards: re-project the exact
            // frame (inexact frames can't — the corner stays documented)
            val plan =
              if (c.carryCols.isEmpty || !c.frame.exact) c.plan
              else Project(c.frame.cols.map(attr), c.plan)
            (plan, c.frame)
          case _ =>
            // catalog relations arrive as DataFrames, already analyzed when
            // the catalog built them — reuse that plan and schema, no new
            // analyzer pass (self-joins of the same subtree are deduplicated
            // by the analyzer, as with DataFrame self-joins)
            val df = catalog(name)
            (df.queryExecution.analyzed, Frame(df.columns.toVector))
        }
        // cache only fully-resolved defs (a shadowed base read stays uncached
        // so the outer `from name` still gets the def)
        if (!planningDefs(name)) tableCache(name) = pf
        pf
    }

  // ---------------- transforms ----------------

  private def applyTransform(ctx: Ctx, stage: Expr): Ctx = {
    val out =
      try stage match {
        case FuncCall(name, args, named) => applyCall(ctx, name, args, named)
        case Ident(List(name)) if isTransformName(name) =>
          applyCall(ctx, name, Nil, Nil)
        case other =>
          throw new PlanError(s"pipeline stage is not a transform: $other")
      } catch {
        // locate span-less planner errors at the enclosing stage (errors
        // raised while lowering an expression carry the tighter expression
        // span already — see lower/lowerAgg)
        case e: PlanError if e.span.isEmpty =>
          throw new PlanError(e.getMessage, spans.get(stage))
      }
    stageFrames += ((stage, out.frame.cols))
    out
  }

  private def isTransformName(n: String): Boolean = Set(
    "from", "select", "derive", "filter", "aggregate", "sort", "take",
    "join", "group", "window")(n)

  /** Transforms legal inside `group` / `window` sub-pipelines
    * (name_resolver.rs:375-412 / :414-423). */
  private val legalInGroup = Set("select", "derive", "sort", "window", "aggregate", "take")
  private val legalInWindow = Set("select", "derive")

  private def applyCall(ctx: Ctx, name: String, args: List[Expr],
                        named: List[(String, Expr)]): Ctx = {
    if (isTransformName(name)) {
      if (ctx.inWindowBody && !legalInWindow(name))
        throw new PlanError(
          s"transform '$name' is not allowed inside window (only select/derive; name_resolver.rs:414-423)")
      if (!ctx.inWindowBody && ctx.inGroupBody && !legalInGroup(name))
        throw new PlanError(
          s"transform '$name' is not allowed inside group (only ${legalInGroup.mkString("/")}; name_resolver.rs:375-412)")
    }
    applyCallChecked(ctx, name, args, named)
  }

  private def applyCallChecked(ctx: Ctx, name: String, args: List[Expr],
                               named: List[(String, Expr)]): Ctx = name match {
    case "from" =>
      val (alias, tbl) = args match {
        case List(Assign(a, Ident(List(t)))) => (a, t)
        case List(Ident(List(t))) => (t, t)
        case List(JinjaLit(src)) => throw new PlanError(
          s"jinja block $src parses but is unsupported in execution (the reference only renders SQL text)")
        case _ => throw new PlanError(s"from expects a table name, got $args")
      }
      val (base, baseFrame) = resolveTable(tbl)
      ctx.copy(plan = SubqueryAlias(alias, base),
        frame = Frame(baseFrame.cols, Map(alias -> baseFrame.cols)),
        sort = Nil, groupKeys = Nil)

    case "select" =>
      val items = assignItems(args)
      val cols = items.map {
        case (Some(n), e) => nmd(lower(ctx, e).as(n))
        case (None, e) => nmd(lower(ctx, e))
      }
      // symbolic output names: assigns and idents are exact; a `t.*`
      // wildcard expands through the alias map; any other unnamed computed
      // item gets Spark's generated name at analysis, which we don't
      // replicate — mark the frame inexact so later checks defer
      var exact = ctx.frame.exact
      val names = items.flatMap {
        case (Some(n), _) => Vector(n)
        case (None, Ident(List("*"))) => ctx.frame.cols
        case (None, Ident(parts)) if parts.last == "*" =>
          ctx.frame.tables.get(parts.head) match {
            case Some(cs) => cs.toVector
            case None => exact = false; Vector(parts.mkString("."))
          }
        case (None, Ident(parts)) => Vector(parts.last)
        case (None, e) => exact = false; Vector(prettyName(e))
      }.toVector
      // The ambient sort happened at ITS pipeline position over the
      // PRE-select values (SQL ORDER BY semantics). A name this select
      // DROPS or REBINDS to a different expression — or a qualified ident
      // whose alias path a projection kills — must keep its old value
      // available for a later take's re-sort or an OVER(ORDER BY):
      // carry it through the projection under a hidden mangled column and
      // repoint the ambient sort at it (the SqlGen carry, DataFrame side;
      // r9 review). Carries stay out of the frame and drop at the
      // pipeline edge.
      val rebound: Set[String] = items.collect {
        case (Some(n), e) if e != Ident(List(n)) => n
      }.toSet
      val needCarry: List[List[String]] = ctx.sort.flatMap(_.e match {
        case Ident(parts @ List(n)) if rebound.contains(n) ||
            !names.exists(_.equalsIgnoreCase(n)) => Some(parts)
        case Ident(parts) if parts.length > 1 => Some(parts)
        case _ => None
      }).distinct
      val carryCols = needCarry.map { p =>
        val m = s"__gsort_${p.mkString("_")}"
        // a re-carry references the previous hidden column, which the
        // frame deliberately does not list — skip the symbolic check
        m -> nmd(lower(ctx.copy(checkColumns = false), Ident(p)).as(m))
      }
      val mmap = needCarry.map(p => p -> s"__gsort_${p.mkString("_")}").toMap
      val sortR = ctx.sort.map { si =>
        si.e match {
          case Ident(p) if mmap.contains(p) => si.copy(e = Ident(List(mmap(p))))
          case _ => si
        }
      }
      ctx.copy(plan = Project(cols ++ carryCols.map(_._2), ctx.plan),
        frame = Frame(names, ctx.frame.tables, exact),
        sort = sortR,
        carryCols = ctx.carryCols ++ carryCols.map(_._1))

    case "derive" =>
      // each item may reference earlier items (shadowing) → one Project per
      // item; unresolved nesting is free, the analyzer runs once at the end
      val (plan, frame, sortF, carryF) = assignItems(args)
        .foldLeft((ctx.plan, ctx.frame, ctx.sort, ctx.carryCols)) {
        case ((p, fr, srt, cc), (nameOpt, e)) =>
          val name = nameOpt.getOrElse(prettyName(e))
          val c = nmd(lower(ctx.copy(plan = p, frame = fr), e).as(name))
          fr.cols.indexWhere(_.equalsIgnoreCase(name)) match {
            case -1 =>
              // append: star + new column (robust to duplicate upstream
              // names; the star keeps any hidden carries flowing)
              (Project(Vector(UnresolvedStar(None), c), p),
                fr.copy(cols = fr.cols :+ name), srt, cc)
            case i =>
              // shadow: re-project by name, replacing in place
              // (frame.rs:28-43). Two fuzz-found rules (r11 seeds 9331,
              // 13574): an ambient sort referencing the REBOUND name must
              // keep ordering by the OLD value — carry it under a hidden
              // column and repoint the sort (the select-rebind rule); and
              // the by-name re-projection must not drop carries earlier
              // stages created.
              val sortHit = srt.exists(_.e match {
                case Ident(List(s)) => s.equalsIgnoreCase(name)
                case _ => false
              })
              val m = s"__gsort_$name"
              val carryNew =
                if (sortHit) Seq(nmd(F.col(quoteName(name)).as(m))) else Nil
              val srt2 = if (!sortHit) srt else srt.map { si =>
                si.e match {
                  case Ident(List(s)) if s.equalsIgnoreCase(name) =>
                    si.copy(e = Ident(List(m)))
                  case _ => si
                }
              }
              // A carry named `m` from an EARLIER shadow of the same column
              // is dead once a fresh `sort name` re-established the bare
              // name as the order key (sort never clears carryCols) — keep
              // both and the Project emits two `__gsort_name` attributes,
              // and the next repoint hits an ambiguous reference. Replace,
              // never append.
              val ccKept =
                if (sortHit) cc.filterNot(_.equalsIgnoreCase(m)) else cc
              val outCols = fr.cols.zipWithIndex.map {
                case (_, `i`) => c
                case (n, _) => attr(n)
              } ++ ccKept.toSeq.sorted.map(attr) ++ carryNew
              (Project(outCols, p), fr.copy(cols = fr.cols.updated(i, name)),
                srt2, ccKept ++ carryNew.map(_ => m))
          }
      }
      ctx.copy(plan = plan, frame = frame, sort = sortF, carryCols = carryF)

    case "filter" =>
      if (args.isEmpty) throw new PlanError("filter expects a condition")
      val conds = args.map(a => lower(ctx, a))
      ctx.copy(plan = Filter(ex(conds.reduce(_ && _)), ctx.plan))

    case "sort" =>
      val items = sortItems(args)
      if (ctx.inGroupBody)
        // inside `group` bodies the sort only feeds OVER(ORDER BY); the
        // reference drops it from output order too (un_group.rs:6-37)
        ctx.copy(sort = items)
      else
        ctx.copy(plan = Sort(items.map(s => sortOrder(sortCol(ctx, s))),
          global = true, ctx.plan), sort = items)

    case "aggregate" =>
      val items = aggItems(args)
      val aggCols = items.map { case (nameOpt, e) =>
        val c = lowerAgg(ctx, e)
        nmd(nameOpt.map(c.as).getOrElse(c.as(prettyName(e))))
      }
      if (items.isEmpty) throw new PlanError("aggregate expects at least one expression")
      val keyCols = ctx.groupKeys.map(k => nmd(lower(ctx, k)))
      val out = Aggregate(keyCols, keyCols ++ aggCols, ctx.plan)
      val keyNames = ctx.groupKeys.map {
        case Ident(parts) => parts.last
        case other => prettyName(other)
      }
      val frame = Frame((keyNames ++ items.map { case (n, e) =>
        n.getOrElse(prettyName(e)) }).toVector, exact = ctx.frame.exact)
      // inside a group body, keep the keys: the reference distributes them
      // into any LATER take in the body (name_resolver.rs:383-388), so
      // `group k (aggregate […] | take n)` stays per-group.
      // carryCols clears WITH the sort (r14, fuzz seed 33932): the
      // Aggregate's output is keys+aggs only, so any hidden __gsort_*
      // carry is gone from the plan — a later derive-rebind or
      // grouped-take that re-projected ctx.carryCols above this node
      // referenced a dead column (UNRESOLVED_COLUMN). The ambient sort
      // the carries served is dead here anyway (un_group.rs semantics).
      ctx.copy(plan = out, frame = frame,
        groupKeys = if (ctx.inGroupBody) ctx.groupKeys else Nil,
        sort = Nil, aggregated = ctx.inGroupBody, carryCols = Set.empty)

    case "take" => applyTake(ctx, args)

    case "join" => applyJoin(ctx, args, named)

    case "join_asof" => applyJoinAsof(ctx, args, named)

    case "group" =>
      val (keys, body) = args match {
        case List(k, b) => (keyList(k), bodyStages(b))
        case _ => throw new PlanError("group expects keys and a sub-pipeline")
      }
      // group clears the ambient sort (frame.rs:65-72)
      val entry = ctx.copy(sort = Nil, groupKeys = keys, inGroupBody = true,
        aggregated = false)
      val out = body.foldLeft(entry)(applyTransform)
      out.copy(groupKeys = Nil, sort = Nil, inGroupBody = ctx.inGroupBody,
        frameSpec = None, aggregated = ctx.aggregated)

    case "window" =>
      val body = args match {
        case List(b) => bodyStages(b)
        case _ => throw new PlanError("window expects a sub-pipeline")
      }
      val spec = frameSpecOf(named, diagnostics += _)
      val entry = ctx.copy(frameSpec = Some(spec), inWindowBody = true)
      val out = body.foldLeft(entry)(applyTransform)
      out.copy(frameSpec = ctx.frameSpec, inWindowBody = ctx.inWindowBody)

    case fname =>
      throw new PlanError(s"'$fname' is not a transform (stage-position call)")
  }

  // ---- take (transforms.rs:88-101; distinct.rs for grouped) ----

  private def applyTake(ctx: Ctx, args: List[Expr]): Ctx = {
    val rng: (Option[Long], Option[Long]) = args match {
      case List(IntLit(n)) => (None, Some(n))
      case List(RangeLit(s, e)) => (s.map(asLong), e.map(asLong))
      case _ => throw new PlanError(s"take expects an int or range, got $args")
    }
    def limit(p: LogicalPlan, n: Long) = Limit(Literal(n.toInt), p)
    def offset(p: LogicalPlan, n: Long) = Offset(Literal(n.toInt), p)
    if (ctx.groupKeys.isEmpty) {
      // 1-based inclusive positional slice (translator.rs:194-212)
      if (rng._1.exists(_ > 1))
        diagnostics += ("`take a..b` with an offset funnels the whole prefix " +
          "through a single partition (inherent to global positional " +
          "slicing). For deep pagination at scale prefer keyset filtering " +
          "(filter key > last_seen | take n).")
      // the slice selects rows UNDER THE AMBIENT SORT (the reference's
      // final ORDER BY … LIMIT): re-establish it here — an interposing
      // order-destroying operator (a sort-merge join re-clusters by its
      // key) otherwise leaves Limit taking engine-order rows (r9 review;
      // Catalyst's EliminateSorts removes the re-sort when the child
      // ordering already satisfies it, so the plain sort|take plan is
      // unchanged)
      val base =
        if (ctx.sort.isEmpty) ctx.plan
        else Sort(ctx.sort.map(s => sortOrder(sortCol(ctx, s))), global = true, ctx.plan)
      val plan = rng match {
        case (None, Some(n)) => limit(base, n)
        case (Some(a), Some(b)) => limit(offset(base, a - 1), b - a + 1)
        case (Some(a), None) => offset(base, a - 1)
        case (None, None) => ctx.plan
      }
      ctx.copy(plan = plan)
    } else if (ctx.aggregated && ctx.sort.isEmpty) {
      // take after `aggregate` in a group body: exactly one row per group, so
      // the reference's per-group ROW_NUMBER filter keeps each row iff
      // 1 ∈ [lo..hi] — deterministic even without a sort. Both bounds must
      // admit 1: `take 0` or `take 2..` keep nothing
      val keepsFirst = rng._1.forall(_ <= 1) && rng._2.forall(_ >= 1)
      ctx.copy(plan = if (keepsFirst) ctx.plan else limit(ctx.plan, 0))
    } else {
      // grouped take — the reference's signature rewrite (distinct.rs:8-126)
      rng match {
        case (None | Some(1), Some(1)) if ctx.sort.isEmpty =>
          // unsorted `group ks (take 1)` / `take 1..1` → SELECT DISTINCT over
          // the whole frame, unconditionally (distinct.rs:33-40,
          // take_only_first: start.unwrap_or(1)==1 && end==Some(1)) — never
          // an arbitrary row per group. Hidden sort carries must NOT join
          // the distinct key set (they would change the multiset): project
          // the visible frame first.
          val base =
            if (ctx.carryCols.isEmpty) ctx.plan
            else if (ctx.frame.exact)
              Project(ctx.frame.cols.map(attr), ctx.plan)
            else throw new PlanError(
              "grouped take 1 after a select that dropped a sorted name from an " +
                "inexact frame is ambiguous — name the select's computed items")
          ctx.copy(plan = Distinct(base), carryCols = Set.empty)
        case (lo, hi) =>
          if (ctx.sort.isEmpty)
            throw new PlanError(
              "grouped take of a range beyond the first row requires a sort inside " +
                "the group: the reference emits ROW_NUMBER() with no ORDER BY here " +
                "(distinct.rs:60-126), which picks arbitrary rows — this engine " +
                "refuses to produce nondeterministic results")
          val w = Window.partitionBy(ctx.groupKeys.map(k => lower(ctx, k)): _*)
            .orderBy(ctx.sort.map(sortCol(ctx, _)): _*)
          val rn = "_rn_graft"
          val withRn = Project(Vector(UnresolvedStar(None),
            nmd(F.row_number().over(w).as(rn))), ctx.plan)
          val cond = (lo, hi) match {
            case (None, Some(n)) => F.col(rn) <= n
            case (Some(a), Some(b)) => F.col(rn).between(a, b)
            case (Some(a), None) => F.col(rn) >= a
            case (None, None) => F.lit(true)
          }
          // drop the helper column by re-projecting the original frame —
          // valid only when the symbolic names are trustworthy (frame is
          // exact) and unambiguous (no duplicate names, e.g. post-join).
          // Otherwise analyze the sub-plan now and drop by Dataset.drop,
          // which is name-independent for every OTHER column; the resolved
          // subtree splices back into the fold (analysis is idempotent).
          val filtered = Filter(ex(cond), withRn)
          // the exact-frame Project drops any hidden __gsort_* carry from
          // the plan, so carryCols must clear with it (r14, the fuzz seed
          // 33932 class — a later stage re-projecting a dead carry); the
          // Dataset.drop(rn) path keeps every other column, carries
          // included, so there the bookkeeping stays
          if (ctx.frame.exact &&
              ctx.frame.cols.distinct.length == ctx.frame.cols.length)
            ctx.copy(plan = Project(ctx.frame.cols.map(attr), filtered),
              carryCols = Set.empty)
          else
            ctx.copy(plan = GraftPlanBridge.analyzed(toDf(filtered).drop(rn)))
      }
    }
  }

  // ---- join (transforms.rs:102-144, translator.rs:725-753) ----

  private def applyJoin(ctx: Ctx, args: List[Expr], named: List[(String, Expr)]): Ctx = {
    var side = "inner"
    named.foreach {
      case ("side", Ident(List(s))) => side = s
      case ("side", other) => throw new PlanError(s"bad join side: $other")
      case (n, _) => throw new PlanError(s"unknown join named arg: $n")
    }
    val sparkSide = side match {
      case "inner" => "inner"
      case "left" => "left"
      case "right" => "right"
      case "full" => "full"
      case s => throw new PlanError(s"unknown join side '$s'")
    }
    var tableOpt: Option[(String, String)] = None // (alias, table)
    var conds: List[Expr] = Nil
    // the reference unpacks exactly [with, filter] and errors on extras
    // (transforms.rs:102-144) — never silently drop a condition argument
    def addConds(cs: List[Expr]): Unit =
      if (conds.isEmpty) conds = cs
      else throw new PlanError(
        "join takes one condition argument (a list or a single expression); " +
          "combine multiple conditions with `and` or a [list]")
    args.foreach {
      case Assign(a, Ident(List(t))) if tableOpt.isEmpty => tableOpt = Some((a, t))
      case Ident(List(t)) if tableOpt.isEmpty => tableOpt = Some((t, t))
      case EList(items) => addConds(items)
      case e if tableOpt.isDefined => addConds(List(e))
      case e => throw new PlanError(s"bad join arg: $e")
    }
    val (alias, tbl) = tableOpt.getOrElse(throw new PlanError("join needs a table"))
    val (rightBase, rightFrame) = resolveTable(tbl)
    val right = SubqueryAlias(alias, rightBase)
    val joinType = JoinType(sparkSide)
    // all-bare-idents → USING (deduped key columns); else ON with AND-merge
    val usingCols = conds.collect { case Ident(List(c)) => c }
    val (joined, frame) =
      if (conds.nonEmpty && usingCols.length == conds.length) {
        // USING requires the columns on BOTH sides (name_resolver.rs:223-252).
        // Only enforce against a side whose symbolic frame is exact — an
        // inexact frame (unnamed computed select item, unexpandable t.*) can
        // be missing names the real schema has, and a false rejection here
        // would block a valid query the analyzer would accept (the unknown-
        // ident check at `identCol` defers the same way).
        usingCols.foreach { c =>
          if (ctx.frame.exact && !ctx.frame.cols.contains(c))
            throw new PlanError(s"join USING column '$c' is missing from the left side")
          if (rightFrame.exact && !rightFrame.cols.contains(c))
            throw new PlanError(s"join USING column '$c' is missing from the right side ('$tbl')")
        }
        // Spark USING output: key cols, then left non-key, then right non-key
        val cols = usingCols.toVector ++
          ctx.frame.cols.filterNot(usingCols.contains) ++
          rightFrame.cols.filterNot(usingCols.contains)
        (Join(ctx.plan, right, UsingJoin(joinType, usingCols), None, JoinHint.NONE),
          Frame(cols, ctx.frame.tables + (alias -> rightFrame.cols),
            ctx.frame.exact && rightFrame.exact))
      } else {
        val cond = conds.map(c => lowerJoinCond(ctx, rightFrame, c)).reduce(_ && _)
        (Join(ctx.plan, right, joinType, Some(ex(cond)), JoinHint.NONE),
          Frame(ctx.frame.cols ++ rightFrame.cols,
            ctx.frame.tables + (alias -> rightFrame.cols),
            ctx.frame.exact && rightFrame.exact))
      }
    ctx.copy(plan = joined, frame = frame)
  }

  // ---- join_asof (SURPLUS transform — the reference has none; SURVEY
  // §2.10 marks it surplus. p34's tagged-union shape behind the language
  // surface: `join_asof right [keys] on:ord tie:col`.) ----

  /** As-of join: for each left row, attach the LATEST right row with
    * right.`ord` <= left.`ord` among equal `keys` (ties on `ord`: the
    * right row still matches — as-of is <= — and among equal-`ord` right
    * rows the highest `tie` wins; `tie` is required so the result is
    * deterministic). Right-side non-key columns come back renamed
    * `<alias>_<col>`.
    *
    * Plan shape (the p34 contract): tagged UNION of both sides, ONE
    * window per key partition carrying `last(<right payload struct>
    * IGNORE NULLS)` over the event order, filter back to left rows —
    * one `keys` shuffle, ZERO row amplification, no range product. The
    * right payload rides as a single STRUCT so a match is always one
    * whole right row (per-column last-ignore-nulls would stitch
    * different rows when right columns contain nulls). Keys are
    * REQUIRED: a key-less as-of is a global-sort single-partition stage,
    * the hazard class the compile diagnostics exist for.
    *
    * The sub-plans analyze here (Dataset API needs schemas for the
    * null-typed union); the resolved subtree splices back into the fold
    * like applyTake's drop path — analysis is idempotent. */
  private def applyJoinAsof(ctx: Ctx, args: List[Expr],
                            named: List[(String, Expr)]): Ctx = {
    var ord: Option[String] = None
    var tie: Option[String] = None
    named.foreach {
      case ("on", Ident(List(c))) => ord = Some(c)
      case ("tie", Ident(List(c))) => tie = Some(c)
      case (n, v) => throw new PlanError(s"unknown join_asof named arg $n:$v " +
        "(expected on:<ord-column> and tie:<tiebreak-column>)")
    }
    var tableOpt: Option[(String, String)] = None
    var keys: List[String] = Nil
    args.foreach {
      case Assign(a, Ident(List(t))) if tableOpt.isEmpty => tableOpt = Some((a, t))
      case Ident(List(t)) if tableOpt.isEmpty => tableOpt = Some((t, t))
      case EList(items) if keys.isEmpty && items.nonEmpty =>
        keys = items.map {
          case Ident(List(c)) => c
          case other => throw new PlanError(s"join_asof keys must be bare idents, got $other")
        }
      case e => throw new PlanError(s"bad join_asof arg: $e")
    }
    val (alias, tbl) = tableOpt.getOrElse(throw new PlanError("join_asof needs a table"))
    val ordCol = ord.getOrElse(throw new PlanError(
      "join_asof requires on:<ord-column> (the as-of ordering column, present on both sides)"))
    val tieCol = tie.getOrElse(throw new PlanError(
      "join_asof requires tie:<tiebreak-column> — without it, equal-ord matches are nondeterministic"))
    if (keys.isEmpty) throw new PlanError(
      "join_asof requires at least one equi key: a key-less as-of join is a " +
        "single-partition global sort at scale — partition the match by a key")
    val (rightBase, _) = resolveTable(tbl)
    val leftDf = toDf(ctx.plan)
    val rightDf = toDf(SubqueryAlias(alias, rightBase))
    def requireCols(df: DataFrame, side: String): Unit =
      (keys :+ ordCol :+ tieCol).foreach { c =>
        if (!df.columns.contains(c)) throw new PlanError(
          s"join_asof column '$c' is missing from the $side side (has: ${df.columns.mkString(", ")})")
      }
    requireCols(leftDf, "left"); requireCols(rightDf, s"right ('$tbl')")
    // NULL semantics (the equi-join contract): a right row with a NULL
    // key or NULL ord can never be anyone's match — without this filter,
    // ascending NULLS-FIRST ordering would hand a null-ord right row to
    // every left row lacking a real predecessor, and null keys would
    // match each other. Left rows keep their left-preserving behavior: a
    // null-key or null-ord left row simply matches nothing (its partition
    // holds no right rows / its frame starts before every right row).
    val rightClean = rightDf.filter(
      (keys :+ ordCol).map(c => rightDf(c).isNotNull).reduce(_ && _))
    val leftCols = leftDf.columns.toSeq
    val carried = rightDf.columns.toSeq.filterNot(keys.contains)
    val outNames = carried.map(c => s"${alias}_$c")
    outNames.find(leftCols.contains).foreach { n =>
      throw new PlanError(s"join_asof output column '$n' collides with a left column — " +
        "alias the right table or rename the left column")
    }
    val o = "__graft_asof_ord"; val t = "__graft_asof_tie"
    val il = "__graft_asof_il"; val r = "__graft_asof_r"
    val rStruct = F.struct(carried.map(c => rightClean(c).as(c)): _*)
    val rType = rightClean.select(rStruct.as(r)).schema(r).dataType
    val lTag = leftDf.select(
      keys.map(leftDf(_)) ++ Seq(leftDf(ordCol).as(o), leftDf(tieCol).as(t),
        F.lit(1).as(il), F.lit(null).cast(rType).as(r)) ++
        leftCols.filterNot(keys.contains).map(leftDf(_)): _*)
    val rTag = rightClean.select(
      keys.map(rightClean(_)) ++ Seq(rightClean(ordCol).as(o), rightClean(tieCol).as(t),
        F.lit(0).as(il), rStruct.as(r)) ++
        leftCols.filterNot(keys.contains).map(c =>
          F.lit(null).cast(leftDf.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(keys.map(F.col): _*)
      .orderBy(F.col(o).asc, F.col(il).asc, F.col(t).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lTag.unionByName(rTag)
      .withColumn(r, F.last(F.col(r), ignoreNulls = true).over(w))
    val out = matched.filter(F.col(il) === 1).select(
      leftCols.map(F.col) ++
        carried.zip(outNames).map { case (c, n) => F.col(s"$r.$c").as(n) }: _*)
    ctx.copy(plan = GraftPlanBridge.analyzed(out),
      frame = Frame((leftCols ++ outNames).toVector,
        ctx.frame.tables + (alias -> outNames.toVector), exact = true))
  }

  /** Lower a join condition with explicit side scoping
    * (name_resolver.rs:223-252): a bare ident present on exactly one side
    * resolves to that side's column; present on both sides → error (the user
    * must qualify with the table alias); qualified `alias.col` idents are
    * scoped by the analyzer through the subquery aliases — as is a bare
    * ident present on exactly one side, which is unambiguous by the same
    * check. */
  private def lowerJoinCond(ctx: Ctx, rightFrame: Frame, e: Expr): Column = {
    def go(x: Expr): Column = x match {
      case Ident(List(n)) =>
        val inL = ctx.frame.cols.contains(n)
        val inR = rightFrame.cols.contains(n)
        if (inL && inR) throw new PlanError(
          s"join condition column '$n' exists on both sides — qualify it with the table alias")
        else if (inL || inR) F.col(quoteName(n))
        else throw new PlanError(s"join condition column '$n' not found on either side")
      case Ident(parts) => identCol(parts) // alias-qualified: analyzer scopes it
      case Binary(op, l, r) => (op, l, r) match {
        case ("==", v, NullLit) => go(v).isNull
        case ("==", NullLit, v) => go(v).isNull
        case ("!=", v, NullLit) => go(v).isNotNull
        case ("!=", NullLit, v) => go(v).isNotNull
        case _ => binaryCol(op, go(l), go(r), l, r)
      }
      case Unary("-", v) => -go(v)
      case Unary("!", v) => !go(v)
      // nested expressions may reference either side — let the analyzer
      // scope their idents rather than checking against the left frame
      case _ => lower(ctx.copy(checkColumns = false), x)
    }
    go(e)
  }

  // ---- group/window helpers ----

  // ---- select/derive/aggregate item shapes ----

  // ---------------- expression lowering ----------------

  private val aggFns = Set("min", "max", "sum", "avg", "average", "stddev",
    "count", "count_distinct")
  private val rankingFns = Set("rank", "rank_dense", "row_number", "lag", "lead")
  private val windowFns = rankingFns ++ Set("first", "last")

  /** Normal-context lowering: aggregate/window functions are auto-wrapped in
    * OVER(ambient group, ambient sort, ambient frame)
    * (name_resolver.rs:332-373). */
  private def lower(ctx: Ctx, e: Expr): Column = e match {
    // zero-arg function referenced bare: `ct = count`, `rn = row_number`
    case Ident(List(n)) if n == "count" =>
      F.count(F.lit(1)).over(windowSpec(ctx, withFrame = true))
    case Ident(List(n)) if n == "rank" || n == "rank_dense" || n == "row_number" =>
      windowColumn(ctx, n, Nil)
    case Ident(List(n)) if funcs.get(n).exists(_.params.isEmpty) =>
      lower(ctx, funcs(n).body)
    case id @ Ident(parts) =>
      // single-part idents must name a column of the current frame — check
      // here (with a located error listing the frame) instead of deferring
      // to the Spark analyzer's unlocated UNRESOLVED_COLUMN. Qualified and
      // wildcard idents stay analyzer-scoped (aliases, `t.*`).
      if (ctx.checkColumns && ctx.frame.exact && parts.lengthCompare(1) == 0 &&
          parts.head != "*") {
        if (!ctx.frame.hasCol(parts.head))
          throw new PlanError(
            s"unknown column '${parts.head}' (frame: ${frameHint(ctx)})", spans.get(id))
        // a name present MORE THAN ONCE (a join re-introduced a column the
        // frame already carries) is a located rejection, mirroring the
        // reference's "Ambiguous reference. Could be from either of …"
        // (name_resolver.rs:509-520) — found by the r10 differential fuzz
        // (seed 543): deferring let Spark throw an unlocated
        // AMBIGUOUS_REFERENCE at analysis instead
        if (ctx.frame.cols.count(_.equalsIgnoreCase(parts.head)) > 1)
          throw new PlanError(
            s"ambiguous reference '${parts.head}' — the frame carries it more " +
              s"than once (a join re-introduced it); qualify it with the table " +
              s"alias (frame: ${frameHint(ctx)})", spans.get(id))
      }
      identCol(parts)
    case NullLit => F.lit(null)
    case IntLit(v) => F.lit(v)
    case FloatLit(v) => F.lit(v)
    case BoolLit(v) => F.lit(v)
    case StrLit(v) => F.lit(v)
    case DateLit(s) => F.lit(s).cast(org.apache.spark.sql.types.DateType)
    case TimestampLit(s) => F.lit(s).cast(org.apache.spark.sql.types.TimestampType)
    case TimeLit(s) => F.lit(s) // no Spark TIME type; string pass-through like the reference
    case IntervalLit(n, unit) => F.expr(s"INTERVAL $n $unit")
    case Binary(op, l, r) => lowerBinary(ctx, op, l, r)
    case Unary("-", x) => -lower(ctx, x)
    case Unary("!", x) => !lower(ctx, x)
    case Unary(op, x) => throw new PlanError(s"unknown unary op $op")
    case FStr(parts) =>
      F.concat(parts.map {
        case IText(s) => F.lit(s)
        case IExpr(x) => lower(ctx, x).cast("string")
      }: _*)
    case SStr(parts) => F.expr(sstringSql(parts))
    case p: Pipeline => lower(ctx, inlinePipe(p))
    case fc @ FuncCall(name, args, named) =>
      try lowerCall(ctx, name, args, named, inAgg = false)
      catch {
        case e: PlanError if e.span.isEmpty =>
          throw new PlanError(e.getMessage, spans.get(fc))
      }
    case Assign(n, x) => lower(ctx, x).as(n)
    case RangeLit(_, _) => throw new PlanError("range is only valid in take/in/window")
    case JinjaLit(src) => throw new PlanError(
      s"jinja block $src parses but is unsupported in execution (the reference only renders SQL text)")
    case other => throw new PlanError(s"cannot lower expression: $other")
  }

  /** Aggregate-context lowering: agg functions lower plainly (no OVER). */
  private def lowerAgg(ctx: Ctx, e: Expr): Column = e match {
    case Ident(List("count")) => F.count(F.lit(1)) // `ct = count` (stdlib.prql:9)
    case Ident(List(n)) if funcs.get(n).exists(_.params.isEmpty) =>
      lowerAgg(ctx, funcs(n).body)
    case FuncCall(name, args, named) if !funcs.contains(name) && aggFns(name) =>
      aggColumn(ctx, name, args)
    case fc @ FuncCall(name, args, named) =>
      try lowerCall(ctx, name, args, named, inAgg = true)
      catch {
        case e: PlanError if e.span.isEmpty =>
          throw new PlanError(e.getMessage, spans.get(fc))
      }
    case Binary(op, l, r) =>
      binaryCol(op, lowerAgg(ctx, l), lowerAgg(ctx, r), l, r)
    case Unary("-", x) => -lowerAgg(ctx, x)
    case Unary("!", x) => !lowerAgg(ctx, x)
    case FStr(parts) =>
      F.concat(parts.map {
        case IText(t) => F.lit(t)
        case IExpr(x) => lowerAgg(ctx, x).cast("string")
      }: _*)
    case p: Pipeline => lowerAgg(ctx, inlinePipe(p))
    case SStr(parts) => F.expr(sstringSql(parts))
    case other => lower(ctx, other)
  }

  private def lowerCall(ctx: Ctx, name: String, args: List[Expr],
                        named: List[(String, Expr)], inAgg: Boolean): Column = {
    funcs.get(name) match {
      case Some(fd) =>
        val body = inlineFunc(fd, args, named)
        if (inAgg) lowerAgg(ctx, body) else lower(ctx, body)
      case None =>
        name match {
          case n if aggFns(n) =>
            val c = aggColumn(ctx, n, args)
            if (inAgg) c else c.over(windowSpec(ctx, withFrame = true))
          case n if windowFns(n) =>
            if (inAgg) throw new PlanError(s"window function $n inside aggregate")
            windowColumn(ctx, n, args)
          case "round" => args match {
            case List(c, IntLit(n)) => F.round(lowerIn(ctx, c, inAgg), n.toInt)
            case List(IntLit(n), c) => F.round(lowerIn(ctx, c, inAgg), n.toInt)
            case _ => throw new PlanError("round expects (column, n_digits)")
          }
          case "in" => args match {
            // stdlib: func in range value (piped value arrives last)
            case List(RangeLit(lo, hi), v) =>
              val c = lowerIn(ctx, v, inAgg)
              (lo, hi) match {
                case (Some(a), Some(b)) => c.between(lower(ctx, a), lower(ctx, b))
                case (Some(a), None) => c >= lower(ctx, a)
                case (None, Some(b)) => c <= lower(ctx, b)
                case _ => F.lit(true)
              }
            case _ => throw new PlanError("in expects (range, value)")
          }
          case "as" => args match {
            // `as col type` direct vs `(col | as type)` piped — pick the arg
            // that names a type (stdlib.prql:22 has no fixed call order in use)
            case List(a, b) =>
              (a, b) match {
                case (Ident(List(ty)), v) if isTypeName(ty) =>
                  lowerIn(ctx, v, inAgg).cast(sparkType(ty))
                case (v, Ident(List(ty))) if isTypeName(ty) =>
                  lowerIn(ctx, v, inAgg).cast(sparkType(ty))
                case _ => throw new PlanError("as expects (column, type)")
              }
            case _ => throw new PlanError("as expects (column, type)")
          }
          case "coalesce" => F.coalesce(args.map(a => lowerIn(ctx, a, inAgg)): _*)
          case other => throw new PlanError(s"unknown function '$other'")
        }
    }
  }

  private def lowerIn(ctx: Ctx, e: Expr, inAgg: Boolean): Column =
    if (inAgg) lowerAgg(ctx, e) else lower(ctx, e)

  private def aggColumn(ctx: Ctx, name: String, args: List[Expr]): Column = {
    def one: Column = args match {
      case List(a) => lowerAgg(ctx, a)
      case _ => throw new PlanError(s"$name expects one argument")
    }
    name match {
      case "min" => F.min(one)
      case "max" => F.max(one)
      case "sum" => F.sum(one)
      case "avg" | "average" => F.avg(one)
      case "stddev" => F.stddev(one)
      case "count" => args match {
        case Nil => F.count(F.lit(1))
        case List(a) => F.count(lowerAgg(ctx, a))
        case _ => throw new PlanError("count expects zero or one argument")
      }
      case "count_distinct" => F.countDistinct(one)
      case other => throw new PlanError(s"unknown aggregate $other")
    }
  }

  /** Ranking/offset/value window functions (stdlib.prql:25-31). */
  private def windowColumn(ctx: Ctx, name: String, args: List[Expr]): Column = {
    def colArg(i: Int): Column = lower(ctx, args(i))
    val c = name match {
      case "rank" => F.rank()
      case "rank_dense" => F.dense_rank()
      case "row_number" => F.row_number()
      case "lag" => args match {
        case List(IntLit(off), v) => F.lag(lower(ctx, v), off.toInt)
        case List(v) => F.lag(lower(ctx, v), 1)
        case _ => throw new PlanError("lag expects (offset, column)")
      }
      case "lead" => args match {
        case List(IntLit(off), v) => F.lead(lower(ctx, v), off.toInt)
        case List(v) => F.lead(lower(ctx, v), 1)
        case _ => throw new PlanError("lead expects (offset, column)")
      }
      case "first" => args match {
        case List(_, v) => F.first(lower(ctx, v))
        case List(v) => F.first(lower(ctx, v))
        case _ => throw new PlanError("first expects a column")
      }
      case "last" => args match {
        case List(_, v) => F.last(lower(ctx, v))
        case List(v) => F.last(lower(ctx, v))
        case _ => throw new PlanError("last expects a column")
      }
    }
    // rank/row_number/lag/lead take the default frame; first/last honor an
    // explicit `window` frame (they are frame-sensitive aggregates in Spark)
    val frameSensitive = name == "first" || name == "last"
    c.over(windowSpec(ctx, withFrame = frameSensitive))
  }

  /** OVER (PARTITION BY ambient-group ORDER BY ambient-sort [frame]).
    *
    * Frame resolution follows the reference exactly: every auto-wrapped
    * column function carries `(Rows, unbounded..unbounded)` unless an
    * enclosing `window` transform overrides it (wrap_into_windowed,
    * name_resolver.rs:343-373), and the frame is then ELIDED only when it
    * equals the SQL default — `ROWS unbounded` for an unsorted window,
    * `RANGE ..current row` for a sorted one (translator.rs:600-617). Spark's
    * implicit defaults are those same two, so eliding is sound; the
    * consequence that matters: with an ambient sort and NO explicit frame,
    * an aggregate like `sort x | derive [t = sum y]` is a full-partition
    * total (ROWS unbounded..unbounded survives elision), NOT a running sum.
    * `withFrame` is false for rank/row_number/lag/lead, whose frames Spark
    * rejects and SQL ignores. */
  private def windowSpec(ctx: Ctx, withFrame: Boolean): WindowSpec = {
    if (ctx.groupKeys.isEmpty && ctx.sort.nonEmpty)
      diagnostics += ("window over a global sort (no `group` before it) moves " +
        "every row to a single partition at execution time — fine on small " +
        "relations, a straggler/OOM risk at scale. Prefer wrapping the window " +
        "in `group ks (...)`, or pre-aggregate before ranking.")
    var w: WindowSpec = Window.partitionBy(ctx.groupKeys.map(k => lower(ctx, k)): _*)
    if (ctx.sort.nonEmpty) w = w.orderBy(ctx.sort.map(sortCol(ctx, _)): _*)
    if (withFrame) {
      val frame = ctx.frameSpec.getOrElse(FrameSpec("rows", None, None))
      val isSqlDefault =
        if (ctx.sort.isEmpty) frame == FrameSpec("rows", None, None)
        else frame == FrameSpec("range", None, Some(0L))
      if (!isSqlDefault) {
        val l = frame.lo.getOrElse(Window.unboundedPreceding)
        val h = frame.hi.getOrElse(Window.unboundedFollowing)
        w = if (frame.kind == "rows") w.rowsBetween(l, h) else w.rangeBetween(l, h)
      }
    }
    w
  }

  private def lowerBinary(ctx: Ctx, op: String, l: Expr, r: Expr): Column = {
    // `x == null` → IS NULL; `x != null` → IS NOT NULL (translator.rs:643-666)
    (op, l, r) match {
      case ("==", x, NullLit) => lower(ctx, x).isNull
      case ("==", NullLit, x) => lower(ctx, x).isNull
      case ("!=", x, NullLit) => lower(ctx, x).isNotNull
      case ("!=", NullLit, x) => lower(ctx, x).isNotNull
      case _ =>
        binaryCol(op, lower(ctx, l), lower(ctx, r), l, r)
    }
  }

  private def binaryCol(op: String, lc: Column, rc: Column, l: Expr, r: Expr): Column =
    op match {
      case "*" => lc * rc
      case "/" => lc / rc
      case "%" => lc % rc
      case "+" => lc + rc
      case "-" => lc - rc
      case "==" => lc === rc
      case "!=" => lc =!= rc
      case ">" => lc > rc
      case "<" => lc < rc
      case ">=" => lc >= rc
      case "<=" => lc <= rc
      case "and" => lc && rc
      case "or" => lc || rc
      case other => throw new PlanError(s"unknown binary op $other")
    }

  private def identCol(parts: List[String]): Column =
    F.col(parts.map(quoteName).mkString("."))

  /** Frame summary for unknown-column errors — first 12 columns. */
  private def frameHint(ctx: Ctx): String = {
    val cols = ctx.frame.cols
    if (cols.length <= 12) cols.mkString(", ")
    else cols.take(12).mkString(", ") + s", … ${cols.length - 12} more"
  }

  // ---- user function inlining (materializer.rs:206-301) ----

  // ---- s-strings: interpolate to Spark SQL text (translator.rs:547-559;
  //      our raw dialect is Spark SQL) ----

  private def sstringSql(parts: List[InterpPart]): String =
    parts.map {
      case IText(s) => s
      case IExpr(e) => exprSql(e)
    }.mkString

  private def exprSql(e: Expr): String = e match {
    case Ident(parts) => parts.map(quoteName).mkString(".")
    // float literals carry a D suffix, mirroring SqlGen.renderExpr: a
    // bare `7.5` parses as DECIMAL(2,1) whose arithmetic silently
    // diverges from the DOUBLE every other literal path produces. Int
    // literals stay bare — an L suffix would fail INT-slot function
    // inputs (element_at, substring) under ANSI coercion, and INT
    // widens to LONG value-identically.
    case IntLit(v) => v.toString
    case FloatLit(v) => s"${v}D"
    case StrLit(v) => "'" + v.replace("'", "''") + "'"
    case BoolLit(v) => v.toString
    case NullLit => "NULL"
    case Binary(op, l, r) =>
      val o = op match { case "==" => "="; case "!=" => "<>"; case x => x }
      s"(${exprSql(l)} $o ${exprSql(r)})"
    case Unary("-", x) => s"(- ${exprSql(x)})"
    case Unary("!", x) => s"(NOT ${exprSql(x)})"
    case DateLit(s) => s"DATE '$s'"
    case TimestampLit(s) => s"TIMESTAMP '${s.replace("T", " ")}'"
    case TimeLit(s) => "'" + s + "'" // no Spark TIME type; string like the reference
    case IntervalLit(n, unit) => s"INTERVAL $n $unit"
    case FStr(parts) =>
      parts.map {
        case IText(s) => "'" + s.replace("'", "''") + "'"
        case IExpr(x) => s"CAST(${exprSql(x)} AS STRING)"
      }.mkString("CONCAT(", ", ", ")")
    case p: Pipeline => exprSql(inlinePipe(p))
    case FuncCall(n, args, named) if funcs.contains(n) =>
      // user functions are compile-time macros (materializer.rs:206-234):
      // inline before rendering, they don't exist in Spark SQL
      exprSql(inlineFunc(funcs(n), args, named))
    case FuncCall(n, args, _) => s"$n(${args.map(exprSql).mkString(", ")})"
    case other => throw new PlanError(s"cannot render to SQL: $other")
  }

}

object Planner {
  /** Per-session one-row unit relation for table-less pipelines — cached so
    * each compile doesn't pay two analyzer runs (range + select) before the
    * `from` stage replaces it anyway. Stopped sessions are purged on access
    * (a weak-keyed map would never evict: the cached DataFrame strongly
    * references its own session), so the cache is bounded by live sessions. */
  private val unitDfs = scala.collection.mutable.Map.empty[SparkSession, DataFrame]
  private[plan] def unitDf(spark: SparkSession): DataFrame = unitDfs.synchronized {
    unitDfs.filterInPlace((s, _) => !s.sparkContext.isStopped)
    unitDfs.getOrElseUpdate(spark, spark.range(1).select())
  }

  private[plan] val TentativeKey =
    "spark.sql.analyzer.singlePassResolver.enabledTentatively"

  /** Pinned for the whole plan fold: a present stack trace makes every
    * Column builder skip java stack walking (see planPipelineCtx). Two
    * synthetic frames, not an empty array — DataFrameQueryContext.callSite
    * reads `stackTrace.tail.head` when rendering an error context. */
  private val foldOrigin = org.apache.spark.sql.catalyst.trees.Origin(
    stackTrace = Some(Array(
      new StackTraceElement("graft.plan.Planner", "fold", "Planner.scala", -1),
      new StackTraceElement("graft.plan.Planner", "fold", "Planner.scala", -1))))

  // ---- shared AST-shape helpers (used by the DataFrame planner and the
  //      SQL-text backend, graft.plan.SqlGen — one implementation of the
  //      language's item/sort/frame/function-inlining rules) ----

  private[plan] final case class SortItem(e: Expr, desc: Boolean)
  /** kind ∈ rows|range; None bound = UNBOUNDED (translator.rs:667-693). */
  private[plan] final case class FrameSpec(kind: String, lo: Option[Long], hi: Option[Long])

  /** Backtick-quote an identifier segment for Spark unless it's plain
    * (shared by column refs, join conditions, and s-string rendering). */
  private[plan] def quoteName(s: String): String =
    if (s == "*" || s.matches("[A-Za-z_$][A-Za-z0-9_$]*")) s
    else "`" + s.replace("`", "``") + "`"

  private[plan] def keyList(e: Expr): List[Expr] = e match {
    case EList(items) => items.map {
      case i: Ident => i
      case other => throw new PlanError(
        s"group keys must be idents (transforms.rs:148-159), got $other")
    }
    case i: Ident => List(i)
    case other => throw new PlanError(s"group keys must be idents, got $other")
  }

  private[plan] def bodyStages(e: Expr): List[Expr] = e match {
    case Pipeline(stages) => stages
    case single => List(single)
  }

  /** window named args → frame, with the reference's priority order when
    * several are combined: expanding > rolling(>0) > rows > range > default
    * `(Rows, unbounded..unbounded)` (transforms.rs:225-240). `rolling:0` and
    * `expanding:false` are the parameters' declared defaults, not errors —
    * they fall through to the next argument in priority. A bare `window`
    * with no frame argument still sets the Rows-unbounded frame (the same
    * default wrap_into_windowed applies, name_resolver.rs:343-373). */
  private[plan] def frameSpecOf(named: List[(String, Expr)], warn: String => Unit): FrameSpec = {
    val m = named.toMap
    val known = Set("rows", "range", "expanding", "rolling")
    m.keys.find(!known(_)).foreach { k =>
      throw new PlanError(
        s"unknown window argument '$k' (expected ${known.mkString("/")}; transforms.rs:165-244)")
    }
    val expanding = m.get("expanding") match {
      case Some(BoolLit(b)) => b
      case Some(other) => throw new PlanError(s"parameter `expanding` expects a boolean, got $other")
      case None => false
    }
    val rolling = m.get("rolling") match {
      case Some(IntLit(n)) =>
        // the reference accepts any integer and only rolling>0 selects the
        // trailing frame (transforms.rs:227) — match that, but flag the
        // almost-certainly-unintended negative, which silently becomes the
        // default full frame
        if (n < 0) warn(s"window rolling:$n is not positive — it " +
          "selects no frame (full-partition default), which is rarely intended")
        n
      case Some(other) => throw new PlanError(s"parameter `rolling` expects a number, got $other")
      case None => 0L
    }
    def rangeOf(e: Expr): (Option[Long], Option[Long]) = e match {
      case RangeLit(s, en) => (s.map(asLong), en.map(asLong))
      case IntLit(n) => (Some(n), Some(n))
      case other => throw new PlanError(s"bad window frame range: $other")
    }
    if (expanding) FrameSpec("rows", None, Some(0))
    else if (rolling > 0) FrameSpec("rows", Some(-(rolling - 1)), Some(0))
    else if (m.contains("rows")) {
      val (lo, hi) = rangeOf(m("rows")); FrameSpec("rows", lo, hi)
    } else if (m.contains("range")) {
      val (lo, hi) = rangeOf(m("range")); FrameSpec("range", lo, hi)
    } else FrameSpec("rows", None, None)
  }

  /** Items of select/derive: one list, or varargs of assigns/exprs. */
  private[plan] def assignItems(args: List[Expr]): List[(Option[String], Expr)] = {
    val flat = args.flatMap {
      case EList(items) => items
      case e => List(e)
    }
    flat.map {
      case Assign(n, e) => (Some(n), e)
      case e => (None, e)
    }
  }

  private[plan] def aggItems(args: List[Expr]): List[(Option[String], Expr)] = args match {
    case List(EList(items)) => items.map {
      case Assign(n, e) => (Some(n), e)
      case e => (None, e)
    }
    case List(Assign(n, e)) => List((Some(n), e))
    case List(e) => List((None, e))
    case _ =>
      // `aggregate average x` is an arity error in the reference (transforms.rs:342-362)
      throw new PlanError("aggregate expects a single list argument")
  }

  private[plan] def sortItems(args: List[Expr]): List[SortItem] = {
    val flat = args.flatMap { case EList(items) => items; case e => List(e) }
    flat.map {
      case Unary("-", e) => SortItem(requireSortIdent(e), desc = true)
      case e => SortItem(requireSortIdent(e), desc = false)
    }
  }

  /** The reference rejects sort-by-expression — idents only, with an optional
    * +/- direction prefix (transforms.rs:61-83). */
  private[plan] def requireSortIdent(e: Expr): Expr = e match {
    case i: Ident => i
    case other => throw new PlanError(
      s"sort expects column identifiers, not expressions (transforms.rs:61-83): $other")
  }

  private[plan] def asLong(e: Expr): Long = e match {
    case IntLit(n) => n
    case other => throw new PlanError(s"expected integer, got $other")
  }

  /** `(x | f a | g)` — pipe appends upstream as last positional arg
    * (materializer.rs:276-301). */
  private[plan] def inlinePipe(p: Pipeline): Expr =
    p.stages.reduceLeft { (acc, s) =>
      s match {
        case FuncCall(n, args, named) => FuncCall(n, args :+ acc, named)
        case Ident(List(n)) => FuncCall(n, List(acc), Nil)
        case other => throw new PlanError(s"cannot pipe into $other")
      }
    }

  private[plan] def inlineFunc(fd: FuncDef, args: List[Expr],
                         named: List[(String, Expr)]): Expr = {
    val binding = scala.collection.mutable.Map.empty[String, Expr]
    named.foreach { case (n, e) =>
      if (!fd.params.exists(_.name == n))
        throw new PlanError(s"${fd.name}: unknown named arg $n")
      binding(n) = e
    }
    // positional args fill required params (no default) in order, then spill
    // into defaulted params (name_resolver.rs:425-495)
    val required = fd.params.filter(p => p.default.isEmpty && !binding.contains(p.name))
    val defaulted = fd.params.filter(p => p.default.nonEmpty && !binding.contains(p.name))
    val slots = required ++ defaulted
    if (args.length > slots.length)
      throw new PlanError(s"${fd.name}: too many arguments (${args.length})")
    args.zip(slots).foreach { case (a, p) => binding(p.name) = a }
    fd.params.foreach { p =>
      if (!binding.contains(p.name))
        p.default match {
          case Some(d) => binding(p.name) = d
          case None => throw new PlanError(s"${fd.name}: missing argument ${p.name}")
        }
    }
    substitute(fd.body, binding.toMap)
  }

  private[plan] def substitute(e: Expr, b: Map[String, Expr]): Expr = e match {
    case Ident(List(n)) if b.contains(n) => b(n)
    case Binary(op, l, r) => Binary(op, substitute(l, b), substitute(r, b))
    case Unary(op, x) => Unary(op, substitute(x, b))
    case FuncCall(n, args, named) =>
      FuncCall(n, args.map(substitute(_, b)), named.map { case (k, v) => (k, substitute(v, b)) })
    case Assign(n, x) => Assign(n, substitute(x, b))
    case EList(items) => EList(items.map(substitute(_, b)))
    case SStr(parts) => SStr(parts.map {
      case IExpr(x) => IExpr(substitute(x, b)); case t => t })
    case FStr(parts) => FStr(parts.map {
      case IExpr(x) => IExpr(substitute(x, b)); case t => t })
    case Pipeline(stages) => Pipeline(stages.map(substitute(_, b)))
    case RangeLit(s, en) => RangeLit(s.map(substitute(_, b)), en.map(substitute(_, b)))
    case other => other
  }

  private[plan] def isTypeName(t: String): Boolean = {
    val base = Set("int", "integer", "long", "bigint", "float", "double",
      "real", "bool", "boolean", "string", "text", "varchar", "date",
      "timestamp", "datetime")
    base(t.toLowerCase) || t.toLowerCase.matches("decimal\\s*\\(.*\\)")
  }

  private[plan] def sparkType(t: String): String = t.toLowerCase match {
    case "int" | "integer" => "int"
    case "long" | "bigint" => "bigint"
    case "float" => "float"
    case "double" => "double"
    case "bool" | "boolean" => "boolean"
    case "string" | "text" | "varchar" => "string"
    case "date" => "date"
    case "timestamp" | "datetime" => "timestamp"
    case other => other // pass through (decimal(10,2) etc. won't reach here)
  }

  /** Deterministic display name for unnamed computed columns. */
  private[plan] def prettyName(e: Expr): String = e match {
    case Ident(parts) => parts.last
    case FuncCall(n, args, _) => (n :: args.map(prettyName)).mkString("_")
    case Binary(op, l, r) => s"${prettyName(l)}_${prettyName(r)}"
    case Pipeline(stages) => prettyName(inlinePipe(Pipeline(stages)))
    case Assign(n, _) => n
    case IntLit(v) => v.toString
    case FloatLit(v) => v.toString
    case StrLit(v) => v
    case _ => "expr"
  }
}
