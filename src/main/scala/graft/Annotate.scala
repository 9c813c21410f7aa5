package graft

import graft.ast._
import graft.ast.Expr._
import graft.plan.Planner
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source annotation — the reference CLI's `prql-frames` / `prql-refs`
  * modes (prql-compiler/src/cli.rs:20-36, semantic/reporting.rs:11-60),
  * re-expressed over real schemas: where the reference prints inferred
  * frames with `?` wildcards (it never sees source schemas), these
  * annotations show the ACTUAL resolved frame after each pipeline stage,
  * because the planner folds stages over concrete DataFrames.
  */
object Annotate {

  /** Append `# [col, col, …]` to each source line on which a pipeline stage
    * starts — the frame layout AFTER that line's (last) stage. */
  def frames(prql: String, spark: SparkSession,
             catalog: String => DataFrame): String = {
    val planner = run(prql, spark, catalog)
    val spans = planner.spansForAnnotate
    val byLine = scala.collection.mutable.LinkedHashMap.empty[Int, Seq[String]]
    planner.stageFrames.foreach { case (stage, cols) =>
      spans.get(stage).foreach { sp =>
        val line = ErrorRender.lineCol(prql, sp.start)._1
        byLine(line) = cols // several stages on a line: the last one wins
      }
    }
    val lines = prql.linesIterator.toVector
    val width = if (lines.isEmpty) 0 else lines.map(_.length).max + 2
    lines.zipWithIndex.map { case (ln, i) =>
      byLine.get(i + 1) match {
        case Some(cols) => ln.padTo(width, ' ') + s"# [${cols.mkString(", ")}]"
        case None => ln
      }
    }.mkString("\n")
  }

  /** One line per identifier reference in the main/table pipelines:
    * `line L, col C: name -> table | column | user function | builtin`.
    * (The reference labels every ident with its resolved declaration via
    * ariadne; this is the same information as a plain listing.) */
  def refs(prql: String, spark: SparkSession,
           catalog: String => DataFrame): String = {
    val planner = run(prql, spark, catalog)
    val spans = planner.spansForAnnotate
    val userFuncs = planner.userFuncNames
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
    def emit(id: Ident, kind: String): Unit =
      spans.get(id).foreach { sp =>
        val (l, c) = ErrorRender.lineCol(prql, sp.start)
        out += ((l, c, s"${id.text} -> $kind"))
      }
    def classify(id: Ident): String = {
      val n = id.parts.last
      if (id.parts.lengthCompare(1) > 0) "column"
      else if (userFuncs(n)) "user function"
      else if (Builtins(n)) "builtin function"
      else "column"
    }
    def walk(e: Expr): Unit = e match {
      case id: Ident => emit(id, classify(id))
      case fc @ FuncCall(name, args, named) =>
        // non-transform call names are references too (the parser stores
        // them as strings; the call's span starts at the name) — but only
        // when the name literally appears at the recorded position:
        // parser-synthesized calls (`a ?? b` desugars to coalesce) carry
        // the operator expression's span, where no such identifier exists
        if (!Transforms(name))
          spans.get(fc).filter(sp => prql.regionMatches(sp.start, name, 0, name.length))
            .foreach { sp =>
            val (l, c) = ErrorRender.lineCol(prql, sp.start)
            val kind =
              if (userFuncs(name)) "user function"
              else if (Builtins(name)) "builtin function"
              else "function"
            out += ((l, c, s"$name -> $kind"))
          }
        (name, args) match {
          case (("from" | "join"), _) =>
            // first ident/assign arg names a table, the rest are conditions;
            // named args (join's `side:left`) are keywords, not references
            var tableSeen = false
            args.foreach {
              case id: Ident if !tableSeen => tableSeen = true; emit(id, "table")
              case Assign(_, id: Ident) if !tableSeen => tableSeen = true; emit(id, "table")
              case a => walk(a)
            }
          case _ =>
            args.foreach(walk); named.foreach { case (_, v) => walk(v) }
        }
      case Binary(_, l, r) => walk(l); walk(r)
      case Unary(_, x) => walk(x)
      case Assign(_, x) => walk(x)
      case EList(items) => items.foreach(walk)
      case Pipeline(stages) => stages.foreach(walk)
      case RangeLit(a, b) => a.foreach(walk); b.foreach(walk)
      case FStr(parts) => parts.foreach { case IExpr(x) => walk(x); case _ => () }
      case SStr(parts) => parts.foreach { case IExpr(x) => walk(x); case _ => () }
      case _ => ()
    }
    // walk only TOP-LEVEL stages (group/window bodies are stages in
    // stageFrames too — walking those would double-count their idents)
    val topStages = planner.topLevelStages
    topStages.foreach(walk)
    out.distinct.sortBy(r => (r._1, r._2))
      .map { case (l, c, s) => s"line $l, col $c: $s" }.mkString("\n")
  }

  private val Builtins = Set("min", "max", "sum", "avg", "average", "stddev",
    "count", "count_distinct", "round", "coalesce", "in", "as", "lag", "lead",
    "first", "last", "rank", "rank_dense", "row_number")

  private val Transforms = Set("from", "select", "derive", "filter",
    "aggregate", "sort", "take", "join", "group", "window")

  /** Parse + plan through the same located-error path as Graft.compile, so
    * frames/refs render annotated errors too. */
  private def run(prql: String, spark: SparkSession,
                  catalog: String => DataFrame): Planner =
    Graft.plannedFor(prql, spark, catalog)._1
}
