package graft.ast

import graft.ast.Expr._

/** PRQL pretty-printer — the reference CLI's `--format fmt` edge
  * (src/cli.rs:20-36). Guarantee: `parse(print(q)) == q` for every AST the
  * parser produces (property-tested over the whole golden corpus).
  *
  * Printing is conservative: compound sub-expressions are parenthesized
  * (`sum (a + b)`), which re-parses to the identical AST because a
  * single-stage nested pipeline unwraps to its expression.
  */
object PrqlPrinter {

  def print(q: Query): String = {
    val sb = new StringBuilder
    q.funcs.foreach { f => sb ++= printFunc(f); sb += '\n' }
    if (q.funcs.nonEmpty) sb += '\n'
    q.tables.foreach { t =>
      sb ++= s"table ${t.name} = (\n"
      t.pipeline.stages.foreach { s => sb ++= "  " + stage(s) + "\n" }
      sb ++= ")\n\n"
    }
    q.main.foreach { p =>
      p.stages.foreach { s => sb ++= stage(s) + "\n" }
    }
    sb.toString
  }

  private def printFunc(f: FuncDef): String = {
    val params = f.params.map {
      case FuncDef.Param(n, Some(d)) => s" $n:${atom(d)}"
      case FuncDef.Param(n, None) => s" $n"
    }.mkString
    // body is `expr`, not `expr_call` (prql.pest:18) — a bare call like
    // `-> myfn 1` does not parse; parenthesize compound bodies
    s"func ${f.name}$params -> ${atom(f.body)}"
  }

  /** A pipeline stage: a transform call printed bare. */
  private def stage(e: Expr): String = e match {
    case FuncCall(name, args, named) => call(name, args, named)
    case Ident(parts) => ident(parts)
    case other => expr(other)
  }

  private def call(name: String, args: List[Expr], named: List[(String, Expr)]): String = {
    val a = args.map {
      case Assign(n, v) => s"$n = ${atom(v)}" // bare assign arg (from x = t)
      case x =>
        val r = atom(x)
        // a call argument may not START with an operator (prql.pest:75
        // `!operator`): parenthesize leading -/+ so `take (-5)` re-parses
        if (r.startsWith("-") || r.startsWith("+")) s"($r)" else r
    }
    val n = named.map { case (k, v) => s"$k:${atom(v)}" }
    (name :: (a ++ n)).mkString(" ")
  }

  /** Expression in operand position: parenthesize anything compound. */
  private def atom(e: Expr): String = e match {
    case _: Binary | _: FuncCall | _: Assign =>
      s"(${expr(e)})"
    case Pipeline(_) => expr(e) // already parenthesized
    case Unary(op, x) => unary(op, x)
    case RangeLit(None, _) =>
      // an open-start range after another token would swallow it as the
      // range start (`f x ..67` parses as x..67) — parenthesize
      s"(${expr(e)})"
    case other => expr(other)
  }

  private def expr(e: Expr): String = e match {
    case Ident(parts) => ident(parts)
    case NullLit => "null"
    case IntLit(v) => v.toString
    case FloatLit(v) => floatRepr(v)
    case BoolLit(v) => v.toString
    case StrLit(v) => strLit(v)
    case DateLit(s) => s"@$s"
    case TimeLit(s) => s"@$s"
    case TimestampLit(s) => s"@$s"
    case IntervalLit(n, unit) => s"$n$unit"
    case JinjaLit(src) => src
    case RangeLit(a, b) => s"${a.map(expr).getOrElse("")}..${b.map(expr).getOrElse("")}"
    case Binary(op, l, r) => s"${atom(l)} $op ${atom(r)}"
    case Unary(op, x) => unary(op, x)
    case FuncCall("coalesce", List(a, b), Nil) => s"${atom(a)} ?? ${atom(b)}"
    case FuncCall(n, args, named) => call(n, args, named)
    case Assign(n, x) => s"$n = ${atom(x)}"
    case EList(items) => items.map {
      case Assign(n, x) => s"$n = ${listAtom(x)}"
      case Unary(op, x) => s"$op${atom(x)}"
      case x => listAtom(x)
    }.mkString("[", ", ", "]")
    case SStr(parts) => interp("s", parts)
    case FStr(parts) => interp("f", parts)
    case Pipeline(stages) => stages.map(stage).mkString("(", " | ", ")")
  }

  /** List items may be full calls without parens (list grammar). */
  private def listAtom(e: Expr): String = e match {
    case FuncCall(n, args, named) => call(n, args, named)
    case other => atom(other)
  }

  /** Unary operand: anything beyond a plain ident is parenthesized —
    * e.g. `!45..94` would re-parse as a range of `!45`. */
  private def unary(op: String, x: Expr): String = x match {
    case _: Ident => s"$op${expr(x)}"
    case _ => s"$op(${expr(x)})"
  }

  private def ident(parts: List[String]): String =
    parts.map { s =>
      if (s == "*" || s.matches("[A-Za-z_$][A-Za-z0-9_$]*")) s
      else s"`$s`"
    }.mkString(".")

  private def strLit(v: String): String =
    if (!v.contains("\"")) "\"" + v + "\""
    else if (!v.contains("'")) "'" + v + "'"
    else "\"\"\"" + v + "\"\"\"" // both quote kinds present

  private def interp(kind: String, parts: List[InterpPart]): String = {
    val body = parts.map {
      case IText(s) => s
      case IExpr(e) => s"{${expr(e)}}"
    }.mkString
    if (!body.contains("\"")) s"$kind\"$body\""
    else s"$kind\"\"\"$body\"\"\""
  }

  private def floatRepr(v: Double): String = {
    val s = v.toString
    // the grammar has no exponent form; corpus values are plain decimals
    if (s.contains("E") || s.contains("e"))
      new java.math.BigDecimal(v).toPlainString
    else s
  }
}
