package graft.ast

/** AST for the PRQL language (reference: prql-compiler/src/ast/item.rs,
  * src/ast/query.rs, grammar src/prql.pest @ v0.2.2). This mirrors the
  * language surface only; the planner lowers it straight to Spark
  * `DataFrame`/`Column` operations (no SQL-string stage).
  */
sealed trait Expr extends Product with Serializable

object Expr {

  /** Dotted identifier; backticked segments arrive with backticks stripped.
    * A trailing "*" segment is the `table.*` wildcard
    * (prql.pest:35-43 `ident`). */
  final case class Ident(parts: List[String]) extends Expr {
    def name: String = parts.last
    def text: String = parts.mkString(".")
  }
  object Ident { def apply(s: String): Ident = Ident(s.split('.').toList) }

  // ---- literals (src/ast/literal.rs:9-18) ----
  sealed trait Lit extends Expr
  case object NullLit extends Lit
  final case class IntLit(v: Long) extends Lit
  final case class FloatLit(v: Double) extends Lit
  final case class BoolLit(v: Boolean) extends Lit
  final case class StrLit(v: String) extends Lit
  /** `@2022-12-31` — ISO date, kept as string like the reference. */
  final case class DateLit(s: String) extends Lit
  /** `@08:30` — time of day. */
  final case class TimeLit(s: String) extends Lit
  /** `@2022-12-31T08:30:00` */
  final case class TimestampLit(s: String) extends Lit
  /** `10days` (src/ast/item.rs:172-176). unit is singular-less PRQL unit:
    * microseconds|milliseconds|seconds|minutes|hours|days|weeks|months|years */
  final case class IntervalLit(n: Long, unit: String) extends Lit

  /** `a..b`, either edge optional (src/ast/item.rs:132-138). 1-based and
    * inclusive-inclusive when used by `take`. */
  final case class RangeLit(start: Option[Expr], end: Option[Expr]) extends Expr

  /** op ∈ * / % + - == != > < >= <= and or ?? (src/ast/item.rs:41-71) */
  final case class Binary(op: String, l: Expr, r: Expr) extends Expr

  /** op ∈ - ! + (src/ast/item.rs:73-79; + is identity) */
  final case class Unary(op: String, e: Expr) extends Expr

  /** `f a b named:x` — every transform and stdlib/user function call. */
  final case class FuncCall(name: String, args: List[Expr],
                            named: List[(String, Expr)]) extends Expr

  /** `alias = expr` inside select/derive/aggregate lists or from/join. */
  final case class Assign(name: String, e: Expr) extends Expr

  /** `[a, b, c]` */
  final case class EList(items: List[Expr]) extends Expr

  // ---- interpolated strings (prql.pest:139-141) ----
  sealed trait InterpPart extends Product with Serializable
  final case class IText(s: String) extends InterpPart
  final case class IExpr(e: Expr) extends InterpPart
  /** s"RAW SQL({col})" — raw escape hatch; our raw dialect is Spark SQL. */
  final case class SStr(parts: List[InterpPart]) extends Expr
  /** f"{a} {b}" → concat. */
  final case class FStr(parts: List[InterpPart]) extends Expr

  /** `{{ ref('x') }}` — jinja block passed through by the parser
    * (prql.pest:163, translator.rs:43-46); the Spark planner rejects it at
    * plan time (we execute, the reference only renders SQL text). */
  final case class JinjaLit(src: String) extends Expr

  /** `(from x | filter y)` or `(expr | f 1)` — nested pipeline; pipe appends
    * the upstream value as the last positional argument
    * (materializer.rs:276-301). */
  final case class Pipeline(stages: List[Expr]) extends Expr
}

/** Half-open [start, end) byte-offset range into the query source. The
  * reference threads a `Span` through every AST node for located errors
  * (prql-compiler/src/error.rs:1-270); here spans live in a side table keyed
  * by node identity (graft.parse.SpanMap) so the AST stays purely
  * structural (JSON round-trip, printer, fuzzers are span-agnostic). */
final case class Span(start: Int, end: Int)

/** `func name param… named:default… -> body` (src/ast/query.rs:14-22). */
final case class FuncDef(name: String, params: List[FuncDef.Param], body: Expr)
object FuncDef {
  final case class Param(name: String, default: Option[Expr])
}

/** `table name = (pipeline)` — named pipeline ≅ CTE (src/ast/query.rs:24-29). */
final case class TableDef(name: String, pipeline: Expr.Pipeline)

/** A whole query: defs + main pipeline (src/ast/query.rs:6-12). The
  * `prql dialect:… version:…` header is parsed and ignored (single target). */
final case class Query(funcs: List[FuncDef], tables: List[TableDef],
                       main: Option[Expr.Pipeline])
