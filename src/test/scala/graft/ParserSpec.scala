package graft

import graft.ast.Expr._
import graft.parse.{Lexer, ParseError}
import org.scalatest.funsuite.AnyFunSuite

/** Grammar-level units mirroring prql.pest semantics. */
class ParserSpec extends AnyFunSuite {

  private def exprOf(src: String) = {
    val q = Graft.parse(s"from t\nderive zz = $src")
    val Some(p) = q.main
    p.stages(1) match {
      case FuncCall("derive", List(Assign("zz", e)), _) => e
      case other => fail(s"unexpected parse: $other")
    }
  }

  test("same-precedence chains associate left (observable reference semantics)") {
    assert(exprOf("a - b + c") == Binary("+", Binary("-", Ident("a"), Ident("b")), Ident("c")))
    assert(exprOf("a / b * c") == Binary("*", Binary("/", Ident("a"), Ident("b")), Ident("c")))
    assert(exprOf("a % b % c") == Binary("%", Binary("%", Ident("a"), Ident("b")), Ident("c")))
  }

  test("precedence: mul binds tighter than add, add tighter than compare") {
    assert(exprOf("a + b * c") == Binary("+", Ident("a"), Binary("*", Ident("b"), Ident("c"))))
    assert(exprOf("a + b > c") == Binary(">", Binary("+", Ident("a"), Ident("b")), Ident("c")))
  }

  test("logical operators bind loosest; and binds tighter than or") {
    assert(exprOf("a > b and c > d") ==
      Binary("and", Binary(">", Ident("a"), Ident("b")), Binary(">", Ident("c"), Ident("d"))))
    assert(exprOf("a and b or c") ==
      Binary("or", Binary("and", Ident("a"), Ident("b")), Ident("c")))
    // the reference emits flat SQL which the target DB parses with AND > OR
    assert(exprOf("a or b and c") ==
      Binary("or", Ident("a"), Binary("and", Ident("b"), Ident("c"))))
    assert(exprOf("a or b and c or d") ==
      Binary("or", Binary("or", Ident("a"), Binary("and", Ident("b"), Ident("c"))), Ident("d")))
  }

  test("?? parses to coalesce calls and chains") {
    assert(exprOf("a ?? b ?? c") ==
      FuncCall("coalesce", List(FuncCall("coalesce", List(Ident("a"), Ident("b")), Nil), Ident("c")), Nil))
  }

  test("unary: -x, !x, +x identity; negative literals fold") {
    assert(exprOf("-5") == IntLit(-5))
    assert(exprOf("-x") == Unary("-", Ident("x")))
    assert(exprOf("!x") == Unary("!", Ident("x")))
    assert(exprOf("+x") == Ident("x"))
  }

  test("ranges: closed, open-start, open-end; dates") {
    assert(exprOf("(x | in 1..10)") ==
      Pipeline(List(Ident("x"), FuncCall("in", List(RangeLit(Some(IntLit(1)), Some(IntLit(10)))), Nil))))
    val q = Graft.parse("from t\ntake 10..")
    assert(q.main.get.stages(1) == FuncCall("take", List(RangeLit(Some(IntLit(10)), None)), Nil))
    assert(exprOf("(d | in @2020-01-01..@2020-12-31)") ==
      Pipeline(List(Ident("d"),
        FuncCall("in", List(RangeLit(Some(DateLit("2020-01-01")), Some(DateLit("2020-12-31")))), Nil))))
  }

  test("date/time/timestamp/interval literals") {
    assert(exprOf("@2022-12-31") == DateLit("2022-12-31"))
    assert(exprOf("@08:30") == TimeLit("08:30"))
    assert(exprOf("@2020-01-01T13:19:55") == TimestampLit("2020-01-01T13:19:55"))
    assert(exprOf("30days") == IntervalLit(30, "days"))
    assert(exprOf("1year") == IntervalLit(1, "years"))
  }

  test("f-strings and s-strings with interpolations") {
    assert(exprOf("f\"{a}_{b}\"") ==
      FStr(List(IExpr(Ident("a")), IText("_"), IExpr(Ident("b")))))
    assert(exprOf("s\"version({x})\"") ==
      SStr(List(IText("version("), IExpr(Ident("x")), IText(")"))))
  }

  test("triple-quoted strings") {
    assert(exprOf("\"\"\"multi 'line'\"\"\"") == StrLit("multi 'line'"))
  }

  test("backtick idents keep punctuation; dotted paths split") {
    assert(exprOf("`weird col`") == Ident(List("weird col")))
    assert(exprOf("tbl.col") == Ident(List("tbl", "col")))
    assert(exprOf("`a.b.c`") == Ident(List("a.b.c")))
  }

  test("jinja blocks lex and parse as pass-through tokens") {
    val q = Graft.parse("from {{ ref('orders') }}\ntake 10")
    assert(q.main.get.stages.head ==
      FuncCall("from", List(JinjaLit("{{ ref('orders') }}")), Nil))
  }

  test("full-line comments do not split a pipeline") {
    val q = Graft.parse("from t\nfilter x > 1\n# a comment\n# another\ntake 5")
    assert(q.main.get.stages.length == 3)
  }

  test("trailing comment on a stage line keeps the newline separator") {
    val q = Graft.parse("from t  # src\n# note\naggregate [average x]")
    assert(q.main.get.stages.length == 2)
  }

  test("func defs: params, named defaults, type annotations skipped") {
    val q = Graft.parse("func f <scalar> a b:2 -> a + b\n\nfrom t\nderive y = (f x)")
    assert(q.funcs.head.name == "f")
    assert(q.funcs.head.params.map(_.name) == List("a", "b"))
    assert(q.funcs.head.params(1).default.contains(IntLit(2)))
  }

  test("syntax errors carry position and message") {
    val e = intercept[ParseError](Graft.parse("from t\nfilter x >"))
    assert(e.getMessage.nonEmpty)
    intercept[Exception](Lexer.lex("from t\nderive x = 'unterminated"))
  }
}
