package graft

import graft.parse.{LexError, ParseError}
import graft.plan.PlanError
import org.scalatest.funsuite.AnyFunSuite

/** Located, annotated errors (the reference's error.rs affordance): every
  * major error class must carry a source position rendered as
  * `--> line L, col C` plus an underlined snippet of the offending line. */
class ErrorSpanSpec extends AnyFunSuite {

  import TestSpark.compile

  private def msgOf(t: Throwable): String = t.getMessage

  test("lex error is located (line/col + caret)") {
    val e = intercept[LexError](Graft.parse("from orders\nfilter a ? 3"))
    val m = msgOf(e)
    assert(m.contains("unexpected '?'"))
    assert(m.contains("--> line 2, col 10"))
    assert(m.contains("filter a ? 3"))
    assert(m.contains("^"))
  }

  test("parse error is located") {
    val e = intercept[ParseError](Graft.parse("from orders\nselect [a,"))
    val m = msgOf(e)
    assert(m.contains("--> line 2"))
    assert(m.contains("^"))
  }

  test("unknown column error is located at the ident and lists the frame") {
    val e = intercept[PlanError](compile("from employees\nfilter nope > 1").collect())
    val m = msgOf(e)
    assert(m.contains("unknown column 'nope'"))
    assert(m.contains("frame:"))
    assert(m.contains("--> line 2, col 8"))
    assert(m.contains("filter nope > 1"))
    assert(m.contains("^^^^"))
  }

  test("unknown function error is located at the call") {
    // call-rhs needs parens (prql.pest: assign rhs is a bare expr)
    val e = intercept[PlanError](
      compile("from employees\nderive x = (frobnicate salary)").collect())
    val m = msgOf(e)
    assert(m.contains("unknown function 'frobnicate'"))
    assert(m.contains("--> line 2, col 13"))
  }

  test("nesting violation is located at the offending inner stage") {
    val e = intercept[PlanError](
      compile("from employees\nwindow (filter salary > 0)").collect())
    val m = msgOf(e)
    assert(m.contains("not allowed inside window"))
    assert(m.contains("--> line 2, col 9"))
  }

  test("bad window argument is located at the window stage") {
    val e = intercept[PlanError](
      compile("from employees\nwindow row:-2..0 (derive [s = sum salary])").collect())
    val m = msgOf(e)
    assert(m.contains("unknown window argument"))
    assert(m.contains("--> line 2, col 1"))
  }

  test("sort-by-expression rejection is located at the sort stage") {
    val e = intercept[PlanError](
      compile("from employees\nsort [salary * -1]").collect())
    val m = msgOf(e)
    assert(m.contains("sort expects column identifiers"))
    assert(m.contains("--> line 2"))
  }

  test("errors inside inlined user functions locate at the body ident") {
    val e = intercept[PlanError](
      compile("func f x -> x * nope_col\nfrom employees\nderive y = (f salary)").collect())
    val m = msgOf(e)
    assert(m.contains("unknown column 'nope_col'"))
    // body nodes keep their own parse spans through inlining (substitution
    // reuses the original nodes), so the error points INTO the func body
    assert(m.contains("--> line 1, col 17"))
    assert(m.contains("func f x -> x * nope_col"))
  }

  test("ErrorRender.lineCol is 1-based and newline-aware") {
    val src = "ab\ncd\n"
    assert(ErrorRender.lineCol(src, 0) == (1, 1))
    assert(ErrorRender.lineCol(src, 1) == (1, 2))
    assert(ErrorRender.lineCol(src, 3) == (2, 1))
    assert(ErrorRender.lineCol(src, 6) == (3, 1))
  }
}
