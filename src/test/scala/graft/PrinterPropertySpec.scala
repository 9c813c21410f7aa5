package graft

import graft.ast._
import graft.ast.Expr._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test: parse(print(q)) == q over RANDOM parser-producible ASTs,
  * not just the golden corpus. The generator stays inside the shapes the
  * parser can emit (no zero-arg FuncCalls, single-stage nested pipelines
  * unwrap, strings without quote chars, etc.). Driven with fixed seeds so
  * failures reproduce (no scalatestplus bridge in the offline deps). */
class PrinterPropertySpec extends AnyFunSuite {

  private val identGen: Gen[Ident] = for {
    n <- Gen.choose(1, 2)
    parts <- Gen.listOfN(n, Gen.oneOf(
      Gen.identifier.map(_.take(6)).suchThat(_.nonEmpty),
      Gen.oneOf("weird col", "a.b", "x-y").map(identity))) // backtickable
  } yield Ident(parts.map(p => if (p.isEmpty) "x" else p))

  private val litGen: Gen[Expr] = Gen.oneOf(
    Gen.choose(-999L, 999L).map(IntLit),
    for { a <- Gen.choose(0, 99); b <- Gen.choose(0, 99) }
      yield FloatLit(s"$a.$b".toDouble),
    Gen.oneOf(true, false).map(BoolLit),
    Gen.const(NullLit),
    Gen.alphaNumStr.map(s => StrLit(s.take(8))),
    Gen.const(DateLit("2022-12-31")),
    Gen.const(TimestampLit("2020-01-01T13:19:55")),
    for { n <- Gen.choose(1L, 60L); u <- Gen.oneOf("days", "hours", "years") }
      yield IntervalLit(n, u),
  )

  private val binOps = Seq("*", "/", "%", "+", "-", "==", "!=", ">", "<", ">=", "<=", "and", "or")

  private def exprGen(depth: Int): Gen[Expr] =
    if (depth <= 0) Gen.oneOf(litGen, identGen)
    else Gen.frequency(
      3 -> litGen,
      3 -> identGen,
      2 -> (for {
        op <- Gen.oneOf(binOps)
        l <- exprGen(depth - 1); r <- exprGen(depth - 1)
      } yield Binary(op, l, r)),
      // the parser folds -<numeric literal> into the literal itself, so
      // unary minus only ever wraps non-literals in parser output
      1 -> identGen.map(Unary("-", _)),
      1 -> exprGen(depth - 1).map(Unary("!", _)),
      2 -> (for {
        name <- Gen.oneOf("sum", "avg", "round", "myfn")
        n <- Gen.choose(1, 2)
        args <- Gen.listOfN(n, exprGen(depth - 1))
        named <- Gen.oneOf(
          Gen.const(Nil),
          Gen.zip(Gen.identifier.map(_.take(4)).suchThat(_.nonEmpty), exprGen(depth - 1))
            .map(List(_)))
      } yield FuncCall(name, args, named)),
      1 -> (for {
        n <- Gen.choose(1, 3)
        items <- Gen.listOfN(n, Gen.oneOf(
          exprGen(depth - 1),
          Gen.zip(Gen.identifier.map(_.take(5)).suchThat(_.nonEmpty), exprGen(depth - 1))
            .map { case (k, v) => Assign(k, v) }))
      } yield EList(items)),
      1 -> (for {
        a <- Gen.option(Gen.choose(1L, 50L).map(IntLit))
        b <- Gen.option(Gen.choose(51L, 99L).map(IntLit))
      } yield RangeLit(a, b)),
      1 -> (for {
        pre <- Gen.alphaNumStr.map(_.take(5))
        e <- exprGen(depth - 1)
        post <- Gen.alphaNumStr.map(_.take(5))
      } yield FStr(List(IText(pre), IExpr(e), IText(post)).filter {
        case IText(t) => t.nonEmpty; case _ => true
      })),
      1 -> (for {
        e <- exprGen(depth - 1)
      } yield SStr(List(IText("upper("), IExpr(e), IText(")")))),
      1 -> (for {
        n <- Gen.choose(2, 3)
        stages <- Gen.listOfN(n, Gen.oneOf(
          identGen,
          Gen.zip(Gen.oneOf("f", "g"), exprGen(depth - 1))
            .map { case (f, a) => FuncCall(f, List(a), Nil) }))
      } yield Pipeline(stages)),
    )

  private val stageGen: Gen[Expr] = for {
    name <- Gen.oneOf("filter", "derive", "select", "take2") // fake transforms fine: parse-level test
    n <- Gen.choose(1, 2)
    args <- Gen.listOfN(n, exprGen(2))
  } yield FuncCall(name, args, Nil)

  private val queryGen: Gen[Query] = for {
    nFuncs <- Gen.choose(0, 2)
    funcs <- Gen.listOfN(nFuncs, for {
      name <- Gen.identifier.map(_.take(5)).suchThat(_.nonEmpty)
      nP <- Gen.choose(1, 3)
      params <- Gen.listOfN(nP, for {
        pn <- Gen.identifier.map(_.take(4)).suchThat(_.nonEmpty)
        dflt <- Gen.option(litGen)
      } yield FuncDef.Param(pn, dflt))
      body <- exprGen(2)
    } yield FuncDef(name, params, body))
    nTables <- Gen.choose(0, 2)
    tables <- Gen.listOfN(nTables, for {
      tn <- Gen.identifier.map(_.take(5)).suchThat(_.nonEmpty)
      nS <- Gen.choose(1, 3)
      stages <- Gen.listOfN(nS, stageGen)
    } yield TableDef(tn, Pipeline(FuncCall("from", List(Ident(List("t"))), Nil) :: stages)))
    nS <- Gen.choose(0, 4)
    stages <- Gen.listOfN(nS, stageGen)
  } yield Query(funcs, tables,
    Some(Pipeline(FuncCall("from", List(Ident(List("base"))), Nil) :: stages)))

  test("parse(print(q)) == q for 300 random ASTs") {
    (1 to 300).foreach { i =>
      val q = queryGen(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail(s"generator returned no value for seed $i"))
      val printed = PrqlPrinter.print(q)
      val back =
        try Graft.parse(printed)
        catch {
          case e: Throwable =>
            fail(s"seed=$i re-parse failed: ${e.getMessage}\n--- printed:\n$printed\n--- ast: $q")
        }
      assert(back == q, s"seed=$i\n--- printed:\n$printed\n--- ast: $q")
    }
  }
}
