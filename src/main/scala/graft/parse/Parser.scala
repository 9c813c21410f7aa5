package graft.parse

import graft.ast._
import graft.ast.Expr._
import Tok._

final class ParseError(msg: String, val pos: Int) extends Exception(msg)

/** Source spans for parsed AST nodes, keyed by node IDENTITY (case-class
  * equality would conflate structurally equal nodes like two `IntLit(1)`s).
  * Nodes produced by compile-time rewrites (function inlining, pipe
  * currying) have no entry and fall back to their enclosing call/stage. */
final class SpanMap(m: java.util.IdentityHashMap[Expr, Span]) {
  def get(e: Expr): Option[Span] = Option(m.get(e))
}
object SpanMap {
  val empty = new SpanMap(new java.util.IdentityHashMap)
}

/** Recursive-descent parser mirroring prql.pest (reference @ v0.2.2).
  * Notable fidelity points:
  *  - binary chains at one precedence level nest to the RIGHT
  *    (prql.pest:83-88 right-recursive rules; parser.rs:105-120 keeps them);
  *  - func-call args are greedy full exprs, but an arg may not START with an
  *    operator (prql.pest:78 `!operator`), so `foo - 3` is binary while
  *    `foo bar` is application;
  *  - `a ?? b` parses to FuncCall("coalesce") (parser.rs:140-153);
  *  - `+x` unary is identity (parser.rs:121-133).
  */
object Parser {

  def parse(src: String): Query = new Parser(Lexer.lex(src)).parseQuery()

  /** Parse and also return the node→span side table (for located errors and
    * the CLI annotate modes). */
  def parseWithSpans(src: String): (Query, SpanMap) = {
    val p = new Parser(Lexer.lex(src))
    val q = p.parseQuery()
    (q, p.spanMap)
  }

  /** Parse a single expression-call fragment (used for s/f-string interps). */
  def parseExprFragment(src: String): Expr = {
    val p = new Parser(Lexer.lex(src))
    val e = p.parseExprCall()
    p.expectEnd()
    e
  }
}

private final class Parser(toks: Vector[Tok]) {
  private var i = 0

  /** Node spans by identity; end = start of the following token (rendering
    * trims trailing whitespace). First record wins, so a node recorded by a
    * tight production (e.g. parsePrimary) keeps its tight span when an
    * enclosing production records again. NullLit is the one shared case
    * object — never record it. */
  private val spans = new java.util.IdentityHashMap[Expr, Span]()
  def spanMap: SpanMap = new SpanMap(spans)
  private def recorded(start: Int, e: Expr): Expr = {
    if ((e.asInstanceOf[AnyRef] ne Expr.NullLit) && !spans.containsKey(e))
      spans.put(e, Span(start, peek.pos))
    e
  }
  private def peek: Tok = toks(i)
  private def peek2: Tok = if (i + 1 < toks.length) toks(i + 1) else toks.last
  private def next(): Tok = { val t = toks(i); if (i < toks.length - 1) i += 1; t }
  private def err(msg: String): Nothing = throw new ParseError(s"$msg (at ${peek})", posOf(peek))
  private def posOf(t: Tok): Int = t.pos

  private def isOp(s: String): Boolean = peek match { case TOp(o, _) => o == s; case _ => false }
  private def expectOp(s: String): Unit =
    if (isOp(s)) { next(); () } else err(s"expected '$s'")
  private def skipNewlines(): Unit = while (peek.isInstanceOf[TNewline]) next()

  def expectEnd(): Unit = { skipNewlines(); if (!peek.isInstanceOf[TEof]) err("trailing input") }

  // ---------------- query ----------------

  def parseQuery(): Query = {
    val funcs = List.newBuilder[FuncDef]
    val tables = List.newBuilder[TableDef]
    var main: Option[Pipeline] = None
    skipNewlines()
    // optional `prql dialect:… version:…` header — accept and ignore
    peek match {
      case TKw("prql", _) =>
        next()
        while (!peek.isInstanceOf[TNewline] && !peek.isInstanceOf[TEof]) next()
      case _ => ()
    }
    var done = false
    while (!done) {
      skipNewlines()
      peek match {
        case TEof(_) => done = true
        case TKw("func", _) => funcs += parseFuncDef()
        case TKw("table", _) => tables += parseTableDef()
        case _ =>
          main = Some(parseTopPipeline())
      }
    }
    Query(funcs.result(), tables.result(), main)
  }

  /** Top-level pipeline: stages separated by `|` or a single newline; a blank
    * line, a def keyword, or EOF ends it (prql.pest:14,31). */
  private def parseTopPipeline(): Pipeline = {
    val stages = List.newBuilder[Expr]
    stages += parseExprCall()
    var done = false
    while (!done) {
      peek match {
        case TOp("|", _) => next(); skipNewlines(); stages += parseExprCall()
        case TNewline(_) =>
          // look past one newline
          next()
          peek match {
            case TNewline(_) | TEof(_) | TKw("func", _) | TKw("table", _) => done = true
            case _ => stages += parseExprCall()
          }
        case TEof(_) => done = true
        case _ => err("unexpected token in pipeline")
      }
    }
    Pipeline(stages.result())
  }

  private def parseFuncDef(): FuncDef = {
    next() // func
    val name = peek match {
      case TIdent(parts, _) => next(); parts.mkString(".")
      case _ => err("expected function name")
    }
    skipTypeDef()
    val params = List.newBuilder[FuncDef.Param]
    while (!isOp("->")) {
      peek match {
        case TIdent(List(p), _) =>
          next()
          skipTypeDef()
          if (isOp(":")) {
            next()
            val dflt = parseExpr()
            params += FuncDef.Param(p, Some(dflt))
          } else params += FuncDef.Param(p, None)
        case _ => err("expected function parameter")
      }
    }
    expectOp("->")
    val body = parseExpr()
    FuncDef(name, params.result(), body)
  }

  /** `<scalar|column>` type annotations are parsed and discarded — the only
    * use in the reference is transform/window classification
    * (src/ast/types.rs:66-101), which we key off function names instead. */
  private def skipTypeDef(): Unit = {
    if (isOp("<")) {
      var depth = 0
      var going = true
      while (going) {
        peek match {
          case TOp("<", _) => depth += 1; next()
          case TOp(">", _) => depth -= 1; next(); if (depth == 0) going = false
          case TEof(_) => err("unterminated type annotation")
          case _ => next()
        }
      }
    }
  }

  private def parseTableDef(): TableDef = {
    next() // table
    val name = peek match {
      case TIdent(List(n), _) => next(); n
      case _ => err("expected table name")
    }
    expectOp("=")
    skipNewlines()
    val p = parseNestedPipeline() match {
      case p: Pipeline => p
      case e => Pipeline(List(e))
    }
    TableDef(name, p)
  }

  // ---------------- calls & exprs ----------------

  /** expr_call = func_call | expr. A func call is an ident followed (with
    * whitespace) by at least one argument that does not start with an
    * operator. */
  def parseExprCall(): Expr = {
    val start = peek.pos
    peek match {
      case TIdent(parts, _) if startsArg(peek2) =>
        next()
        val name = parts.mkString(".")
        val args = List.newBuilder[Expr]
        val named = List.newBuilder[(String, Expr)]
        while (startsArg(peek)) {
          peek match {
            case TIdent(List(n), _) if isOpTok(peek2, ":") =>
              next(); next()
              named += ((n, parseExpr()))
            case TIdent(List(n), _) if isOpTok(peek2, "=") =>
              next(); next()
              args += Assign(n, parseExpr())
            case _ => args += parseExpr()
          }
        }
        recorded(start, FuncCall(name, args.result(), named.result()))
      case _ => parseExpr()
    }
  }

  private def isOpTok(t: Tok, s: String): Boolean = t match {
    case TOp(o, _) => o == s
    case _ => false
  }

  /** Does this token start a (non-operator-leading) func-call argument? */
  private def startsArg(t: Tok): Boolean = t match {
    case TIdent(_, _) | TInt(_, _) | TFloat(_, _) | TStr(_, _) |
         TInterp(_, _, _) | TDate(_, _) | TTime(_, _) | TTimestamp(_, _) |
         TInterval(_, _, _) | TJinja(_, _) => true
    case TKw(k, _) => k == "true" || k == "false" || k == "null"
    case TOp(o, _) => o == "(" || o == "[" || o == ".." || o == "!"
    case _ => false
  }

  // precedence ladder: mul < add < compare < coalesce < logical (prql.pest:83-88).
  // Same-precedence chains associate LEFT: the reference's pest grammar is
  // right-recursive, but translator.rs renders BinaryOp without parentheses
  // and the target DB re-parses the flat SQL left-associatively, so the
  // observable semantics of `a - b + c` are `(a - b) + c`.
  // `and` binds tighter than `or`: the reference's grammar has one flat
  // operator_logical level, but it renders unparenthesized SQL that the
  // target DB re-parses with standard AND > OR precedence — that is the
  // observable semantics (`a or b and c` ≡ `a or (b and c)`).
  def parseExpr(): Expr = {
    val start = peek.pos
    var l = parseAndChain()
    var going = true
    while (going) peek match {
      case TOp("or", _) => next(); l = Binary("or", l, parseAndChain())
      case _ => going = false
    }
    recorded(start, l)
  }

  private def parseAndChain(): Expr = {
    val start = peek.pos
    var l = parseCoalesce()
    var going = true
    while (going) peek match {
      case TOp("and", _) => next(); l = Binary("and", l, parseCoalesce())
      case _ => going = false
    }
    recorded(start, l)
  }

  private def parseCoalesce(): Expr = {
    val start = peek.pos
    var l = parseCompare()
    while (isOp("??")) { next(); l = FuncCall("coalesce", List(l, parseCompare()), Nil) }
    recorded(start, l)
  }

  private def parseCompare(): Expr = {
    var l = parseAdd()
    var going = true
    while (going) peek match {
      case TOp(op @ ("==" | "!=" | ">=" | "<=" | ">" | "<"), _) =>
        next(); l = Binary(op, l, parseAdd())
      case _ => going = false
    }
    l
  }

  private def parseAdd(): Expr = {
    var l = parseMul()
    var going = true
    while (going) peek match {
      case TOp(op @ ("+" | "-"), _) => next(); l = Binary(op, l, parseMul())
      case _ => going = false
    }
    l
  }

  private def parseMul(): Expr = {
    var l = parseTerm()
    var going = true
    while (going) peek match {
      case TOp(op @ ("*" | "/" | "%"), _) => next(); l = Binary(op, l, parseTerm())
      case _ => going = false
    }
    l
  }

  /** term, with range detection: `lit? .. lit?` (prql.pest:127-131). */
  private def parseTerm(): Expr = {
    if (isOp("..")) { // open-start range
      next()
      RangeLit(None, parseRangeEdge())
    } else {
      val p = parsePrimary()
      if (isOp("..")) { next(); RangeLit(Some(p), parseRangeEdge()) }
      else p
    }
  }

  private def parseRangeEdge(): Option[Expr] = peek match {
    case TInt(_, _) | TFloat(_, _) | TStr(_, _) | TDate(_, _) | TTime(_, _) |
         TTimestamp(_, _) | TInterval(_, _, _) => Some(parsePrimary())
    case TKw(k, _) if k == "true" || k == "false" || k == "null" => Some(parsePrimary())
    case TOp("-", _) => Some(parsePrimary())
    case _ => None
  }

  private def parsePrimary(): Expr = {
    val start = peek.pos
    recorded(start, parsePrimary0())
  }

  private def parsePrimary0(): Expr = peek match {
    case TInt(v, _) => next(); IntLit(v)
    case TFloat(v, _) => next(); FloatLit(v)
    case TStr(v, _) => next(); StrLit(v)
    case TDate(s, _) => next(); DateLit(s)
    case TTime(s, _) => next(); TimeLit(s)
    case TTimestamp(s, _) => next(); TimestampLit(s)
    case TInterval(n, u, _) => next(); IntervalLit(n, u)
    case TKw("true", _) => next(); BoolLit(true)
    case TKw("false", _) => next(); BoolLit(false)
    case TKw("null", _) => next(); NullLit
    case TIdent(parts, _) => next(); Ident(parts)
    case TJinja(src, _) => next(); JinjaLit(src)
    case TInterp(kind, parts, _) =>
      next()
      val ps = parts.map {
        case Left(s) => IText(s)
        case Right(src) => IExpr(Parser.parseExprFragment(src))
      }
      if (kind == 's') SStr(ps) else FStr(ps)
    case TOp("(", _) => parseNestedPipeline()
    case TOp("[", _) => parseList()
    case TOp("-", _) =>
      next()
      peek match {
        case TInt(v, _) => next(); IntLit(-v)
        case TFloat(v, _) => next(); FloatLit(-v)
        case _ => Unary("-", parsePrimary())
      }
    case TOp("+", _) => next(); parsePrimary() // `+x` ≡ x (parser.rs:131)
    case TOp("!", _) => next(); Unary("!", parsePrimary())
    case t => err(s"unexpected token $t")
  }

  /** `( pipeline )` — single plain stage unwraps to the expr itself. */
  private def parseNestedPipeline(): Expr = {
    expectOp("(")
    skipNewlines()
    val stages = List.newBuilder[Expr]
    stages += parseExprCall()
    var done = false
    while (!done) {
      peek match {
        case TOp("|", _) | TNewline(_) =>
          next(); skipNewlines()
          if (isOp(")")) done = true else stages += parseExprCall()
        case TOp(")", _) => done = true
        case _ => err("unexpected token in nested pipeline")
      }
    }
    expectOp(")")
    stages.result() match {
      case List(single) => single
      case more => Pipeline(more)
    }
  }

  /** `[item, item, …]`; items are assign_call | expr_call; newlines allowed
    * around items (prql.pest:100). */
  private def parseList(): Expr = {
    expectOp("[")
    skipNewlines()
    val items = List.newBuilder[Expr]
    if (!isOp("]")) {
      items += parseListItem()
      var done = false
      while (!done) {
        skipNewlines()
        if (isOp(",")) {
          next(); skipNewlines()
          if (isOp("]")) done = true else items += parseListItem()
        } else done = true
      }
    }
    skipNewlines()
    expectOp("]")
    EList(items.result())
  }

  /** assign_call rhs may itself be a func call: `ct = count` (prql.pest:49). */
  private def parseListItem(): Expr = {
    val start = peek.pos
    peek match {
      case TIdent(List(n), _) if isOpTok(peek2, "=") =>
        next(); next()
        recorded(start, Assign(n, parseExprCall()))
      case _ => parseExprCall()
    }
  }
}
