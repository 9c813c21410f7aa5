package graft.parse

import scala.collection.mutable.ArrayBuffer

/** Tokens for the PRQL grammar (reference: prql-compiler/src/prql.pest). */
sealed trait Tok extends Product with Serializable { def pos: Int }
object Tok {
  /** Dotted ident; backticks stripped per segment; `*` allowed as a trailing
    * segment (prql.pest:35-43). */
  final case class TIdent(parts: List[String], pos: Int) extends Tok
  final case class TInt(v: Long, pos: Int) extends Tok
  final case class TFloat(v: Double, pos: Int) extends Tok
  final case class TStr(v: String, pos: Int) extends Tok
  /** s"..." / f"..." with raw text + brace-delimited expression source parts. */
  final case class TInterp(kind: Char, parts: List[Either[String, String]],
                           pos: Int) extends Tok
  final case class TDate(s: String, pos: Int) extends Tok
  final case class TTime(s: String, pos: Int) extends Tok
  final case class TTimestamp(s: String, pos: Int) extends Tok
  final case class TInterval(n: Long, unit: String, pos: Int) extends Tok
  /** `{{ … }}` jinja block — passed through verbatim (prql.pest:163). */
  final case class TJinja(src: String, pos: Int) extends Tok
  /** Operators & punctuation: ( ) [ ] , : = == != >= <= > < + - * / % ?? .. -> | ! and or */
  final case class TOp(s: String, pos: Int) extends Tok
  final case class TKw(s: String, pos: Int) extends Tok // func table prql true false null
  final case class TNewline(pos: Int) extends Tok
  final case class TEof(pos: Int) extends Tok
}

final class LexError(msg: String, val pos: Int) extends Exception(msg)

/** Hand-rolled lexer (offline build: no parser libs). Whitespace separates
  * tokens; newlines are significant (pipeline separators, prql.pest:31). */
object Lexer {
  import Tok._

  private val intervalUnits = Set("microseconds", "milliseconds", "seconds",
    "minutes", "hours", "days", "weeks", "months", "years")

  def lex(src: String): Vector[Tok] = {
    val out = ArrayBuffer.empty[Tok]
    var i = 0
    val n = src.length
    def peek(k: Int = 0): Char = if (i + k < n) src.charAt(i + k) else '\u0000'
    def isIdentStart(c: Char) = c.isLetter || c == '$' || c == '_'
    def isIdentCh(c: Char) = c.isLetterOrDigit || c == '_'

    while (i < n) {
      val c = src.charAt(i)
      val p = i
      c match {
        case ' ' | '\t' | '\r' => i += 1
        case '#' =>
          // consume to end of line; a line that is ONLY a comment contributes
          // no newline of its own (otherwise `stage \n #c \n stage` reads as
          // a blank line and splits the pipeline — book/tests syntax-6)
          val fullLineComment = out.isEmpty || out.last.isInstanceOf[TNewline]
          while (i < n && src.charAt(i) != '\n') i += 1
          if (fullLineComment && i < n) i += 1 // swallow the terminating \n
        case '\n' => out += TNewline(p); i += 1
        case '(' | ')' | '[' | ']' | ',' | ':' | '*' | '/' | '%' | '!' | '|' =>
          // `!=` is two-char
          if (c == '!' && peek(1) == '=') { out += TOp("!=", p); i += 2 }
          else { out += TOp(c.toString, p); i += 1 }
        case '=' =>
          if (peek(1) == '=') { out += TOp("==", p); i += 2 }
          else { out += TOp("=", p); i += 1 }
        case '>' =>
          if (peek(1) == '=') { out += TOp(">=", p); i += 2 }
          else { out += TOp(">", p); i += 1 }
        case '<' =>
          if (peek(1) == '=') { out += TOp("<=", p); i += 2 }
          else { out += TOp("<", p); i += 1 }
        case '?' =>
          if (peek(1) == '?') { out += TOp("??", p); i += 2 }
          else throw new LexError(s"unexpected '?'", p)
        case '{' if peek(1) == '{' =>
          // jinja pass-through block (prql.pest:163, translator.rs:43-46)
          val end = src.indexOf("}}", i + 2)
          if (end < 0) throw new LexError("unterminated jinja block", p)
          out += TJinja(src.substring(i, end + 2), p); i = end + 2
        case '+' => out += TOp("+", p); i += 1
        case '-' =>
          if (peek(1) == '>') { out += TOp("->", p); i += 2 }
          else { out += TOp("-", p); i += 1 }
        case '.' =>
          if (peek(1) == '.') { out += TOp("..", p); i += 2 }
          else throw new LexError("unexpected '.'", p)
        case '@' =>
          // date/time/timestamp: consume until end_expr (prql.pest:146-160)
          i += 1
          val sb = new StringBuilder
          def endExpr: Boolean = {
            val ch = peek()
            ch == '\u0000' || ch == ' ' || ch == '\t' || ch == ',' ||
              ch == ')' || ch == ']' || ch == '\n' || ch == '\r' ||
              (ch == '.' && peek(1) == '.')
          }
          while (!endExpr) { sb += src.charAt(i); i += 1 }
          val s = sb.toString
          // validate the literal shape (prql.pest:146-160 requires a clean
          // end_expr boundary) — otherwise `@2020-01-01+1days` would become a
          // silent string literal instead of a parse error
          if (s.matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}(:\d{2}(\.\d+)?)?([+-]\d{2}:?\d{2}|Z)?"""))
            out += TTimestamp(s, p)
          else if (s.matches("""\d{4}-\d{2}-\d{2}""")) out += TDate(s, p)
          else if (s.matches("""\d{2}:\d{2}(:\d{2}(\.\d+)?)?""")) out += TTime(s, p)
          else throw new LexError(s"malformed date/time literal '@$s'", p)
        case '\'' | '"' =>
          val (v, ni) = lexString(src, i)
          out += TStr(v, p); i = ni
        case '`' =>
          // backtick ident (possibly dotted with more segments)
          val (tok, ni) = lexIdent(src, i)
          out += tok; i = ni
        case d if d.isDigit =>
          var j = i
          while (j < n && src.charAt(j).isDigit) j += 1
          var isFloat = false
          if (j < n && src.charAt(j) == '.' && j + 1 < n &&
              src.charAt(j + 1).isDigit) {
            isFloat = true; j += 1
            while (j < n && src.charAt(j).isDigit) j += 1
          }
          val numText = src.substring(i, j)
          // interval: number immediately followed by a unit (prql.pest:143-144)
          if (!isFloat && j < n && src.charAt(j).isLetter) {
            var k = j
            while (k < n && src.charAt(k).isLetter) k += 1
            val unit = src.substring(j, k)
            if (intervalUnits(unit)) { out += TInterval(numText.toLong, unit, p); i = k }
            else if (intervalUnits(unit + "s")) { out += TInterval(numText.toLong, unit + "s", p); i = k }
            else throw new LexError(s"unknown interval unit '$unit'", p)
          } else {
            if (isFloat) out += TFloat(numText.toDouble, p) else out += TInt(numText.toLong, p)
            i = j
          }
        case sf if (sf == 's' || sf == 'f') && (peek(1) == '"' || peek(1) == '\'') =>
          val (parts, ni) = lexInterp(src, i + 1)
          out += TInterp(sf, parts, p); i = ni
        case c0 if isIdentStart(c0) =>
          val (tok, ni) = lexIdent(src, i)
          i = ni
          tok match {
            case TIdent(List(w), pp) if w == "and" || w == "or" => out += TOp(w, pp)
            case TIdent(List(w), pp) if w == "func" || w == "table" || w == "prql" ||
                 w == "true" || w == "false" || w == "null" => out += TKw(w, pp)
            case t => out += t
          }
        case other => throw new LexError(s"unexpected character '$other'", p)
      }
    }
    out += TEof(n)
    out.toVector
  }

  /** quoted string: `'…'`, `"…"`, or 3+ repeated quotes (prql.pest:111-117).
    * No escape sequences in the reference grammar — pass through verbatim. */
  private def lexString(src: String, start: Int): (String, Int) = {
    val q = src.charAt(start)
    var i = start
    var nq = 0
    while (i < src.length && src.charAt(i) == q) { nq += 1; i += 1 }
    if (nq >= 3) {
      val close = q.toString * nq
      val end = src.indexOf(close, i)
      if (end < 0) throw new LexError("unterminated string", start)
      (src.substring(i, end), end + nq)
    } else if (nq == 2) ("", i) // empty string ""
    else {
      val end = src.indexOf(q, i)
      if (end < 0) throw new LexError("unterminated string", start)
      (src.substring(i, end), end + 1)
    }
  }

  /** s/f-string body: Left(text) | Right(exprSource). Supports nested braces
    * inside the interpolation (prql.pest:139-141). */
  private def lexInterp(src: String, start: Int): (List[Either[String, String]], Int) = {
    val q = src.charAt(start)
    var i = start
    var nq = 0
    while (i < src.length && src.charAt(i) == q) { nq += 1; i += 1 }
    val close = q.toString * (if (nq >= 3) nq else 1)
    if (nq == 2) return (Nil, i) // empty
    val parts = ArrayBuffer.empty[Either[String, String]]
    val text = new StringBuilder
    while (i < src.length && !src.startsWith(close, i)) {
      val c = src.charAt(i)
      if (c == '{') {
        if (text.nonEmpty) { parts += Left(text.toString); text.clear() }
        var depth = 1; i += 1
        val e = new StringBuilder
        while (i < src.length && depth > 0) {
          val ch = src.charAt(i)
          if (ch == '{') depth += 1
          else if (ch == '}') depth -= 1
          if (depth > 0) e += ch
          i += 1
        }
        if (depth != 0) throw new LexError("unterminated interpolation", start)
        parts += Right(e.toString)
      } else { text += c; i += 1 }
    }
    if (i >= src.length) throw new LexError("unterminated s/f-string", start)
    if (text.nonEmpty) parts += Left(text.toString)
    (parts.toList, i + close.length)
  }

  /** dotted ident, each segment either bare, backticked, or `*` (last only). */
  private def lexIdent(src: String, start: Int): (Tok.TIdent, Int) = {
    var i = start
    val parts = ArrayBuffer.empty[String]
    def isIdentStart(c: Char) = c.isLetter || c == '$' || c == '_'
    def isIdentCh(c: Char) = c.isLetterOrDigit || c == '_'
    def seg(allowStar: Boolean): Boolean = {
      if (i >= src.length) return false
      val c = src.charAt(i)
      if (c == '`') {
        val end = src.indexOf('`', i + 1)
        if (end < 0) throw new LexError("unterminated backtick ident", i)
        parts += src.substring(i + 1, end); i = end + 1; true
      } else if (allowStar && c == '*') { parts += "*"; i += 1; true }
      else if (isIdentStart(c)) {
        var j = i + 1
        while (j < src.length && isIdentCh(src.charAt(j))) j += 1
        parts += src.substring(i, j); i = j; true
      } else false
    }
    if (!seg(allowStar = false)) throw new LexError("expected ident", start)
    var continue = true
    while (continue && i < src.length && src.charAt(i) == '.' &&
           i + 1 < src.length && src.charAt(i + 1) != '.') {
      i += 1
      if (!seg(allowStar = true)) throw new LexError("expected ident segment after '.'", i)
    }
    (Tok.TIdent(parts.toList, start), i)
  }
}
