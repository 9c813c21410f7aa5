package graft

import graft.ast.Span

/** Plain-text located error rendering — the reference threads a `Span`
  * through every AST node and renders underlined, located errors via
  * ariadne (prql-compiler/src/error.rs:1-270); this provides the same
  * affordance for lex/parse/plan errors:
  *
  * {{{
  * unknown column 'nope'
  *  --> line 2, col 8
  *   |
  * 2 | filter nope > 1
  *   |        ^^^^
  * }}}
  */
object ErrorRender {

  /** 1-based (line, column) of a byte offset into the source. */
  def lineCol(src: String, off: Int): (Int, Int) = {
    val o = math.max(0, math.min(off, src.length))
    var line = 1
    var col = 1
    var i = 0
    while (i < o) {
      if (src.charAt(i) == '\n') { line += 1; col = 1 } else col += 1
      i += 1
    }
    (line, col)
  }

  /** Annotate a message with its location and an underlined source line.
    * The underline covers [span.start, span.end) clamped to the first line
    * of the span and trimmed of trailing whitespace. */
  def annotate(src: String, msg: String, span: Span): String = {
    val start = math.max(0, math.min(span.start, src.length))
    val (line, col) = lineCol(src, start)
    val lineStart = src.lastIndexOf('\n', math.max(0, start - 1)) match {
      case -1 => 0
      case nl => if (nl < start) nl + 1 else 0
    }
    val lineEnd = src.indexOf('\n', lineStart) match {
      case -1 => src.length
      case nl => nl
    }
    val text = src.substring(lineStart, lineEnd)
    var end = math.max(start, math.min(span.end, lineEnd))
    while (end > start && src.charAt(end - 1).isWhitespace) end -= 1
    val width = math.max(1, end - start)
    val gutter = line.toString
    val pad = " " * gutter.length
    val sb = new StringBuilder
    sb ++= msg
    sb ++= s"\n$pad--> line $line, col $col"
    sb ++= s"\n$pad |"
    sb ++= s"\n$gutter | $text"
    sb ++= s"\n$pad | ${" " * (col - 1)}${"^" * width}"
    sb.toString
  }

  /** Annotate at a single offset (lex/parse errors carry a position, not a
    * node span). */
  def annotateAt(src: String, msg: String, pos: Int): String =
    annotate(src, msg, Span(pos, pos + 1))
}
