package graft.util

/** Minimal JSON string escaping shared by the driver-contract mains.
  * Escapes backslash, quote, and ALL control chars (<0x20) — a stray tab,
  * ESC, or NUL in an error message or builder-authored SQL would otherwise
  * make the driver's json.load fail and silently zero the round's output. */
object Json {
  def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def quote(s: String): String = "\"" + escape(s) + "\""
}
