package graft.util

/** The one JSON string escaper (quote/backslash/newline/CR/tab/control
  * chars) — previously re-implemented in the server, the verify dump, the
  * model renderer and the asset generator; a missed escape fixed in one
  * copy would silently diverge the others.
  */
object Json {
  def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** `s` as a quoted JSON string literal. */
  def str(s: String): String = "\"" + escape(s) + "\""
}
