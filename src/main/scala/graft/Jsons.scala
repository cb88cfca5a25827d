package graft

/** The one JSON string-literal escaper for every emitter in the repo
  * (Bench, Verify, HttpInference) — backslash, quote, and all control
  * chars below 0x20; a future escaping fix lands once.
  */
object Jsons {
  def escape(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
