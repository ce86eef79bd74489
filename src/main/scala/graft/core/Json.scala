package graft.core

/** Minimal JSON emission (no library dependency): string escape + flat
  * string-map objects. Escapes backslash, quote, and ALL control chars
  * (<0x20) — a tab or CR in builder-authored SQL would otherwise make a
  * downstream json.load fail and silently zero a round's correctness. */
object Json {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def obj(m: Map[String, String]): String =
    m.map { case (k, v) => s"${str(k)}: ${str(v)}" }.mkString("{", ",", "}")
}
