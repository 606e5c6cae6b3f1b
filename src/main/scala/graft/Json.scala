package graft

/** Single home for JSON string quoting (used by Verify's oracle dump and
  * the webhook message card — escaping rules must never drift between
  * them). Escapes backslash, quote, and ALL control chars (<0x20): a tab
  * or CR in builder-authored SQL or alert text would otherwise break the
  * consumer's JSON parse. */
private[graft] object Json {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
