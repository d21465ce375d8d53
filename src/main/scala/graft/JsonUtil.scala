package graft

/** Driver-side JSON string escaping — ONE definition shared by Verify
  * (oracle_sql.json emission) and api.Responses (the mbid_mapping splice),
  * so the two emitters can't drift on which character classes get escaped. */
object JsonUtil {
  def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** A quoted JSON string literal. */
  def str(s: String): String = "\"" + esc(s) + "\""
}
