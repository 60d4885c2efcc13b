package graft.core

/** Lossless JSON string escaping shared by every artifact writer (Verify's
  * oracle dump, example data staging): backslash, quote, and ALL control
  * characters (< 0x20) — a tab or CR in builder-authored SQL or document
  * text must not invalidate a JSON artifact.
  */
object JsonEscape {
  /** `s` as a quoted JSON string literal. */
  def string(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""
}
