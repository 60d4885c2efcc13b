package graft.core

/** Failure-message styling (reference `src/datajudge/formatter.py:10-36`):
  * messages carry BBCode-ish `[numDiff]...[/numDiff]` markers around the
  * differing part of two compared numbers; formatters render or strip them.
  */
trait Formatter {
  def fmt(message: String): String
}

/** Strip markers (default; reference `Formatter.fmt_str` plain path). */
object PlainFormatter extends Formatter {
  override def fmt(message: String): String =
    message.replace("[numDiff]", "").replace("[/numDiff]", "")
}

/** ANSI styling: differing number parts render red+bold
  * (reference `AnsiColorFormatter`).
  */
object AnsiFormatter extends Formatter {
  override def fmt(message: String): String =
    message.replace("[numDiff]", Console.RED + Console.BOLD).replace("[/numDiff]", Console.RESET)
}

object Formatter {

  /** Highlight how two numbers differ (reference `utils.format_difference`):
    * returns both rendered with thousands separators, the differing suffix
    * wrapped in `[numDiff]` tags.
    */
  def formatDifference(n1: Any, n2: Any, decimalSeparator: Boolean = true): (String, String) = {
    def render(v: Any): String = v match {
      case l: Long if decimalSeparator   => f"$l%,d"
      case i: Int if decimalSeparator    => f"$i%,d"
      case d: Double if decimalSeparator => f"$d%,f".replaceAll("0+$", "").stripSuffix(".")
      case other                         => String.valueOf(other)
    }
    val (s1, s2) = (render(n1), render(n2))
    val diffIdx = s1.zip(s2).indexWhere { case (a, b) => a != b } match {
      case -1 => math.min(s1.length, s2.length)
      case i  => i
    }
    def mark(s: String): String =
      if (diffIdx < s.length) s"${s.take(diffIdx)}[numDiff]${s.drop(diffIdx)}[/numDiff]"
      else s
    (mark(s1), mark(s2))
  }
}
