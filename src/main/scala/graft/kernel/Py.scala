package graft.kernel

import java.util.Locale

/** Python `str` semantics needed for byte-identical search-kernel behavior.
  *
  * The reference's search layer (`/root/reference/app/services/search.py`) leans on
  * CPython string methods whose semantics differ from the JVM defaults:
  *   - `str.splitlines()` splits on 11 line-boundary code points, not just \n / \r\n
  *     (used at search.py:47);
  *   - `str.strip()` strips Unicode whitespace including U+001C-1F/U+0085
  *     (search.py:101,160);
  *   - `str.rstrip(":;\\")` strips a char *set* from the right (search.py:160);
  *   - case mapping must be locale-independent (search.py:33,50,146).
  *
  * One shared implementation keeps the Spark engine and the single-threaded oracle
  * identical by construction.
  */
object Py {

  /** Code points CPython's str.splitlines treats as line boundaries:
    * LF CR VT FF FS GS RS NEL LINE-SEP PARA-SEP (CRLF pairs up).
    */
  private def isLineBreak(c: Char): Boolean = c match {
    case '\n' | '\r' | '\u000b' | '\u000c' | '\u001c' | '\u001d' | '\u001e' |
        '\u0085' | '\u2028' | '\u2029' => true
    case _ => false
  }

  /** CPython `str.splitlines()` — CRLF counts as one boundary; no trailing "". */
  def splitLines(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    var start = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (isLineBreak(c)) {
        out += s.substring(start, i)
        if (c == '\r' && i + 1 < n && s.charAt(i + 1) == '\n') i += 1
        i += 1
        start = i
      } else i += 1
    }
    if (start < n) out += s.substring(start, n)
    out.result()
  }

  /** CPython `str.isspace()` character set (per-char). */
  def isSpace(c: Char): Boolean =
    (c >= '\u0009' && c <= '\u000d') || c == ' ' ||
      (c >= '\u001c' && c <= '\u001f') || c == '\u0085' ||
      (Character.getType(c) match {
        case Character.SPACE_SEPARATOR | Character.LINE_SEPARATOR |
            Character.PARAGRAPH_SEPARATOR => true
        case _ => false
      })

  /** CPython `str.strip()` (no args — Unicode whitespace). */
  def strip(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && isSpace(s.charAt(a))) a += 1
    while (b > a && isSpace(s.charAt(b - 1))) b -= 1
    s.substring(a, b)
  }

  /** CPython `str.rstrip(chars)` — strip any char in `chars` from the right. */
  def rstrip(s: String, chars: String): String = {
    var b = s.length
    while (b > 0 && chars.indexOf(s.charAt(b - 1)) >= 0) b -= 1
    s.substring(0, b)
  }

  /** CPython `str.upper()` stand-in: locale-independent full-string uppercase. */
  def upper(s: String): String = s.toUpperCase(Locale.ROOT)

  /** CPython `str.lower()` stand-in: locale-independent full-string lowercase. */
  def lower(s: String): String = s.toLowerCase(Locale.ROOT)
}
