package graft.kernel

import java.nio.charset.StandardCharsets

/** E8 — HTML main-content extraction: streaming byte-level tokenizer feeding a
  * block model with Readability/trafilatura-style text-to-link-density scoring.
  *
  * This operator is grafted per BASELINE.json `north_rule` ("HTML boilerplate
  * strip ... DOM-density heuristics"); the reference itself only extracts PDFs
  * (`/root/reference/app/services/extractor.py:67-82`), so the dispatch slot this
  * fills is its digital-branch analog. All heuristics are frozen constants below —
  * the single-threaded oracle calls this same function, making extracted text
  * byte-identical per url by construction.
  *
  * Pipeline: tokenize (tags / text / comments / raw-text elements) → accumulate
  * text into blocks delimited by block-level tags → score each block
  * (length >= MinBlockChars and link-char density <= MaxLinkDensity, outside
  * boilerplate zones like nav/header/footer/aside/form) → emit kept blocks
  * joined with "\n", whitespace-collapsed within each block.
  */
object HtmlExtract {

  /** Minimum collapsed block length to keep (chars). */
  final val MinBlockChars = 25
  /** Maximum fraction of a block's chars that may come from inside <a>. */
  final val MaxLinkDensity = 1.0 / 3.0

  /** Elements whose entire subtree is boilerplate / non-content. */
  private val IgnoreZones: Set[String] = Set(
    "script", "style", "noscript", "template", "head", "nav", "header",
    "footer", "aside", "form", "button", "select", "option", "iframe",
    "svg", "object", "figcaption")

  /** Raw-text elements: content runs to the matching close tag, never parsed. */
  private val RawText: Set[String] = Set("script", "style", "textarea", "title")

  /** Void elements — never pushed on the open stack. */
  private val Void: Set[String] = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr")

  /** Tags that delimit text blocks (open or close flushes the current block). */
  private val BlockTags: Set[String] = Set(
    "address", "article", "aside", "blockquote", "body", "br", "caption",
    "dd", "div", "dl", "dt", "fieldset", "figure", "figcaption", "footer",
    "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "html",
    "li", "main", "nav", "ol", "p", "pre", "section", "table", "tbody",
    "td", "th", "thead", "tr", "ul")

  // one hash lookup per tag instead of one per category (hot path)
  private final val FBlock = 1
  private final val FVoid = 2
  private final val FIgnore = 4
  private final val FRaw = 8
  private val TagFlags: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]
    def add(names: Iterable[String], flag: Int): Unit = names.foreach { t =>
      val cur = m.get(t)
      m.put(t, Integer.valueOf(if (cur == null) flag else cur.intValue | flag))
    }
    add(BlockTags, FBlock); add(Void, FVoid); add(IgnoreZones, FIgnore); add(RawText, FRaw)
    m
  }

  def mainText(html: Array[Byte]): String =
    mainText(new String(html, StandardCharsets.UTF_8))

  def mainText(html: String): String = {
    val n = html.length
    val out = new StringBuilder
    val block = new StringBuilder
    var blockLinkChars = 0
    var ignoreDepth = 0 // nested IgnoreZones elements currently open
    var linkDepth = 0   // nested <a> elements currently open

    def flushBlock(): Unit = {
      if (block.nonEmpty) {
        val collapsed = collapseWs(block.toString)
        if (collapsed.length >= MinBlockChars &&
          blockLinkChars.toDouble <= MaxLinkDensity * block.length) {
          if (out.nonEmpty) out.append('\n')
          out.append(collapsed)
        }
        block.clear()
      }
      blockLinkChars = 0
    }

    def appendText(s: String): Unit =
      if (ignoreDepth == 0 && s.nonEmpty) {
        block.append(s)
        if (linkDepth > 0) blockLinkChars += s.length
      }

    // text-run append without the substring allocation: decode only when an
    // entity is actually present in [start, end)
    def appendRun(start: Int, end: Int): Unit =
      if (ignoreDepth == 0 && end > start) {
        val amp = html.indexOf('&', start)
        if (amp >= 0 && amp < end)
          appendText(decodeEntities(html.substring(start, end)))
        else {
          block.underlying.append(html, start, end)
          if (linkDepth > 0) blockLinkChars += end - start
        }
      }

    // jump between tags with String.indexOf (JVM SIMD intrinsic) instead of a
    // scalar per-char scan — text runs between tags are the bulk of a page
    var i = 0
    var textStart = 0
    var done = false
    while (!done) {
      val lt = html.indexOf('<', i)
      if (lt < 0 || lt + 1 >= n) done = true
      else {
        val c1 = html.charAt(lt + 1)
        if (c1 == '!') {
          appendRun(textStart, lt)
          if (html.startsWith("<!--", lt)) {
            val end = html.indexOf("-->", lt + 4)
            i = if (end < 0) n else end + 3
          } else {
            val end = html.indexOf('>', lt + 2)
            i = if (end < 0) n else end + 1
          }
          textStart = i
        } else if (c1 == '?') {
          appendRun(textStart, lt)
          val end = html.indexOf('>', lt + 2)
          i = if (end < 0) n else end + 1
          textStart = i
        } else if (c1 == '/' || isAsciiLetter(c1)) {
          appendRun(textStart, lt)
          val closing = c1 == '/'
          var p = if (closing) lt + 2 else lt + 1
          val nameStart = p
          while (p < n && (isAsciiLetter(html.charAt(p)) || isAsciiDigit(html.charAt(p)))) p += 1
          // names are [a-zA-Z0-9] by the scan above, so ASCII lowering is
          // exactly Py.lower here — skip the extra pass/alloc when already lower
          val name = lowerAsciiName(html, nameStart, p)
          // scan to tag end, honoring quoted attribute values
          var quote: Char = 0
          var end = -1
          while (p < n && end < 0) {
            val ch = html.charAt(p)
            if (quote != 0) { if (ch == quote) quote = 0 }
            else if (ch == '"' || ch == '\'') quote = ch
            else if (ch == '>') end = p
            p += 1
          }
          i = if (end < 0) n else end + 1
          textStart = i
          val selfClosing = end > 0 && html.charAt(end - 1) == '/'

          if (name.nonEmpty) {
            val f = TagFlags.get(name)
            val flags = if (f == null) 0 else f.intValue
            if ((flags & FBlock) != 0) flushBlock()
            if (!closing && !selfClosing && (flags & FVoid) == 0) {
              if (name == "a") linkDepth += 1
              if ((flags & FIgnore) != 0) ignoreDepth += 1
              if ((flags & FRaw) != 0) {
                // consume raw content up to the matching close tag
                val closeIdx = indexOfCloseTag(html, name, i)
                i = if (closeIdx < 0) n
                    else {
                      val gt = html.indexOf('>', closeIdx)
                      if (gt < 0) n else gt + 1
                    }
                textStart = i
                if ((flags & FIgnore) != 0) ignoreDepth -= 1
              }
            } else if (closing) {
              if (name == "a" && linkDepth > 0) linkDepth -= 1
              if ((flags & FIgnore) != 0 && ignoreDepth > 0) ignoreDepth -= 1
            }
          }
        } else {
          i = lt + 1 // literal '<' stays in the text run
        }
      }
    }
    appendRun(textStart, n)
    flushBlock()
    out.toString
  }

  private def lowerAsciiName(s: String, a: Int, b: Int): String = {
    var i = a
    var anyUpper = false
    while (i < b && !anyUpper) {
      val c = s.charAt(i); if (c >= 'A' && c <= 'Z') anyUpper = true; i += 1
    }
    if (!anyUpper) s.substring(a, b)
    else {
      val arr = new Array[Char](b - a)
      var j = 0
      while (j < b - a) {
        val c = s.charAt(a + j)
        arr(j) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        j += 1
      }
      new String(arr)
    }
  }

  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isAsciiDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** First `</name` (case-insensitive name) at or after `from`: jump between
    * "</" occurrences with the intrinsified indexOf, compare the name only
    * there — raw-text bodies (scripts, styles) are scanned at memcpy speed.
    */
  private def indexOfCloseTag(hay: String, name: String, from: Int): Int = {
    val nl = name.length
    var i = math.max(from, 0)
    while (true) {
      val lt = hay.indexOf("</", i)
      if (lt < 0 || lt + 2 + nl > hay.length) return -1
      if (hay.regionMatches(true, lt + 2, name, 0, nl)) return lt
      i = lt + 2
    }
    -1 // unreachable
  }

  /** Collapse ASCII whitespace runs to single spaces and trim. The collapse set
    * is exactly [\t\n\f\r ] so it agrees with the regex class `\s` in both
    * Java (default) and RE2 — the DuckDB oracle for the SQL-checked extraction
    * query relies on this equivalence.
    */
  def collapseWs(s: String): String = {
    val sb = new StringBuilder(s.length)
    var inWs = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val ws = c == ' ' || (c >= '\u0009' && c <= '\u000d')
      if (ws) inWs = true
      else {
        if (inWs && sb.nonEmpty) sb.append(' ')
        inWs = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Decode &amp; &lt; &gt; &quot; &apos; &nbsp; and numeric &#NN; / &#xHH;.
    * Unknown/unterminated entities pass through literally.
    */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 12) {
          val name = s.substring(i + 1, semi)
          val decoded: Option[String] = name match {
            case "amp"  => Some("&")
            case "lt"   => Some("<")
            case "gt"   => Some(">")
            case "quot" => Some("\"")
            case "apos" => Some("'")
            case "nbsp" => Some(" ")
            case _ if name.length > 1 && name.charAt(0) == '#' =>
              try {
                val cp =
                  if (name.charAt(1) == 'x' || name.charAt(1) == 'X')
                    Integer.parseInt(name.substring(2), 16)
                  else Integer.parseInt(name.substring(1))
                if (Character.isValidCodePoint(cp) && cp > 0)
                  Some(new String(Character.toChars(cp)))
                else None
              } catch { case _: NumberFormatException => None }
            case _ => None
          }
          decoded match {
            case Some(d) => sb.append(d); i = semi + 1
            case None    => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
