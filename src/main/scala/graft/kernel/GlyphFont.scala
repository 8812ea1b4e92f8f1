package graft.kernel

/** Built-in 5x7 bitmap font shared by the fixture renderer (graft.spark.Synth)
  * and the OCR decoder (graft.kernel.Ocr). Because both sides use the same
  * templates, scanned-page decode is exact by construction (SURVEY.md §5, §7.4.2);
  * the decoder still earns robustness from Otsu + nearest-template classification
  * under the salt-and-pepper noise the generator injects.
  *
  * Geometry: glyph cell 5 cols x 7 rows; fixed pitch Advance=6 (1 blank spacing
  * col); line pitch 9 (2 blank rows); a space is one blank cell, so runs of
  * spaces survive round-trip — the `preserve_interword_spaces=1` semantics of the
  * reference's Tesseract config (`/root/reference/app/services/extractor.py:21`).
  * Every letter/digit has ink in row 0 and col 0, which keeps line-band and
  * left-edge detection stable under interior-only noise.
  */
object GlyphFont {

  final val W = 5
  final val H = 7
  final val Advance = 6 // cell + 1 spacing col
  final val LinePitch = 9 // cell + 2 spacing rows
  final val Margin = 2

  /** Ordered glyph table; order is the classification tie-break. */
  val glyphs: Vector[(Char, Vector[String])] = Vector(
    'A' -> Vector(".XXX.", "X...X", "X...X", "XXXXX", "X...X", "X...X", "X...X"),
    'B' -> Vector("XXXX.", "X...X", "X...X", "XXXX.", "X...X", "X...X", "XXXX."),
    'C' -> Vector(".XXXX", "X....", "X....", "X....", "X....", "X....", ".XXXX"),
    'D' -> Vector("XXX..", "X..X.", "X...X", "X...X", "X...X", "X..X.", "XXX.."),
    'E' -> Vector("XXXXX", "X....", "X....", "XXXX.", "X....", "X....", "XXXXX"),
    'F' -> Vector("XXXXX", "X....", "X....", "XXXX.", "X....", "X....", "X...."),
    'G' -> Vector(".XXXX", "X....", "X....", "X..XX", "X...X", "X...X", ".XXX."),
    'H' -> Vector("X...X", "X...X", "X...X", "XXXXX", "X...X", "X...X", "X...X"),
    'I' -> Vector("XXXXX", "..X..", "..X..", "..X..", "..X..", "..X..", "XXXXX"),
    'J' -> Vector("XXXXX", "....X", "....X", "....X", "....X", "X...X", ".XXX."),
    'K' -> Vector("X...X", "X..X.", "X.X..", "XX...", "X.X..", "X..X.", "X...X"),
    'L' -> Vector("X....", "X....", "X....", "X....", "X....", "X....", "XXXXX"),
    'M' -> Vector("X...X", "XX.XX", "X.X.X", "X.X.X", "X...X", "X...X", "X...X"),
    'N' -> Vector("X...X", "XX..X", "X.X.X", "X..XX", "X...X", "X...X", "X...X"),
    'O' -> Vector(".XXX.", "X...X", "X...X", "X...X", "X...X", "X...X", ".XXX."),
    'P' -> Vector("XXXX.", "X...X", "X...X", "XXXX.", "X....", "X....", "X...."),
    'Q' -> Vector(".XXX.", "X...X", "X...X", "X...X", "X.X.X", "X..X.", ".XX.X"),
    'R' -> Vector("XXXX.", "X...X", "X...X", "XXXX.", "X.X..", "X..X.", "X...X"),
    'S' -> Vector(".XXXX", "X....", "X....", ".XXX.", "....X", "....X", "XXXX."),
    'T' -> Vector("XXXXX", "..X..", "..X..", "..X..", "..X..", "..X..", "..X.."),
    'U' -> Vector("X...X", "X...X", "X...X", "X...X", "X...X", "X...X", ".XXX."),
    'V' -> Vector("X...X", "X...X", "X...X", "X...X", "X...X", ".X.X.", "..X.."),
    'W' -> Vector("X...X", "X...X", "X...X", "X.X.X", "X.X.X", "XX.XX", "X...X"),
    'X' -> Vector("X...X", "X...X", ".X.X.", "..X..", ".X.X.", "X...X", "X...X"),
    'Y' -> Vector("X...X", "X...X", ".X.X.", "..X..", "..X..", "..X..", "..X.."),
    'Z' -> Vector("XXXXX", "....X", "...X.", "..X..", ".X...", "X....", "XXXXX"),
    '0' -> Vector("XXXXX", "X...X", "X..XX", "X.X.X", "XX..X", "X...X", "XXXXX"),
    '1' -> Vector("XX...", ".X...", ".X...", ".X...", ".X...", ".X...", "XXXXX"),
    '2' -> Vector("XXXX.", "....X", "....X", ".XXX.", "X....", "X....", "XXXXX"),
    '3' -> Vector("XXXX.", "....X", "....X", ".XXX.", "....X", "....X", "XXXX."),
    '4' -> Vector("X..X.", "X..X.", "X..X.", "XXXXX", "...X.", "...X.", "...X."),
    '5' -> Vector("XXXXX", "X....", "XXXX.", "....X", "....X", "....X", "XXXX."),
    '6' -> Vector("XX...", "X....", "X....", "XXXX.", "X...X", "X...X", ".XXX."),
    '7' -> Vector("XXXXX", "....X", "...X.", "..X..", ".X...", ".X...", ".X..."),
    '8' -> Vector(".XXX.", "X...X", "X...X", ".XXX.", "X...X", "X...X", ".XXX."),
    '9' -> Vector(".XXX.", "X...X", "X...X", ".XXXX", "....X", "....X", "...X."),
    '.' -> Vector(".....", ".....", ".....", ".....", ".....", ".XX..", ".XX.."),
    ',' -> Vector(".....", ".....", ".....", ".....", ".XX..", "..X..", ".X..."),
    ':' -> Vector(".....", ".XXX.", ".XXX.", ".....", ".XXX.", ".XXX.", "....."),
    ';' -> Vector(".....", ".XX..", ".XX..", ".....", ".XX..", "..X..", ".X..."),
    '#' -> Vector(".X.X.", "XXXXX", ".X.X.", ".X.X.", ".X.X.", "XXXXX", ".X.X."),
    '-' -> Vector(".....", ".....", ".....", "XXXXX", ".....", ".....", "....."),
    '/' -> Vector("....X", "....X", "...X.", "..X..", ".X...", "X....", "X....")
  )

  val byChar: Map[Char, Vector[String]] = glyphs.toMap

  /** Charset a scanned fixture line may contain (plus space). */
  def supported(c: Char): Boolean = c == ' ' || byChar.contains(c)

  /** Bit mask per glyph: bit (row*5+col) set when inked. */
  val masks: Vector[(Char, Long)] = glyphs.map { case (c, rows) =>
    var m = 0L
    for (r <- 0 until H; col <- 0 until W)
      if (rows(r).charAt(col) == 'X') m |= 1L << (r * W + col)
    c -> m
  }

  /** Rendered image geometry for `lines` of text (pure; used by Synth + tests). */
  def imageSize(lines: Seq[String]): (Int, Int) = {
    val maxCols = if (lines.isEmpty) 0 else lines.map(_.length).max
    val w = 2 * Margin + math.max(1, maxCols * Advance - 1)
    val h = 2 * Margin + math.max(1, lines.length * LinePitch - 2)
    (w, h)
  }

  /** Render lines into a grayscale page. Deterministic: `seed` drives background/
    * foreground shade variation and the interior-only salt-and-pepper noise
    * (<=1 flipped pixel per glyph, rows 1-5 x cols 1-3, so line bands, the left
    * edge, and the fixed pitch survive).
    */
  def render(lines: Seq[String], seed: Long, noise: Boolean): Array[Byte] = {
    val (w, h) = imageSize(lines)
    val px = new Array[Byte](w * h)
    var rng = seed
    def next(): Long = { rng = Hash64.mix(rng); rng }
    // textured background
    var i = 0
    while (i < px.length) { px(i) = (230 + (next() & 0x19)).toByte; i += 1 } // 230..255
    def put(x: Int, y: Int, v: Int): Unit =
      if (x >= 0 && x < w && y >= 0 && y < h) px(y * w + x) = v.toByte
    for ((line, li) <- lines.zipWithIndex) {
      val y0 = Margin + li * LinePitch
      for ((ch, ci) <- line.zipWithIndex) {
        val x0 = Margin + ci * Advance
        byChar.get(ch) match {
          case Some(rows) =>
            val fg = (10 + (next() & 0x1f)).toInt // 10..41 per glyph
            for (r <- 0 until H; col <- 0 until W)
              if (rows(r).charAt(col) == 'X') put(x0 + col, y0 + r, fg)
            if (noise && (next() & 1L) == 1L) {
              // flip one interior pixel: rows 1..5, cols 1..3
              val r = 1 + (next() % 5).toInt.abs
              val col = 1 + (next() % 3).toInt.abs
              val inked = rows(r).charAt(col) == 'X'
              put(x0 + col, y0 + r, if (inked) (230 + (next() & 0x19)).toInt else 20)
            }
          case None => // unsupported char renders as blank cell (space)
        }
      }
    }
    Raster.writeGray(w, h, px)
  }
}

/** SplitMix64 — deterministic 64-bit mixing for seeds/noise/hashes; public
  * algorithm (Steele et al., "Fast Splittable Pseudorandom Number Generators").
  */
object Hash64 {
  def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Stable 64-bit hash of a string (FNV-1a over UTF-8, then mixed). */
  def ofString(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    mix(h)
  }
}
