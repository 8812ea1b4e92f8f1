package graft.kernel

/** E5 — deterministic OCR with PSM-6 semantics ("assume a single uniform block of
  * text"): scan line bands top-to-bottom, glyph cells left-to-right, blank cells
  * become spaces, line gaps become newlines — the behavior the reference requests
  * from Tesseract via `--oem 1 --psm 6 -c preserve_interword_spaces=1`
  * (`/root/reference/app/services/extractor.py:21,56-64`). No Tesseract binary
  * exists in this sandbox, so decoding is nearest-template classification against
  * the built-in GlyphFont over the Otsu-binarized page (extractor.py:40-43) —
  * exact on the fixture raster format by construction, robust to its
  * salt-and-pepper noise via Hamming-argmin.
  *
  * Per-page failures return "" and never throw, mirroring the reference's
  * per-page catch (`extractor.py:62-64`).
  */
object Ocr {

  /** Decode one raster page to text. Lines joined with "\n" + trailing "\n"
    * (pytesseract.image_to_string shape); empty/blank page -> "".
    */
  def decode(rasterBytes: Array[Byte]): String = {
    try decodeUnsafe(rasterBytes)
    catch { case scala.util.control.NonFatal(_) => "" }
  }

  private def decodeUnsafe(rasterBytes: Array[Byte]): String = {
    val g = Raster.decodeGray(rasterBytes)
    val ink = Raster.binarizeInk(g)
    val w = g.w
    val h = g.h

    // row ink projection -> contiguous line bands
    val rowInk = new Array[Int](h)
    var y = 0
    while (y < h) {
      var x = 0
      var cnt = 0
      while (x < w) { if (ink(y * w + x)) cnt += 1; x += 1 }
      rowInk(y) = cnt
      y += 1
    }
    // group inked rows by fixed-pitch LINE index rather than by contiguous
    // bands: a low-ink line ("..." inks only rows 5-6 of its cells) plus one
    // interior noise pixel at row 1-4 leaves a zero-ink gap inside the line,
    // which contiguous banding would split into two phantom lines
    val m = GlyphFont.Margin
    val byLine = scala.collection.mutable.SortedMap.empty[Int, (Int, Int)]
    y = 0
    while (y < h) {
      if (rowInk(y) > 0) {
        val li = math.max(0, (y - m) / GlyphFont.LinePitch)
        byLine(li) = byLine.get(li) match {
          case Some((t, b)) => (math.min(t, y), math.max(b, y))
          case None => (y, y)
        }
      }
      y += 1
    }

    val lines = byLine.values.toSeq.map { case (bTop, bBot) =>
      decodeBand(ink, w, bTop, bBot)
    }
    if (lines.isEmpty) "" else lines.mkString("", "\n", "\n")
  }

  /** Decode one line band assuming the font's fixed pitch: cells every
    * GlyphFont.Advance columns. The anchor SNAPS to the format's fixed grid
    * (Margin + k*Advance, Margin + li*LinePitch) rather than trusting the
    * band's first inked pixel — a line whose leading glyph has no ink in its
    * cell's column 0 ('.', ',', ':', ';') or whose glyphs have no ink in row
    * 0 (a line of '.'/'-') would otherwise shift the whole grid and decode to
    * garbage. Floor-snap is exact: first-ink offsets within a cell are always
    * < Advance (resp. < LinePitch), and the interior-only noise cannot create
    * ink outside glyph cells.
    */
  private def decodeBand(ink: Array[Boolean], w: Int, bTop: Int, bBot: Int): String = {
    val h = ink.length / w
    @inline def inked(x: Int, y: Int): Boolean =
      x >= 0 && x < w && y >= 0 && y < h && ink(y * w + x)
    // column extent of the band
    var c0 = -1
    var c1 = -1
    var x = 0
    while (x < w) {
      var hit = false
      var y = bTop
      while (y <= bBot && !hit) { if (inked(x, y)) hit = true; y += 1 }
      if (hit) { if (c0 < 0) c0 = x; c1 = x }
      x += 1
    }
    if (c0 < 0) return ""
    // snap both anchors down onto the fixed-pitch grid
    val m = GlyphFont.Margin
    val x0 = m + math.max(0, (c0 - m) / GlyphFont.Advance) * GlyphFont.Advance
    val top = m + math.max(0, (bTop - m) / GlyphFont.LinePitch) * GlyphFont.LinePitch
    val sb = new StringBuilder
    var cell = x0
    while (cell <= c1) {
      // cell mask on the 5x7 grid anchored at (cell, top)
      var mask = 0L
      var bits = 0
      var r = 0
      while (r < GlyphFont.H) {
        var col = 0
        while (col < GlyphFont.W) {
          if (inked(cell + col, top + r) && top + r <= bBot) {
            mask |= 1L << (r * GlyphFont.W + col)
            bits += 1
          }
          col += 1
        }
        r += 1
      }
      if (bits == 0) sb.append(' ')
      else {
        var bestChar = '?'
        var bestDist = Int.MaxValue
        for ((ch, m) <- GlyphFont.masks) {
          val d = java.lang.Long.bitCount(mask ^ m)
          if (d < bestDist) { bestDist = d; bestChar = ch }
        }
        sb.append(bestChar)
      }
      cell += GlyphFont.Advance
    }
    // trailing blank cells cannot occur (loop stops at c1), but trailing spaces
    // from a final partial cell are trimmed to keep lines right-trimmed
    var end = sb.length
    while (end > 0 && sb.charAt(end - 1) == ' ') end -= 1
    sb.substring(0, end)
  }
}
