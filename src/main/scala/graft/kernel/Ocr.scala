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
    val bands = Vector.newBuilder[(Int, Int)] // [top, bottom] inclusive
    var top = -1
    y = 0
    while (y < h) {
      if (rowInk(y) > 0) { if (top < 0) top = y }
      else if (top >= 0) { bands += ((top, y - 1)); top = -1 }
      y += 1
    }
    if (top >= 0) bands += ((top, h - 1))

    val lines = bands.result().map { case (bTop, bBot) =>
      decodeBand(ink, w, bTop, bBot)
    }
    if (lines.isEmpty) "" else lines.mkString("", "\n", "\n")
  }

  /** Decode one line band assuming the font's fixed pitch: cells every
    * GlyphFont.Advance columns starting at the band's first inked column.
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
    val sb = new StringBuilder
    var cell = c0
    while (cell <= c1) {
      // cell mask on the 5x7 grid anchored at (cell, bTop)
      var mask = 0L
      var bits = 0
      var r = 0
      while (r < GlyphFont.H) {
        var col = 0
        while (col < GlyphFont.W) {
          if (inked(cell + col, bTop + r) && bTop + r <= bBot) {
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
