package graft.kernel

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** E3/E4 — raster payloads and image preprocessing.
  *
  * The reference renders scanned PDF pages to RGB pixmaps (`extractor.py:46-53`,
  * DPI=100), converts to grayscale and Otsu-binarizes (`extractor.py:40-43`,
  * `cv2.cvtColor(RGB2GRAY)` + `cv2.threshold(..., THRESH_BINARY|THRESH_OTSU)`).
  * Here scanned fixture pages *are* bitmaps already (no renderer in-sandbox), in
  * this format:
  * {{{ magic "GRAS" | byte channels (1|3) | int32 w | int32 h | w*h*channels bytes }}}
  * Grayscale conversion uses the same fixed-point BT.601 luma OpenCV uses; Otsu
  * maximizes between-class variance over a 256-bin histogram (first maximum wins).
  */
object Raster {

  val Magic: Array[Byte] = "GRAS".getBytes(StandardCharsets.US_ASCII)

  final case class Gray(w: Int, h: Int, px: Array[Byte]) {
    @inline def apply(x: Int, y: Int): Int = px(y * w + x) & 0xff
  }

  def hasMagic(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 4 &&
      bytes(0) == 'G' && bytes(1) == 'R' && bytes(2) == 'A' && bytes(3) == 'S'

  /** Decode to grayscale; throws on malformed input. */
  def decodeGray(bytes: Array[Byte]): Gray = {
    require(hasMagic(bytes), "bad magic")
    val bb = ByteBuffer.wrap(bytes, 4, bytes.length - 4)
    val channels = bb.get().toInt
    require(channels == 1 || channels == 3, s"bad channels $channels")
    val w = bb.getInt
    val h = bb.getInt
    require(w > 0 && h > 0 && w.toLong * h * channels == bb.remaining().toLong,
      s"bad dims ${w}x$h/$channels for ${bb.remaining()} bytes")
    val px = new Array[Byte](w * h)
    if (channels == 1) bb.get(px)
    else {
      var i = 0
      while (i < w * h) {
        val r = bb.get() & 0xff
        val g = bb.get() & 0xff
        val b = bb.get() & 0xff
        // cv2 RGB2GRAY fixed-point BT.601: (19595R + 38470G + 7471B + 2^15) >> 16
        px(i) = ((19595 * r + 38470 * g + 7471 * b + 32768) >> 16).toByte
        i += 1
      }
    }
    Gray(w, h, px)
  }

  /** Otsu threshold over the gray histogram: argmax of between-class variance,
    * first maximum wins (`extractor.py:43`). Binarization downstream treats
    * value > t as background (255) and value <= t as ink (0) — THRESH_BINARY.
    */
  def otsuThreshold(g: Gray): Int = {
    val hist = new Array[Long](256)
    var i = 0
    while (i < g.px.length) { hist(g.px(i) & 0xff) += 1; i += 1 }
    val total = g.px.length.toLong
    var sumAll = 0.0
    i = 0
    while (i < 256) { sumAll += i.toDouble * hist(i); i += 1 }
    var wB = 0L
    var sumB = 0.0
    var best = 0.0
    var bestT = 0
    var t = 0
    while (t < 256) {
      wB += hist(t)
      if (wB != 0L && wB != total) {
        sumB += t.toDouble * hist(t)
        val wF = total - wB
        val mB = sumB / wB
        val mF = (sumAll - sumB) / wF
        val between = wB.toDouble * wF.toDouble * (mB - mF) * (mB - mF)
        if (between > best) { best = between; bestT = t }
      } else if (wB != 0L) sumB += t.toDouble * hist(t)
      t += 1
    }
    bestT
  }

  /** Ink mask after Otsu binarization: true where pixel <= threshold. */
  def binarizeInk(g: Gray): Array[Boolean] = {
    val t = otsuThreshold(g)
    val ink = new Array[Boolean](g.px.length)
    var i = 0
    while (i < g.px.length) { ink(i) = (g.px(i) & 0xff) <= t; i += 1 }
    ink
  }

  // ---- multimodal feature ops (training-data pipeline: decode / resize /
  //      crop over opaque binary columns; the Spark side keeps these in
  //      mapPartitions/UDFs over BinaryType — schema and batching are real,
  //      per the builder brief) ----

  /** Box-mean downsample by integer factor (floor dims; factor >= 1). */
  def downsample(g: Gray, factor: Int): Gray = {
    require(factor >= 1, "factor must be >= 1")
    if (factor == 1) return g
    val w2 = math.max(1, g.w / factor)
    val h2 = math.max(1, g.h / factor)
    val out = new Array[Byte](w2 * h2)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        var sum = 0
        var n = 0
        var dy = 0
        while (dy < factor) {
          var dx = 0
          while (dx < factor) {
            val sx = x * factor + dx
            val sy = y * factor + dy
            if (sx < g.w && sy < g.h) { sum += g(sx, sy); n += 1 }
            dx += 1
          }
          dy += 1
        }
        out(y * w2 + x) = (sum / n).toByte
        x += 1
      }
      y += 1
    }
    Gray(w2, h2, out)
  }

  /** Crop to the intersection of the requested window and the image. */
  def crop(g: Gray, x0: Int, y0: Int, w: Int, h: Int): Gray = {
    val cx = math.max(0, x0)
    val cy = math.max(0, y0)
    val cw = math.max(0, math.min(g.w - cx, w))
    val ch = math.max(0, math.min(g.h - cy, h))
    val out = new Array[Byte](cw * ch)
    var y = 0
    while (y < ch) {
      System.arraycopy(g.px, (cy + y) * g.w + cx, out, y * cw, cw)
      y += 1
    }
    Gray(cw, ch, out)
  }

  /** Mean pixel value (simple feature-extract; 0.0 for empty). */
  def meanPixel(g: Gray): Double = {
    if (g.px.isEmpty) return 0.0
    var sum = 0L
    var i = 0
    while (i < g.px.length) { sum += g.px(i) & 0xff; i += 1 }
    sum.toDouble / g.px.length
  }

  // ---- writer (fixture/synth side) ----

  def writeGray(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
    require(px.length == w * h)
    val bb = ByteBuffer.allocate(4 + 1 + 8 + px.length)
    bb.put(Magic); bb.put(1.toByte); bb.putInt(w); bb.putInt(h); bb.put(px)
    bb.array()
  }

  def writeRgb(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
    require(px.length == w * h * 3)
    val bb = ByteBuffer.allocate(4 + 1 + 8 + px.length)
    bb.put(Magic); bb.put(3.toByte); bb.putInt(w); bb.putInt(h); bb.put(px)
    bb.array()
  }
}
