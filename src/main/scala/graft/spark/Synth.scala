package graft.spark

import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import graft.kernel._

/** Deterministic page/payload synthesizer (fixed seed, no wall-clock,
  * no external data — FIXTURES.md §1).
  *
  * Two producers share the same payload builders:
  *   - [[pagesFromDocuments]]: maps the driver testdata `documents` table into a
  *     `pages` table whose payload kind is a pure function of doc_id, so every
  *     SQL-checked extraction query has a DuckDB-expressible oracle;
  *   - [[corpus]]: a self-contained fixture corpus with planted
  *     VIN/Contract/Claim/Dealer tokens, malformed HTML, noisy scanned pages,
  *     and corrupt payloads for the byte-identity ScalaTest suites.
  */
object Synth {

  final val Epoch = 1704067200000L // 2024-01-01T00:00:00Z, fixed

  // ---- doc_id -> payload-kind partitioning (the x05 oracle mirrors this) ----
  // m = doc_id % 20: 0..12 html | 13 text passthrough | 14..16 pdf (digital iff
  // embedded text > 50 chars) | 17 raster | 18 scanned pdf | 19 corrupt
  def kindSlot(docId: Long): Int = (docId % 20).toInt

  /** First up-to-8 words of upper(text) — the scanned-page line; expressible in
    * both Spark SQL and DuckDB for the x04 oracle.
    */
  def scanLine(text: String): String =
    text.trim.split(" ").iterator.filter(_.nonEmpty).take(8).mkString(" ").toUpperCase(java.util.Locale.ROOT)

  /** Escape the three HTML metacharacters (round-trips through
    * HtmlExtract.decodeEntities).
    */
  def escapeHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Common-Crawl-ish HTML document: head/nav/header/footer/aside boilerplate,
    * a link-farm block (high link density), one main-content block carrying
    * `text`, script/style/comment noise.
    */
  def buildHtml(docId: Long, text: String): Array[Byte] = {
    val sb = new StringBuilder(text.length + 700)
    sb.append("<!DOCTYPE html>\n<html>\n<head>\n<title>Document ").append(docId)
      .append("</title>\n<style>body { color: #222; }</style>\n")
      .append("<script>var tracker = ").append(docId).append(";</script>\n</head>\n<body>\n")
    sb.append("<header><h1>Site ").append(docId % 7).append(" header banner</h1></header>\n")
    sb.append("<nav><ul>")
    for (i <- 0 until 6)
      sb.append("<li><a href=\"/section").append(i).append("\">Section link number ").append(i).append("</a></li>")
    sb.append("</ul></nav>\n")
    // link-farm block outside ignore zones: must be dropped by link density
    sb.append("<div class=\"related\">")
    for (i <- 0 until 5)
      sb.append("<a href=\"/rel").append(i).append("\">related article teaser link ").append(i).append("</a> ")
    sb.append("</div>\n")
    sb.append("<!-- boilerplate ends, content begins -->\n")
    sb.append("<article><p>").append(escapeHtml(text)).append("</p></article>\n")
    sb.append("<aside>Advertisement: buy the thing now, limited stock available today.</aside>\n")
    sb.append("<footer>Copyright ").append(2020 + docId % 5).append(" example corp. All rights reserved.</footer>\n")
    sb.append("</body>\n</html>\n")
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  /** Digital-PDF-lite: words laid out 8 per line, 6 lines per page, run order
    * shuffled per-page by a seeded permutation (the layout parser must reorder
    * geometrically — SURVEY.md §2.2 E2).
    */
  def buildPdfDigital(docId: Long, text: String): Array[Byte] = {
    val words = text.trim.split(" ").filter(_.nonEmpty)
    val perLine = 8
    val linesPerPage = 6
    val lines = words.grouped(perLine).toVector
    val pageChunks = lines.grouped(linesPerPage).toVector
    val pages = pageChunks.zipWithIndex.map { case (chunk, pi) =>
      val runs = Vector.newBuilder[PdfLite.Run]
      for ((line, li) <- chunk.zipWithIndex; (w, wi) <- line.zipWithIndex)
        runs += PdfLite.Run(x = wi * 80, y = li * 12, text = w)
      val shuffled = deterministicShuffle(runs.result(), Hash64.mix(docId * 31 + pi))
      PdfLite.Page(shuffled, raster = None)
    }
    PdfLite.write(PdfLite.Doc(pages))
  }

  /** Scanned PDF: embedded text far below the 50-char digital threshold
    * (extractor.py:22) so the sniffer must route to OCR; one raster page
    * rendering `scanLine(text)`.
    */
  def buildPdfScanned(docId: Long, text: String, noise: Boolean): Array[Byte] = {
    val stub = PdfLite.Run(0, 0, "SCAN") // 4 chars + newline: always <= 50
    val raster = GlyphFont.render(Seq(scanLine(text)), seed = Hash64.mix(docId), noise = noise)
    PdfLite.write(PdfLite.Doc(Vector(PdfLite.Page(Vector(stub), Some(raster)))))
  }

  /** Bare raster page (scanned bitmap without a PDF wrapper). */
  def buildRaster(docId: Long, text: String, noise: Boolean): Array[Byte] =
    GlyphFont.render(Seq(scanLine(text)), seed = Hash64.mix(docId * 7 + 1), noise = noise)

  /** Corrupt payloads, tolerated as kind=empty (extraction_errors.log:3-11). */
  def buildCorrupt(docId: Long): Array[Byte] = (docId % 3) match {
    case 0 => Array.emptyByteArray
    case 1 => "%GPD".getBytes(StandardCharsets.US_ASCII) // truncated magic
    case _ =>
      val rng = new Array[Byte](64)
      var h = Hash64.mix(docId)
      for (i <- rng.indices) { h = Hash64.mix(h); rng(i) = h.toByte }
      // pin the first byte so the payload can NEVER sniff as another format:
      // a random '<' (or whitespace then '<') would classify as kind=html and
      // break the oracles that hardcode kind=empty for this slot (first
      // colliding doc_id is 12419 — beyond current testdata, not beyond sf1)
      rng(0) = 0xFF.toByte
      rng
  }

  def deterministicShuffle[T](xs: Vector[T], seed: Long): Vector[T] = {
    val arr = xs.toArray[Any]
    var h = seed
    var i = arr.length - 1
    while (i > 0) {
      h = Hash64.mix(h)
      val j = ((h & Long.MaxValue) % (i + 1)).toInt
      val tmp = arr(i); arr(i) = arr(j); arr(j) = tmp
      i -= 1
    }
    arr.toVector.asInstanceOf[Vector[T]]
  }

  // ---- Zipf-skewed host assignment (FIXTURES.md §1: salting must be exercised) ----

  final val NumHosts = 100
  private val zipfCdf: Array[Double] = {
    val weights = (1 to NumHosts).map(r => 1.0 / math.pow(r, 1.2)).toArray
    val total = weights.sum
    val cdf = new Array[Double](NumHosts)
    var acc = 0.0
    for (i <- weights.indices) { acc += weights(i) / total; cdf(i) = acc }
    cdf
  }

  def hostFor(docId: Long): Int = {
    val u = ((Hash64.mix(docId) >>> 11).toDouble / (1L << 53).toDouble)
    val idx = java.util.Arrays.binarySearch(zipfCdf, u)
    val h = if (idx >= 0) idx else -idx - 1
    math.min(h, NumHosts - 1)
  }

  def urlFor(docId: Long): String =
    s"https://host${hostFor(docId)}.example.com/doc/$docId"

  /** One page row from a documents-table row (kind decided by doc_id). */
  def pageFromDocument(docId: Long, text: String, lang: String): Schemas.Page = {
    val m = kindSlot(docId)
    val (html, textCol): (Array[Byte], String) =
      if (m <= 12) (buildHtml(docId, text), null)
      else if (m == 13) (null, text) // pre-extracted cache-hit path
      else if (m <= 16) (buildPdfDigital(docId, text), null)
      else if (m == 17) (buildRaster(docId, text, noise = true), null)
      else if (m == 18) (buildPdfScanned(docId, text, noise = true), null)
      else (buildCorrupt(docId), null)
    Schemas.Page(urlFor(docId), new Timestamp(Epoch + docId * 1000L), html, textCol, lang)
  }

  /** `pages` DataFrame derived deterministically from the driver `documents`
    * table (TESTDATA.md; schemas verified in FIXTURES.md §3).
    */
  def pagesFromDocuments(spark: org.apache.spark.sql.SparkSession, sfDir: String)
      : org.apache.spark.sql.Dataset[Schemas.Page] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang")
      .as[(Long, String, String)]
      .map { case (id, text, lang) => pageFromDocument(id, text, lang) }
  }

  // ---- self-contained fixture corpus for the ScalaTest suites ----

  private val FixtureWords = Vector(
    "spark", "query", "table", "merge", "filter", "window", "batch", "stream",
    "column", "vector", "join", "order", "claim", "policy", "engine", "data")

  def fixtureText(docId: Long): String = {
    var h = Hash64.mix(docId * 1013L)
    val n = 30 + (math.abs(h) % 40).toInt
    val sb = new StringBuilder
    for (i <- 0 until n) {
      h = Hash64.mix(h)
      if (i > 0) sb.append(' ')
      sb.append(FixtureWords((math.abs(h) % FixtureWords.length).toInt))
    }
    sb.toString
  }

  /** Planted search tokens per doc (FIXTURES.md §1); pure so tests know the
    * expected match sets.
    */
  def plantedTokens(docId: Long): String = (docId % 7) match {
    case 0 => s"\nVIN: 1HGCM82633A${100000 + docId % 900000}\nDealer: Quality Motors ${docId % 100}\n"
    case 1 => s"\nContract # ${700000 + docId}\nterms apply\n"
    case 2 => s"\nClaim number ${810000 + docId} filed\n"
    case 3 => "\nDealer: Smith & Sons Auto;\nplain line\n"
    case 4 => s"\nvin 2T1BU4EE9DC${100000 + docId % 900000} listed\n" // lowercase keyword
    case 5 => "\nneedleTOKEN appears here\n"
    case _ => ""
  }

  /** Fixture corpus: html-heavy with every payload kind, planted tokens, and a
    * Zipf host distribution. Pure Seq — tests parallelize it themselves.
    */
  def corpus(n: Int): Seq[Schemas.Page] = (0 until n).map { i =>
    val docId = i.toLong
    val text = fixtureText(docId) + plantedTokens(docId)
    pageFromDocument(docId, text, lang = "en")
  }

  /** Single-threaded oracle (SURVEY.md §5.1): the same kernels called
    * sequentially — expected output for byte-identity comparison.
    */
  def oracleExtract(pages: Seq[Schemas.Page]): Map[String, Extract.Result] =
    pages.iterator.map(p => p.url -> Extract.extract(p.html, p.text)).toMap
}
