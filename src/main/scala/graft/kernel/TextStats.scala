package graft.kernel

/** Training-data pipeline kernels: token counting, quality scoring, language ID,
  * document fingerprinting, shingling, MinHash, SimHash — the text-analysis /
  * deduplication layer a 100 TB corpus pipeline needs on top of extraction
  * (builder brief; these extend SURVEY.md §2 as first-class operators).
  * All functions are pure and deterministic so the Spark UDFs and the
  * single-threaded oracle agree byte-for-byte.
  */
object TextStats {

  /** Whitespace tokenization (ASCII \s+, after trim); "" -> 0 tokens. */
  def tokensWs(text: String): Array[String] = {
    val t = text.trim
    if (t.isEmpty) Array.empty else t.split("""\s+""")
  }

  def tokenCountWs(text: String): Int = tokensWs(text).length

  /** BPE-ish regex tokenization: letter runs, digit runs, single other glyphs. */
  private val bpeIsh = java.util.regex.Pattern.compile("""[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]""")
  def tokenCountBpeIsh(text: String): Int = {
    val m = bpeIsh.matcher(text)
    var n = 0
    while (m.find()) n += 1
    n
  }

  private val StopwordsEn: Set[String] = Set(
    "the", "a", "an", "of", "to", "in", "and", "or", "is", "are", "was",
    "for", "on", "with", "as", "by", "at", "it", "that", "this", "be",
    "from", "but", "not", "have", "has")

  final case class Quality(
      nChars: Int, nTokens: Int, nPunct: Int, nStopwords: Int,
      meanTokenLen: Double, stopwordRatio: Double, punctRatio: Double) {
    /** Heuristic in-distribution score in [0,1]: longer, punctuated, stopword-
      * bearing text scores higher — the C4/Gopher-style length/stopword gates.
      */
    def score: Double = {
      val lenScore = math.min(1.0, nChars / 500.0)
      val stopScore = math.min(1.0, stopwordRatio * 5.0)
      val punctScore = math.min(1.0, punctRatio * 20.0)
      (lenScore + stopScore + punctScore) / 3.0
    }
  }

  def quality(text: String): Quality = {
    val toks = tokensWs(text)
    var punct = 0
    var i = 0
    while (i < text.length) {
      text.charAt(i) match {
        case '.' | ',' | '!' | '?' | ';' | ':' => punct += 1
        case _ =>
      }
      i += 1
    }
    val stop = toks.count(t => StopwordsEn.contains(Py.lower(t)))
    val nTok = toks.length
    Quality(
      nChars = text.length, nTokens = nTok, nPunct = punct, nStopwords = stop,
      meanTokenLen = if (nTok == 0) 0.0 else toks.map(_.length).sum.toDouble / nTok,
      stopwordRatio = if (nTok == 0) 0.0 else stop.toDouble / nTok,
      punctRatio = if (text.isEmpty) 0.0 else punct.toDouble / text.length)
  }

  /** Tiny stopword-profile language ID over {en,de,fr,es} + CJK-codepoint zh
    * detection; "und" when nothing scores. Deterministic tie-break: profile order.
    */
  private val LangProfiles: Vector[(String, Set[String])] = Vector(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr" -> Set("le", "la", "les", "et", "est", "des", "une", "dans", "que", "pour"),
    "es" -> Set("el", "la", "los", "las", "es", "una", "para", "con", "del", "por"))

  def langId(text: String): String = {
    var cjk = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c >= '一' && c <= '鿿') cjk += 1
      i += 1
    }
    if (cjk * 10 >= text.length && cjk > 0) return "zh"
    val toks = tokensWs(Py.lower(text))
    if (toks.isEmpty) return "und"
    var best = "und"
    var bestScore = 0
    for ((lang, words) <- LangProfiles) {
      val s = toks.count(words.contains)
      if (s > bestScore) { bestScore = s; best = lang }
    }
    best
  }

  /** Rolling polynomial fingerprint over UTF-8 bytes (Rabin-Karp style, base 257
    * in 64-bit wraparound, mixed). Public technique; stable across JVMs.
    */
  def fingerprint(text: String): Long = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = h * 257L + (bytes(i) & 0xffL); i += 1 }
    Hash64.mix(h)
  }

  /** [[fingerprint]] over raw UTF-8 bytes [off, off+len) — identical value
    * (the String form just encodes first). The Spark layer calls this with a
    * UTF8String's bytes so the hot path never decodes (Expressions.Fingerprint).
    */
  def fingerprintBytes(bytes: Array[Byte], off: Int, len: Int): Long = {
    var h = 1125899906842597L
    var i = off
    val end = off + len
    while (i < end) { h = h * 257L + (bytes(i) & 0xffL); i += 1 }
    Hash64.mix(h)
  }

  /** Word n-gram shingles (default n=3) as stable 64-bit hashes. Texts shorter
    * than n words yield a single whole-text shingle so Jaccard stays defined.
    */
  def shingles(text: String, n: Int = 3): Array[Long] = {
    val toks = tokensWs(Py.lower(text))
    if (toks.length < n) return Array(Hash64.ofString(toks.mkString(" ")))
    // hash each token once, then chain-mix the n token hashes per window —
    // no string is built per window (the dominant allocation in the round-1
    // profile). Identity is equivalent to hashing the space-joined n-gram:
    // tokens are space-free, so the join is injective, and equal windows
    // give equal chains while distinct windows collide only at hash odds.
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { th(i) = Hash64.ofString(toks(i)); i += 1 }
    val out = new Array[Long](toks.length - n + 1)
    i = 0
    while (i + n <= toks.length) {
      var h = 1125899906842597L
      var j = 0
      while (j < n) { h = Hash64.mix(h ^ th(i + j)); j += 1 }
      out(i) = h
      i += 1
    }
    out.distinct
  }

  /** MinHash signature: k permutations from a 2-independent family
    * h_j = h1 + j*h2 over 64-bit wraparound (the standard sketching trick —
    * e.g. Apache DataSketches' a*x+b rows): 2 mixes per shingle instead of
    * k, with the same pairwise-independence the Jaccard estimator needs.
    */
  def minHash(shingleHashes: Array[Long], k: Int = 64): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < shingleHashes.length) {
      val base = shingleHashes(i)
      val h1 = Hash64.mix(base)
      val h2 = Hash64.mix(base ^ 0x9e3779b97f4a7c15L) | 1L // odd => full-period
      var h = h1
      var j = 0
      while (j < k) {
        if (h < sig(j)) sig(j) = h
        h += h2
        j += 1
      }
      i += 1
    }
    sig
  }

  /** LSH band keys: signature split into `bands` bands of k/bands rows; each
    * band hashed to one bucket key. Docs sharing any band key are candidates.
    */
  def lshBands(sig: Array[Long], bands: Int = 16): Array[Long] = {
    val rows = sig.length / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = b.toLong * 0xc2b2ae3d27d4eb4fL
      var r = 0
      while (r < rows) { h = Hash64.mix(h ^ sig(b * rows + r)); r += 1 }
      out(b) = h
      b += 1
    }
    out
  }

  /** Estimated Jaccard from two MinHash signatures. */
  def minHashJaccard(a: Array[Long], b: Array[Long]): Double = {
    var same = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) same += 1; i += 1 }
    same.toDouble / a.length
  }

  /** Exact Jaccard over shingle-hash sets. */
  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val sa = a.toSet
    val sb = b.toSet
    val inter = sa.intersect(sb).size
    inter.toDouble / (sa.size + sb.size - inter)
  }

  /** 64-bit SimHash over whitespace tokens (unit weight per occurrence). */
  def simHash(text: String): Long = {
    val votes = new Array[Int](64)
    for (t <- tokensWs(Py.lower(text))) {
      val h = Hash64.ofString(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= 1L << b; b += 1 }
    out
  }

  def hammingDist(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Cosine similarity of two dense float vectors (0.0 when either is zero). */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i)
      na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i)
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Random-hyperplane LSH bucket for an embedding: sign bits of `nBits` seeded
    * pseudo-random hyperplane dot products (deterministic; no stored planes —
    * plane components derive from mix(seed, bit, dim) on the fly).
    */
  def embeddingLshBucket(v: Array[Float], nBits: Int = 12, seed: Long = 42L): Int = {
    var bucket = 0
    var b = 0
    while (b < nBits) {
      var dot = 0.0
      var i = 0
      while (i < v.length) {
        val h = Hash64.mix(seed ^ (b.toLong << 32) ^ i.toLong)
        // map to [-1, 1)
        val comp = (h >> 11).toDouble / (1L << 52).toDouble
        dot += comp * v(i)
        i += 1
      }
      if (dot >= 0) bucket |= 1 << b
      b += 1
    }
    bucket
  }

  /** Multi-probe bucket set for an embedding: the vector's own bucket plus
    * its `nBits` Hamming-1 neighbors (every single-hyperplane flip). Probing
    * all of them guarantees a candidate pair is found whenever the two
    * buckets differ in at most ONE hyperplane sign — the recall gap of a
    * single-bucket probe (a 0.9999-cosine pair can straddle one hyperplane).
    * Still O(1) buckets: nBits + 1 keys (13 at the default 12 bits).
    */
  def embeddingLshProbes(v: Array[Float], nBits: Int = 12, seed: Long = 42L): Array[Int] = {
    val own = embeddingLshBucket(v, nBits, seed)
    val out = new Array[Int](nBits + 1)
    out(0) = own
    var b = 0
    while (b < nBits) { out(b + 1) = own ^ (1 << b); b += 1 }
    out
  }
}
