package graft.kernel

import java.util.regex.Pattern

/** The reference's field-search kernels, Python-semantics-faithful.
  *
  * Sources (all in `/root/reference/app/services/search.py`):
  *   - F1 `ocr_vin_normalize`            search.py:23-29
  *   - F2 `find_vin_candidates`          search.py:31-43
  *   - F3 `extract_numeric_after_keyword` search.py:45-56
  *   - F4 `get_best_fuzzy_match`         search.py:58-68
  *   - F5 Dealer field extract/match     search.py:12-14,157-165
  *   - F6 substring search (case-sensitive) search.py:166-169
  *   - F7 `search_claim_documents` per-doc disjunctive predicate search.py:84-190
  *
  * All regexes compile with UNICODE_CHARACTER_CLASS to track CPython `re`'s
  * Unicode-by-default \s/\w/\d classes. Fidelity anchors (SURVEY.md §7.5):
  * VIN_MIN_LENGTH=13, min_digits=6, fuzzy 0.8/0.6, VIN alphabet [A-HJ-NPR-Z0-9].
  */
object SearchKernels {

  final val VinMinLength = 13 // search.py:10

  private val U = Pattern.UNICODE_CHARACTER_CLASS

  // search.py:33 — applied to text.upper()
  private val vinLinePat = Pattern.compile("""VIN[:\s]*([A-Z0-9\W]{13,25})""", U)
  // search.py:38
  private val vinRawPat = Pattern.compile("""([A-HJ-NPR-Z0-9][A-HJ-NPR-Z0-9\W]{12,})""", U)
  // search.py:35,40,146
  private val nonVinAlphabet = Pattern.compile("""[^A-HJ-NPR-Z0-9]""", U)
  // search.py:53
  private val digitRunPat = Pattern.compile("""\d+""", U)
  // search.py:12-14,158 — IGNORECASE over the raw (non-uppercased) text
  private val dealerPat = Pattern.compile(
    """dealer[:;\s#]*([^\n\r]+)""",
    Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE | U)
  // search.py:161
  private val trailingIntPat = Pattern.compile("""\s*\d+\s*$""", U)

  private def findAllGroup1(p: Pattern, s: String): Vector[String] = {
    val m = p.matcher(s)
    val out = Vector.newBuilder[String]
    while (m.find()) out += m.group(1)
    out.result()
  }

  /** F1: uppercase then fold OCR confusions O->0, Q->0, I->1 (search.py:23-29). */
  def ocrVinNormalize(s: String): String = {
    val up = Py.upper(s)
    val sb = new StringBuilder(up.length)
    var i = 0
    while (i < up.length) {
      up.charAt(i) match {
        case 'O' | 'Q' => sb.append('0')
        case 'I'       => sb.append('1')
        case c         => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** F2: two regex passes over text.upper(), strip to VIN alphabet, keep len>=13,
    * order-preserving dedup across the two passes (search.py:31-43).
    */
  def findVinCandidates(text: String): Vector[String] = {
    val up = Py.upper(text)
    val out = Vector.newBuilder[String]
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    for (raw <- findAllGroup1(vinLinePat, up)) {
      val normalized = nonVinAlphabet.matcher(raw).replaceAll("")
      if (normalized.length >= VinMinLength) { out += normalized; seen += normalized }
    }
    for (raw <- findAllGroup1(vinRawPat, up)) {
      val normalized = nonVinAlphabet.matcher(raw).replaceAll("")
      if (normalized.length >= VinMinLength && !seen.contains(normalized)) {
        out += normalized; seen += normalized
      }
    }
    out.result()
  }

  /** F3: per Python-splitlines line, case-insensitive find of keyword, digits runs
    * with length >= minDigits in the substring after the first occurrence
    * (search.py:45-56).
    */
  def numsAfterKeyword(text: String, keyword: String, minDigits: Int = 6): Vector[String] = {
    val kwLower = Py.lower(keyword)
    val out = Vector.newBuilder[String]
    for (line <- Py.splitLines(text)) {
      val lineLower = Py.lower(line)
      val idx = lineLower.indexOf(kwLower)
      if (idx >= 0) {
        val after = line.substring(math.min(idx + keyword.length, line.length))
        val m = digitRunPat.matcher(after)
        while (m.find()) {
          val num = m.group()
          if (num.length >= minDigits) out += num
        }
      }
    }
    out.result()
  }

  /** F4: argmax SequenceMatcher.ratio over candidates; ties keep the first
    * (strict `>`); Some(best) iff best ratio >= threshold (search.py:58-68).
    */
  def bestFuzzyMatch(target: String, candidates: Seq[String], threshold: Double = 0.6): Option[String] = {
    var bestRatio = 0.0
    var best: Option[String] = None
    for (cand <- candidates) {
      val r = Difflib.ratio(target, cand)
      if (r > bestRatio) { bestRatio = r; best = Some(cand) }
    }
    if (bestRatio >= threshold) best else None
  }

  /** F5 capture cleanup: strip, rstrip(":;\\"), strip, drop trailing integer
    * (search.py:160-161).
    */
  def dealerClean(captured: String): String = {
    val v = Py.strip(Py.rstrip(Py.strip(captured), ":;\\"))
    trailingIntPat.matcher(v).replaceAll("")
  }

  /** F5: dealer-field hit — any cleaned `dealer:`-line capture containing the
    * query case-insensitively (search.py:157-165).
    */
  def dealerHit(text: String, value: String): Boolean = {
    val m = dealerPat.matcher(text)
    val valueLower = Py.lower(value)
    while (m.find()) {
      val clean = dealerClean(m.group(1))
      if (Py.lower(clean).contains(valueLower)) return true
    }
    false
  }

  /** All cleaned dealer captures, for relational exposure (search.py:157-161). */
  def dealerCaptures(text: String): Vector[String] =
    findAllGroup1(dealerPat, text).map(dealerClean)

  /** Search parameters after field_map normalization (search.py:89-101). */
  final case class SearchParams(
      dealer: Option[String] = None,
      vin: Option[String] = None,
      contract: Option[String] = None,
      claim: Option[String] = None,
      any: Option[String] = None) {
    /** Mirrors `active_fields` — values stripped (search.py:101). The falsy
      * check happens on the RAW value (`if v`), so a whitespace-only param
      * strips to "" but stays active — reproducing the reference quirk where
      * an all-blank searchbyany/Dealer value matches every document
      * (`"" in all_text` is always True). [[normalizeParams]] applies the
      * raw-stage falsy filter.
      */
    def active: SearchParams = {
      def n(o: Option[String]) = o.map(Py.strip)
      SearchParams(n(dealer), n(vin), n(contract), n(claim), n(any))
    }
    def isEmpty: Boolean =
      dealer.isEmpty && vin.isEmpty && contract.isEmpty && claim.isEmpty && any.isEmpty
  }

  /** The UI-alias field map (search.py:89-99): raw request keys -> canonical
    * fields; unknown keys dropped, empty/blank values dropped (search.py:101).
    */
  def normalizeParams(raw: Map[String, String]): SearchParams = {
    val fieldMap = Map(
      "Dealer Name" -> "Dealer", "Dealer" -> "Dealer",
      "VIN" -> "VIN",
      "Contract #" -> "Contract", "Contract" -> "Contract",
      "Claim #" -> "Claim", "Claim" -> "Claim",
      "Search by Word" -> "searchbyany", "searchbyany" -> "searchbyany")
    val active = raw.collect {
      case (k, v) if v != null && v.nonEmpty && fieldMap.contains(k) =>
        fieldMap(k) -> Py.strip(v)
    }
    SearchParams(
      dealer = active.get("Dealer"),
      vin = active.get("VIN"),
      contract = active.get("Contract"),
      claim = active.get("Claim"),
      any = active.get("searchbyany"))
  }

  /** Contract/Claim hit: exact membership of the stripped extracted number
    * (search.py:136-144 — note the reference strips the *extracted* number,
    * `num.strip() == value`, not the query value).
    */
  def keywordNumberHit(text: String, keyword: String, value: String): Boolean =
    numsAfterKeyword(text, keyword, minDigits = 6).exists(n => Py.strip(n) == value)

  /** VIN hit: exact membership of the normalized param in normalized candidates,
    * else fuzzy >= 0.8 (search.py:146-156).
    */
  def vinHit(text: String, value: String): Boolean = {
    val paramNorm = ocrVinNormalize(nonVinAlphabet.matcher(Py.upper(value)).replaceAll(""))
    val candidates = findVinCandidates(text).map(ocrVinNormalize)
    candidates.contains(paramNorm) ||
      bestFuzzyMatch(paramNorm, candidates, threshold = 0.8).isDefined
  }

  /** F7: the per-document disjunctive predicate — logically identical to the
    * reference's field loop with `break` on first hit (search.py:133-172);
    * boolean OR short-circuits exactly like the break.
    */
  def docMatches(text: String, params: SearchParams): Boolean = {
    val p = params.active
    p.contract.exists(v => keywordNumberHit(text, "Contract", v)) ||
      p.claim.exists(v => keywordNumberHit(text, "Claim", v)) ||
      p.vin.exists(v => vinHit(text, v)) ||
      p.dealer.exists(v => dealerHit(text, v)) ||
      p.any.exists(v => text.contains(v))
  }
}
