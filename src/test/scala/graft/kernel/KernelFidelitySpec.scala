package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** CPython-anchored fidelity tests: every expected value below was produced by
  * running the reference's own functions (CPython stdlib / re / difflib) — the
  * Python-behavior anchors of SURVEY.md §7.4.1/§7.5.
  */
class PySpec extends AnyFunSuite {

  test("splitlines splits on all CPython boundaries, CRLF as one") {
    val s = "a\u001cb\u001dc\u001ed\u0085e f g\u000bh\u000ci\r\nj"
    assert(Py.splitLines(s) == Vector("a", "b", "c", "d", "e f g", "h", "i", "j"))
  }

  test("splitlines drops trailing empty, keeps interior empties") {
    assert(Py.splitLines("a\n\nb\n") == Vector("a", "", "b"))
    assert(Py.splitLines("") == Vector())
    assert(Py.splitLines("\n") == Vector(""))
  }

  test("strip removes whitespace like CPython") {
    assert(Py.strip("  x ") == "x")
    assert(Py.strip("\t Quality Motors 42 \u000b") == "Quality Motors 42")
  }

  test("rstrip strips a char set from the right only") {
    assert(Py.rstrip("Dealer Depot:\\", ":;\\") == "Dealer Depot")
    assert(Py.rstrip("Smith & Sons Auto;", ":;\\") == "Smith & Sons Auto")
    assert(Py.rstrip(";;a;;", ":;\\") == ";;a")
  }
}

class DifflibSpec extends AnyFunSuite {
  // expected values from CPython difflib.SequenceMatcher(None, a, b).ratio()
  val cases: Seq[(String, String, Double)] = Seq(
    ("1HGCM82633A004352", "1HGCM82633A004852", 0.9411764705882353),
    ("ABCDEF1234567", "ABCDEF1234567", 1.0),
    ("WDBRF40J43F472", "WDBRF40J43F472XYZ", 0.9032258064516129),
    ("KMHDU46D17U123456", "KMHDU46D17U654321", 0.7058823529411765),
    ("SHORT", "LONGERSTRINGHERE", 0.2857142857142857),
    ("A" * 150 + "B" * 100, "A" * 100 + "C" * 150, 0.4), // autojunk fires (len>=200)
    ("", "", 1.0),
    ("", "X", 0.0))

  test("ratio matches CPython difflib exactly") {
    for ((a, b, expected) <- cases)
      assert(math.abs(Difflib.ratio(a, b) - expected) < 1e-12,
        s"ratio(${a.take(20)}, ${b.take(20)})")
  }

  test("ratio is 1.0 on identical nonempty strings") {
    for (s <- Seq("X", "VIN1234567890123", "lorem ipsum dolor"))
      assert(Difflib.ratio(s, s) == 1.0)
  }
}

class SearchKernelsSpec extends AnyFunSuite {
  import SearchKernels._

  test("ocrVinNormalize folds O,Q->0 and I->1 after upper") {
    assert(ocrVinNormalize("oqi0OIL") == "0010 01L".replace(" ", ""))
    assert(ocrVinNormalize("1HGCM82633A") == "1HGCM82633A")
  }

  // expected lists generated with the reference's find_vin_candidates (search.py:31-43)
  test("findVinCandidates matches reference output including greedy tails") {
    assert(findVinCandidates("VIN: 1HGCM82633A004352 and more") ==
      Vector("1HGCM82633A004352ANDMR", "N1HGCM82633A004352ANDM"))
    assert(findVinCandidates("vin 2t1bu4ee9dc123456 lowercase") ==
      Vector("2T1BU4EE9DC123456LWERCA", "N2T1BU4EE9DC123456L"))
    assert(findVinCandidates("VIN: ABC-DEF GH123 4567 sep") ==
      Vector("ABCDEFGH1234567SEP", "NABCDEFGH1234567SEP"))
    assert(findVinCandidates("no vins here at all, too short: ABC123") ==
      Vector("SHEREATALLTSHRT"))
    assert(findVinCandidates("raw WDBRF40J43F472052 embedded plus VIN: KMHDU46D17U123456") ==
      Vector("KMHDU46D17U123456", "RAWWDBRF40J43F472052EMBEDDEDPLUSV", "NKMHDU46D17U123456"))
    assert(findVinCandidates("VIN: OQI0OIL1234567890 confusables") ==
      Vector("0L1234567890CNFUSA"))
    assert(findVinCandidates("the fast key order sort table scan merge part window") ==
      Vector("RTTABLESCANMERGEPARTW"))
  }

  test("numsAfterKeyword: per-line, exotic separators, min 6 digits, case-insensitive find") {
    val t = "Contract # 700123 ok\u000bClaim 55555 short\u000cCONTRACT: 888999 and 1234567\u001cclaim no 654321x"
    assert(numsAfterKeyword(t, "Contract") == Vector("700123", "888999", "1234567"))
    assert(numsAfterKeyword(t, "Claim") == Vector("654321"))
    // keyword found as substring ('precontract' contains 'contract')
    assert(numsAfterKeyword("precontract 123456 embedded", "Contract") == Vector("123456"))
    // boundary: exactly 6 digits kept, 5 dropped
    assert(numsAfterKeyword("Contract 12345 123456", "Contract") == Vector("123456"))
  }

  test("dealerClean: strip, rstrip(':;\\'), strip, drop trailing integer") {
    assert(dealerClean("  Quality Motors 42 ") == "Quality Motors")
    assert(dealerClean("Smith & Sons Auto;") == "Smith & Sons Auto")
    assert(dealerClean("src12 41") == "src12") // must NOT strip the 12 in src12
    assert(dealerClean("Dealer Depot:\\") == "Dealer Depot")
    assert(dealerClean("123456") == "")
    assert(dealerClean("Edge  7  ") == "Edge")
  }

  test("dealerCaptures over multi-line text (reference finditer semantics)") {
    val t = "Dealer: Quality Motors 42\nother\ndealer # Smith & Sons Auto; 9\nDEALER;  Third Guy  "
    assert(dealerCaptures(t) == Vector("Quality Motors", "Smith & Sons Auto;", "Third Guy"))
    assert(dealerHit(t, "quality motors"))
    assert(dealerHit(t, "SMITH & SONS"))
    assert(!dealerHit(t, "absent dealer"))
  }

  test("vinHit: exact normalized membership, else fuzzy >= 0.8 (search.py:146-156)") {
    val text = "VIN: KMHDU46D17U123456\nfiller line"
    assert(vinHit(text, "KMHDU46D17U123456"))
    assert(vinHit(text, "kmhdu46d17u123456")) // case-folded
    assert(!vinHit(text, "ZZZZZZZZZZZZZZZZZ"))
  }

  test("bestFuzzyMatch: strict > keeps first on ties; threshold boundary") {
    assert(bestFuzzyMatch("AB", Seq("AB", "AB")) == Some("AB"))
    assert(bestFuzzyMatch("ABCD", Seq("ABXX"), threshold = 0.5) == Some("ABXX"))
    assert(bestFuzzyMatch("ABCD", Seq("ABXX"), threshold = 0.51) == None)
  }

  test("normalizeParams: UI alias map, unknown keys and blanks dropped (search.py:89-101)") {
    val p = normalizeParams(Map(
      "Dealer Name" -> " Quality Motors ", "Contract #" -> "700123",
      "Search by Word" -> "needle", "Unknown Field" -> "x", "VIN" -> ""))
    assert(p == SearchParams(dealer = Some("Quality Motors"),
      contract = Some("700123"), any = Some("needle")))
    assert(normalizeParams(Map("nope" -> "y")).isEmpty)
  }

  test("docMatches: disjunction + param normalization") {
    val text = "Contract # 700123\nDealer: Quality Motors 42\nneedleTOKEN here"
    assert(docMatches(text, SearchParams(contract = Some("700123"))))
    assert(docMatches(text, SearchParams(any = Some("needleTOKEN"))))
    assert(!docMatches(text, SearchParams(any = Some("needletoken")))) // case-sensitive F6
    assert(docMatches(text, SearchParams(claim = Some("nope"), dealer = Some("quality"))))
    assert(!docMatches(text, SearchParams(claim = Some("999999"))))
    // reference quirk: whitespace-only survives the raw falsy check, strips to
    // "", and "" in all_text is always True (search.py:101,167)
    assert(SearchParams(any = Some("  ")).active == SearchParams(any = Some("")))
    assert(docMatches(text, SearchParams(any = Some("  "))))
    assert(!docMatches(text, SearchParams(contract = Some("  ")))) // "" never equals a number
  }
}
