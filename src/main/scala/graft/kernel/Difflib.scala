package graft.kernel

import scala.collection.mutable

/** CPython `difflib.SequenceMatcher.ratio()` reimplemented exactly
  * (Ratcliff–Obershelp with the stdlib's b2j/autojunk behavior).
  *
  * The reference uses `SequenceMatcher(None, target, cand).ratio()` for fuzzy VIN
  * matching (`/root/reference/app/services/search.py:62`) with thresholds 0.8
  * (search.py:153) / 0.6 default (search.py:58). The built-in Spark `levenshtein`
  * is a different metric and would change match sets, so we port the exact
  * algorithm: recursive longest-matching-block, junk-aware extension, and the
  * autojunk "popular element" rule (elements occurring > n/100+1 times when
  * len(b) >= 200 are excluded from match seeding). `isjunk` is None at every
  * reference call site, so `bjunk` is always empty here.
  */
object Difflib {

  /** ratio() = 2*M / (len(a)+len(b)); 1.0 when both empty. */
  def ratio(a: String, b: String): Double = {
    val total = a.length + b.length
    if (total == 0) return 1.0
    2.0 * totalMatches(a, b) / total
  }

  /** Sum of matching-block sizes from get_matching_blocks() (merge step does not
    * change the sum, so the queue recursion alone suffices).
    */
  private def totalMatches(a: String, b: String): Int = {
    // __chain_b: b2j minus autojunk-popular elements (difflib.py SequenceMatcher.__chain_b)
    val b2j = mutable.HashMap.empty[Char, mutable.ArrayBuffer[Int]]
    var j = 0
    while (j < b.length) {
      b2j.getOrElseUpdate(b.charAt(j), mutable.ArrayBuffer.empty[Int]) += j
      j += 1
    }
    if (b.length >= 200) {
      val ntest = b.length / 100 + 1
      val popular = b2j.iterator.collect { case (c, idxs) if idxs.length > ntest => c }.toList
      popular.foreach(b2j.remove)
    }

    // find_longest_match with empty bjunk (isjunk=None at all reference call sites)
    def findLongest(alo: Int, ahi: Int, blo: Int, bhi: Int): (Int, Int, Int) = {
      var besti = alo
      var bestj = blo
      var bestsize = 0
      var j2len = mutable.HashMap.empty[Int, Int]
      var i = alo
      while (i < ahi) {
        val newj2len = mutable.HashMap.empty[Int, Int]
        b2j.get(a.charAt(i)) match {
          case Some(idxs) =>
            var p = 0
            var break = false
            while (p < idxs.length && !break) {
              val jj = idxs(p)
              if (jj < blo) ()
              else if (jj >= bhi) break = true
              else {
                val k = j2len.getOrElse(jj - 1, 0) + 1
                newj2len(jj) = k
                if (k > bestsize) { besti = i - k + 1; bestj = jj - k + 1; bestsize = k }
              }
              p += 1
            }
          case None =>
        }
        j2len = newj2len
        i += 1
      }
      // bjunk is empty, so only the non-junk extension loops apply
      while (besti > alo && bestj > blo && a.charAt(besti - 1) == b.charAt(bestj - 1)) {
        besti -= 1; bestj -= 1; bestsize += 1
      }
      while (besti + bestsize < ahi && bestj + bestsize < bhi &&
        a.charAt(besti + bestsize) == b.charAt(bestj + bestsize)) {
        bestsize += 1
      }
      (besti, bestj, bestsize)
    }

    var matches = 0
    val queue = mutable.Stack[(Int, Int, Int, Int)]((0, a.length, 0, b.length))
    while (queue.nonEmpty) {
      val (alo, ahi, blo, bhi) = queue.pop()
      val (i, jj, k) = findLongest(alo, ahi, blo, bhi)
      if (k > 0) {
        matches += k
        if (alo < i && blo < jj) queue.push((alo, i, blo, jj))
        if (i + k < ahi && jj + k < bhi) queue.push((i + k, ahi, jj + k, bhi))
      }
    }
    matches
  }
}
