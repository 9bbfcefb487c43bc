package graft.functions

import scala.collection.mutable

/** CPython `difflib.SequenceMatcher(None, a, b).ratio()` over characters,
  * bit-matched to the stdlib implementation the reference's SOLR validator
  * uses for its fuzzy string compare (adsmp/validate.py:215-222,
  * `SequenceMatcher(None, f1, f2).ratio() < 0.8`).
  *
  * Faithful details that matter for parity:
  *   - Ratcliff–Obershelp: recursive longest-matching-block decomposition,
  *     ratio = 2·M / (|a|+|b|) with M the summed block lengths.
  *   - difflib's `autojunk`: when |b| ≥ 200, characters occupying more than
  *     1% of `b` are dropped from the match-seeding index (they can still
  *     extend a found block). This changes ratios on long abstracts/bodies,
  *     so it is implemented, not skipped.
  *   - Tie-breaking: strictly-longer blocks win, so the earliest maximal
  *     block is kept, as in difflib's `find_longest_match`.
  */
object SequenceRatio {

  def ratio(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la + lb == 0) return 1.0

    // difflib __chain_b: index of b positions per char, minus "popular"
    // chars when autojunk engages (|b| >= 200, count > |b|/100 + 1)
    val b2j = mutable.HashMap.empty[Char, mutable.ArrayBuffer[Int]]
    var j = 0
    while (j < lb) {
      b2j.getOrElseUpdate(b.charAt(j), mutable.ArrayBuffer.empty[Int]) += j
      j += 1
    }
    if (lb >= 200) {
      val ntest = lb / 100 + 1
      val popular = b2j.collect { case (c, idxs) if idxs.length > ntest => c }
      popular.foreach(b2j.remove)
    }

    var matches = 0L
    val queue = mutable.Stack((0, la, 0, lb))
    while (queue.nonEmpty) {
      val (alo, ahi, blo, bhi) = queue.pop()
      val (bi, bj, bsize) = findLongestMatch(a, b, b2j, alo, ahi, blo, bhi)
      if (bsize > 0) {
        matches += bsize
        if (alo < bi && blo < bj) queue.push((alo, bi, blo, bj))
        if (bi + bsize < ahi && bj + bsize < bhi)
          queue.push((bi + bsize, ahi, bj + bsize, bhi))
      }
    }
    2.0 * matches / (la + lb)
  }

  /** difflib find_longest_match with an empty isjunk set: dynamic-programming
    * sweep seeded from the (possibly autojunk-pruned) b index, then extension
    * over any equal characters (popular chars are not "junk" for extension). */
  private def findLongestMatch(
      a: String, b: String,
      b2j: mutable.HashMap[Char, mutable.ArrayBuffer[Int]],
      alo: Int, ahi: Int, blo: Int, bhi: Int): (Int, Int, Int) = {
    var besti = alo
    var bestj = blo
    var bestsize = 0
    var j2len = mutable.HashMap.empty[Int, Int]
    var i = alo
    while (i < ahi) {
      val newj2len = mutable.HashMap.empty[Int, Int]
      b2j.get(a.charAt(i)).foreach { idxs =>
        var p = 0
        var done = false
        while (p < idxs.length && !done) {
          val jj = idxs(p)
          if (jj >= bhi) done = true // indices ascend: difflib's break
          else if (jj >= blo) {
            val k = j2len.getOrElse(jj - 1, 0) + 1
            newj2len(jj) = k
            if (k > bestsize) { besti = i - k + 1; bestj = jj - k + 1; bestsize = k }
          }
          p += 1
        }
      }
      j2len = newj2len
      i += 1
    }
    while (besti > alo && bestj > blo && a.charAt(besti - 1) == b.charAt(bestj - 1)) {
      besti -= 1; bestj -= 1; bestsize += 1
    }
    while (besti + bestsize < ahi && bestj + bestsize < bhi &&
        a.charAt(besti + bestsize) == b.charAt(bestj + bestsize)) {
      bestsize += 1
    }
    (besti, bestj, bestsize)
  }
}
