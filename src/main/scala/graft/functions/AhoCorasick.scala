package graft.functions

/** Aho–Corasick multi-pattern matcher (Aho & Corasick 1975, CACM 18(6))
  * for the blocklist filter's large-list path: one pass over the text
  * regardless of list size, vs the regex alternation's per-position
  * backtracking that degrades past a few hundred terms.
  *
  * Semantics are IDENTICAL to the regex path in
  * [[graft.operators.TextAnalysis.blocklistFlag]] —
  * `(?iu)(^|[^a-z0-9])(w1|w2|…)([^a-z0-9]|$)` — and a hit counts only
  * when both neighbors are outside `[a-z0-9]`
  * ([[graft.AhoCorasickSpec]] differential-tests the two paths on the
  * same inputs, including non-ASCII terms).
  *
  * Case folding is LOCALE-INDEPENDENT and replicates exactly what
  * `java.util.regex` does under `CASE_INSENSITIVE | UNICODE_CASE`:
  * per-codepoint `Character.toLowerCase(Character.toUpperCase(cp))`
  * (the 1:1 simple mapping `Pattern.SingleU` compares with) — NOT
  * `String.toLowerCase`, whose default-locale behavior breaks Turkish
  * I/i and whose multi-char special casings (e.g. İ → "i̇") diverge
  * from the regex path.
  *
  * Built once on the driver, serialized with the closure; flat-array
  * automaton (sorted per-node transition arrays + binary search), so
  * executor deserialization is cheap and matching allocates nothing
  * beyond the one folded copy of the text.
  */
final class AhoCorasick(patternsRaw: Seq[String]) extends Serializable {
  require(patternsRaw.nonEmpty, "empty pattern set")
  private val patterns =
    patternsRaw.map(AhoCorasick.foldCase).distinct.toArray

  // --- trie build (mutable, driver-side only) ---
  private val (transKeys, transVals, fail, outLens) = {
    import scala.collection.mutable
    val children = mutable.ArrayBuffer(mutable.TreeMap.empty[Char, Int])
    val ends = mutable.ArrayBuffer(List.empty[Int])
    patterns.foreach { p =>
      var s = 0
      p.foreach { c =>
        s = children(s).getOrElseUpdate(c, {
          children += mutable.TreeMap.empty[Char, Int]
          ends += Nil
          children.size - 1
        })
      }
      ends(s) = p.length :: ends(s)
    }
    val n = children.size
    val failA = new Array[Int](n)
    val outA = new Array[List[Int]](n)
    var i = 0
    while (i < n) { outA(i) = ends(i); i += 1 }
    // BFS fail links (root's children fail to root)
    val queue = mutable.Queue.empty[Int]
    children(0).valuesIterator.foreach { c => failA(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      children(u).foreach { case (ch, v) =>
        var f = failA(u)
        while (f != 0 && !children(f).contains(ch)) f = failA(f)
        failA(v) = if (children(f).contains(ch) && children(f)(ch) != v)
          children(f)(ch) else 0
        outA(v) = outA(v) ++ outA(failA(v))
        queue += v
      }
    }
    val keysA = new Array[Array[Char]](n)
    val valsA = new Array[Array[Int]](n)
    i = 0
    while (i < n) {
      keysA(i) = children(i).keysIterator.toArray
      valsA(i) = children(i).valuesIterator.toArray
      i += 1
    }
    (keysA, valsA, failA, outA.map(_.toArray))
  }

  @inline private def child(s: Int, c: Char): Int = {
    val ks = transKeys(s)
    var lo = 0; var hi = ks.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (ks(mid) == c) return transVals(s)(mid)
      else if (ks(mid) < c) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  /** True iff any pattern occurs at a token boundary (both neighbors
    * outside [a-z0-9]), case-insensitively. One pass, no allocation. */
  def containsAny(textRaw: String): Boolean = {
    if (textRaw == null) return false
    val text = AhoCorasick.foldCase(textRaw)
    var state = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      var next = child(state, c)
      while (next < 0 && state != 0) { state = fail(state); next = child(state, c) }
      state = if (next >= 0) next else 0
      val outs = outLens(state)
      var k = 0
      while (k < outs.length) {
        val start = i + 1 - outs(k)
        if ((start == 0 || !isWordChar(text.charAt(start - 1))) &&
            (i == text.length - 1 || !isWordChar(text.charAt(i + 1))))
          return true
        k += 1
      }
      i += 1
    }
    false
  }
}

object AhoCorasick {
  /** Java-regex-equivalent simple case fold: per CODEPOINT,
    * `Character.toLowerCase(Character.toUpperCase(cp))` — the exact 1:1
    * mapping `java.util.regex.Pattern` uses for
    * `CASE_INSENSITIVE | UNICODE_CASE` literals, locale-independent by
    * construction (no Turkish-locale I/i trap, no multi-char special
    * casings). Codepoint iteration keeps supplementary-plane case pairs
    * (e.g. Deseret) folding like the regex path does. */
  private[graft] def foldCase(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      sb.appendCodePoint(Character.toLowerCase(Character.toUpperCase(cp)))
      i += Character.charCount(cp)
    }
    sb.toString
  }
}
