package graft.functions

/** The Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3) 1980 — public domain algorithm), implemented
  * from the published definition. The reference's `english` fulltext
  * analyzer stems via Lucene's PorterStemFilter
  * (`docs/general/ddl/fulltext-indices.rst`); this is the same algorithm,
  * so index-side and query-side terms agree with what a migrating user's
  * `english`-analyzed index produced.
  *
  * Used through [[MatchText.Analyzer]] (porter = true) and the
  * `porter_stem` SQL function; deterministic and allocation-light (one
  * StringBuilder per call), fine for a per-token map stage at scale.
  */
object Porter {

  private def isVowel(s: CharSequence, i: Int): Boolean = s.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowel(s, i - 1)
    case _ => false
  }

  /** m = number of VC sequences in the [C](VC)^m[V] decomposition of s[0..end]. */
  private def measure(s: CharSequence, end: Int): Int = {
    var m = 0
    var i = 0
    // skip initial consonants
    while (i <= end && !isVowel(s, i)) i += 1
    while (i <= end) {
      // in a vowel run
      while (i <= end && isVowel(s, i)) i += 1
      if (i <= end) { // consonant follows a vowel → one VC
        m += 1
        while (i <= end && !isVowel(s, i)) i += 1
      }
    }
    m
  }

  private def containsVowel(s: CharSequence, end: Int): Boolean =
    (0 to end).exists(isVowel(s, _))

  private def endsDoubleC(s: CharSequence, end: Int): Boolean =
    end >= 1 && s.charAt(end) == s.charAt(end - 1) && !isVowel(s, end)

  /** *o: stem ends cvc where the final c is not w, x or y. */
  private def endsCvc(s: CharSequence, end: Int): Boolean =
    end >= 2 && !isVowel(s, end - 2) && isVowel(s, end - 1) && !isVowel(s, end) &&
      "wxy".indexOf(s.charAt(end)) < 0

  def stem(word: String): String = {
    if (word == null) return null
    val w = word.toLowerCase
    if (w.length <= 2 || !w.forall(c => c >= 'a' && c <= 'z')) return w
    val b = new StringBuilder(w)

    def ends(suffix: String): Boolean =
      b.length >= suffix.length && b.endsWith(suffix)
    /** measure of the stem that remains after removing `suffix`. */
    def mStem(suffix: String): Int = measure(b, b.length - suffix.length - 1)
    def vStem(suffix: String): Boolean = containsVowel(b, b.length - suffix.length - 1)
    def setTo(suffix: String, repl: String): Unit = {
      b.setLength(b.length - suffix.length); b.append(repl)
    }
    /** step-2/3/4 style rule table: first matching suffix fires (longest
      * listed first, as in the published tables). */
    def rules(minM: Int, rs: (String, String)*): Unit = {
      rs.find { case (suf, _) => ends(suf) } match {
        case Some((suf, repl)) if mStem(suf) > minM - 1 => setTo(suf, repl)
        case _ => ()
      }
    }

    // Step 1a
    if (ends("sses")) setTo("sses", "ss")
    else if (ends("ies")) setTo("ies", "i")
    else if (!ends("ss") && ends("s")) setTo("s", "")

    // Step 1b
    var extraE = false
    if (ends("eed")) { if (mStem("eed") > 0) setTo("eed", "ee") }
    else if (ends("ed") && vStem("ed")) { setTo("ed", ""); extraE = true }
    else if (ends("ing") && vStem("ing")) { setTo("ing", ""); extraE = true }
    if (extraE) {
      if (ends("at")) setTo("at", "ate")
      else if (ends("bl")) setTo("bl", "ble")
      else if (ends("iz")) setTo("iz", "ize")
      else if (endsDoubleC(b, b.length - 1) &&
        "lsz".indexOf(b.charAt(b.length - 1)) < 0) b.setLength(b.length - 1)
      else if (measure(b, b.length - 1) == 1 && endsCvc(b, b.length - 1)) b.append('e')
    }

    // Step 1c
    if (ends("y") && vStem("y")) setTo("y", "i")

    // Step 2 (m > 0)
    rules(1,
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
      "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
      "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

    // Step 3 (m > 0)
    rules(1,
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> "")

    // Step 4 (m > 1); (s|t)ion keeps ion only when preceded by s or t
    if (ends("ion")) {
      val pre = b.length - 4
      if (pre >= 0 && (b.charAt(pre) == 's' || b.charAt(pre) == 't') && mStem("ion") > 1)
        setTo("ion", "")
    } else rules(2,
      "ement" -> "", "ance" -> "", "ence" -> "", "able" -> "", "ible" -> "",
      "ment" -> "", "ant" -> "", "ent" -> "", "ism" -> "", "ate" -> "",
      "iti" -> "", "ous" -> "", "ive" -> "", "ize" -> "", "ou" -> "",
      "al" -> "", "er" -> "", "ic" -> "")

    // Step 5a
    if (ends("e")) {
      val m = mStem("e")
      if (m > 1 || (m == 1 && !endsCvc(b, b.length - 2))) setTo("e", "")
    }
    // Step 5b
    if (measure(b, b.length - 1) > 1 && endsDoubleC(b, b.length - 1) &&
      b.charAt(b.length - 1) == 'l') b.setLength(b.length - 1)

    b.toString
  }
}
