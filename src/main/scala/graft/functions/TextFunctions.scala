package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.UserDefinedFunction

/** Deterministic text hashing/fingerprint kernels used by the dedup and
  * text-analysis operators (large-scale training-data pipeline surface).
  *
  * Everything here is a pure function of its input — no RNG at eval time —
  * so results are stable across partitions, retries, and sessions. The hash
  * family is splitmix64 over a 64-bit FNV-1a base hash; seeds are derived
  * deterministically from the hash index.
  */
object TextFunctions {

  // ---- 64-bit hashing (deterministic, allocation-free) ----

  def fnv1a64(s: CharSequence, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
  def fnv1a64(s: String): Long = fnv1a64(s, 0, s.length)

  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Normalize for shingling: lowercase, collapse whitespace runs. */
  def normalize(text: String): String =
    text.toLowerCase.replaceAll("\\s+", " ").trim

  def tokenize(text: String): Array[String] =
    normalize(text).split(' ').filter(_.nonEmpty)

  // ---- MinHash ----

  /** MinHash signature over character shingles. One base hash per shingle,
    * then `numHashes` cheap affine derivations (standard one-permutation
    * family) — O(len + numHashes·shingles) per doc, embarrassingly parallel.
    * Reference capability: near-dup detection has no CrateDB equivalent; this
    * is pipeline-extension surface (builder brief).
    */
  /** Per-index seeds are fixed for all time — cache them (the inner loop
    * runs shingles × numHashes times per document). */
  private val seedCache = new java.util.concurrent.atomic.AtomicReference[Array[Long]](Array.empty)
  private def seeds(n: Int): Array[Long] = {
    val cur = seedCache.get()
    if (cur.length >= n) cur
    else {
      val fresh = Array.tabulate(math.max(n, 256))(j => splitmix64(j.toLong))
      seedCache.compareAndSet(cur, fresh)
      fresh
    }
  }

  def minhashSignature(text: String, shingleSize: Int, numHashes: Int): Array[Long] = {
    val norm = normalize(text)
    val sd = seeds(numHashes)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    def mix(base: Long): Unit = {
      var j = 0
      while (j < numHashes) {
        val h = splitmix64(base ^ sd(j))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
    }
    if (norm.length < shingleSize) { mix(fnv1a64(norm)); return sig }
    // Dedupe shingle hashes first: the min over a set ignores multiplicity,
    // and natural text repeats shingles heavily — mixing each distinct base
    // once cuts the (shingles × numHashes) inner loop substantially.
    val last = norm.length - shingleSize
    val bases = new Array[Long](last + 1)
    var i = 0
    while (i <= last) { bases(i) = fnv1a64(norm, i, i + shingleSize); i += 1 }
    java.util.Arrays.sort(bases)
    var prev = 0L
    i = 0
    while (i <= last) {
      val b = bases(i)
      if (i == 0 || b != prev) { mix(b); prev = b }
      i += 1
    }
    sig
  }

  /** Fused text → LSH band keys kernel (signature never escapes the local
    * frame). Called from the codegen'd `MinHashBandsExpr` — keep this a
    * plain static-forwardable method so generated Java can reach it. */
  def minhashBandKeys(text: String, shingleSize: Int, numHashes: Int, bands: Int): Array[Long] =
    bandKeys(minhashSignature(text, shingleSize, numHashes), bands)

  /** LSH band keys from a signature: hash of each band's rows. */
  def bandKeys(sig: Array[Long], bands: Int): Array[Long] = {
    val rows = sig.length / bands
    Array.tabulate(bands) { b =>
      var h = 0xcbf29ce484222325L ^ splitmix64(b.toLong)
      var r = b * rows
      while (r < (b + 1) * rows) { h = splitmix64(h ^ sig(r)); r += 1 }
      h
    }
  }

  /** Exact Jaccard over char-shingle sets (verification step after LSH). */
  def shingleJaccard(a: String, b: String, shingleSize: Int): Double = {
    val sa = shingleSet(a, shingleSize)
    val sb = shingleSet(b, shingleSize)
    if (sa.isEmpty && sb.isEmpty) return 1.0
    val inter = sa.count(sb.contains)
    val union = sa.size + sb.size - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  def shingleSet(text: String, shingleSize: Int): Set[Long] = {
    val norm = normalize(text)
    if (norm.length < shingleSize) return if (norm.isEmpty) Set.empty else Set(fnv1a64(norm))
    (0 to norm.length - shingleSize).map(i => fnv1a64(norm, i, i + shingleSize)).toSet
  }

  /** [[shingleSet]] as a SORTED distinct array — the pre-shingle
    * projection for pair verification (guide §4 expression reuse / the
    * r15 single-pass-tokenization recipe applied to the dedup family):
    * computed ONCE per document before the candidate join, so the
    * per-pair verify is a zero-allocation merge-count
    * ([[jaccardSortedLongs]]) instead of re-normalizing (a regex pass)
    * and re-hashing both texts for every candidate pair. Same hash
    * family and set content as [[shingleSet]], so
    * jaccardSortedLongs(shingleArray(a), shingleArray(b)) ==
    * shingleJaccard(a, b) bit-for-bit. */
  def shingleArray(text: String, shingleSize: Int): Array[Long] = {
    val norm = normalize(text)
    if (norm.isEmpty) return Array.emptyLongArray
    if (norm.length < shingleSize) return Array(fnv1a64(norm))
    val last = norm.length - shingleSize
    val bases = new Array[Long](last + 1)
    var i = 0
    while (i <= last) { bases(i) = fnv1a64(norm, i, i + shingleSize); i += 1 }
    java.util.Arrays.sort(bases)
    var n = 0
    var prev = 0L
    i = 0
    while (i <= last) {
      val b = bases(i)
      if (n == 0 || b != prev) { bases(n) = b; n += 1; prev = b }
      i += 1
    }
    if (n == bases.length) bases else java.util.Arrays.copyOf(bases, n)
  }

  /** Exact Jaccard over two SORTED distinct long arrays via merge-count:
    * O(|a|+|b|) comparisons, zero allocation per pair. Agrees with
    * [[shingleJaccard]] over the same sets (union = |a|+|b|−inter; both
    * empty ⇒ 1.0 — the shingleJaccard empty-both convention). */
  def jaccardSortedLongs(a: org.apache.spark.sql.catalyst.util.ArrayData,
                         b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val la = a.numElements()
    val lb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < la && j < lb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = la + lb - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** Most-frequent word-bigram share (the Gopher/MassiveText repetition
    * rule): count of the most frequent 2-gram / total 2-grams, 0.0 below
    * 2 tokens. Case-SENSITIVE whitespace tokens — the exact token stream
    * `TextAnalysis.tokens` produces, so the row-local kernel and the old
    * (doc, gram) two-level aggregation agree value-for-value
    * (StreamRepetitionSpec pins the parity). Row-local and bounded by
    * document length — the map-only form of the metric, zero shuffle at
    * any corpus size. */
  def topBigramShare(text: String): Double = {
    if (text == null) return 0.0
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.length < 2) return 0.0
    val counts = new java.util.HashMap[String, Int]()
    var i = 0
    var total = 0
    while (i < toks.length - 1) {
      counts.merge(toks(i) + " " + toks(i + 1), 1, Integer.sum)
      total += 1
      i += 1
    }
    var mx = 0
    counts.values.forEach(v => if (v > mx) mx = v)
    mx.toDouble / total
  }

  // ---- SimHash ----

  /** 64-bit SimHash over word tokens. Hamming-close hashes ⇒ similar docs. */
  def simhash64(text: String): Long = {
    val acc = new Array[Int](64)
    for (tok <- tokenize(text)) {
      val h = splitmix64(fnv1a64(tok))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Pigeonhole chunks for hamming-distance LSH: if hamming(a,b) <= k, then
    * a and b agree on at least one of k+1 equal-width chunks. */
  def simhashChunks(h: Long, chunks: Int): Array[Long] = {
    val width = 64 / chunks
    Array.tabulate(chunks)(c => ((h >>> (c * width)) & ((1L << width) - 1)) | (c.toLong << 56))
  }

  // ---- Fingerprinting ----

  /** Rolling polynomial (Rabin-Karp style) 64-bit document fingerprint. */
  def fingerprint64(text: String): Long = {
    var h = 0L
    val norm = normalize(text)
    var i = 0
    while (i < norm.length) { h = h * 1000003L + norm.charAt(i); i += 1 }
    splitmix64(h)
  }

  // ---- Language ID (n-gram/stopword heuristic) ----

  private val stopwords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "on", "with", "as"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit", "von", "auf"),
    "fr" -> Set("le", "la", "les", "et", "est", "un", "une", "de", "du", "pour", "dans", "que"),
    "es" -> Set("el", "la", "los", "las", "y", "es", "un", "una", "de", "del", "para", "en", "que"),
    "it" -> Set("il", "la", "gli", "e", "è", "un", "una", "di", "del", "per", "che", "con"),
    "pt" -> Set("o", "a", "os", "as", "e", "é", "um", "uma", "de", "do", "da", "para", "que"),
    "nl" -> Set("de", "het", "een", "en", "is", "niet", "van", "voor", "met", "op", "dat")
  )

  /** Heuristic language ID: argmax of stopword hit-rate; "und" (undetermined)
    * when nothing matches. Deterministic tie-break by language code. */
  def langId(text: String): String = {
    val toks = tokenize(text)
    if (toks.isEmpty) return "und"
    val scores = stopwords.map { case (lang, sw) => lang -> toks.count(sw.contains) }
    val (bestLang, bestScore) = scores.toSeq.sortBy { case (l, s) => (-s, l) }.head
    if (bestScore == 0) "und" else bestLang
  }

  // ---- Mojibake repair (encoding round-trip artifacts) ----

  /** WHATWG windows-1252 high half: byte 0x80+i ↔ cp1252Hi(i). The five
    * bytes the Unicode mapping leaves undefined (0x81 0x8D 0x8F 0x90 0x9D)
    * map to the same-valued C1 controls per the WHATWG encoding standard,
    * so any 0x80-0xFF byte round-trips — the JDK decoder instead yields
    * U+FFFD for those five, which would make repair lossy. */
  private val cp1252Hi: Array[Char] = Array(
    '\u20AC', '\u0081', '\u201A', '\u0192', '\u201E', '\u2026', '\u2020', '\u2021',
    '\u02C6', '\u2030', '\u0160', '\u2039', '\u0152', '\u008D', '\u017D', '\u008F',
    '\u0090', '\u2018', '\u2019', '\u201C', '\u201D', '\u2022', '\u2013', '\u2014',
    '\u02DC', '\u2122', '\u0161', '\u203A', '\u0153', '\u009D', '\u017E', '\u0178')

  /** char -> cp1252 byte value for the remapped 0x80-0x9F half. */
  private val cp1252Enc: Map[Char, Int] =
    cp1252Hi.zipWithIndex.map { case (c, i) => c -> (0x80 + i) }.toMap

  /** Encode via WHATWG windows-1252; null when any char has no cp1252 byte
    * (e.g. Cyrillic/CJK -- such text cannot be a cp1252 mis-decode). */
  private def encodeCp1252(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 0x80 || (c >= 0xA0 && c <= 0xFF)) out(i) = c.toByte
      else cp1252Enc.getOrElse(c, -1) match {
        case -1 => return null
        case b  => out(i) = b.toByte
      }
      i += 1
    }
    out
  }

  /** Strict UTF-8 decode; null on any malformed or unmappable sequence. */
  private def strictUtf8(b: Array[Byte]): String =
    try {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      dec.decode(java.nio.ByteBuffer.wrap(b)).toString
    } catch { case _: java.nio.charset.CharacterCodingException => null }

  /** Repair UTF-8-bytes-read-as-windows-1252 mojibake ("CafÃ©" → "Café"),
    * the dominant encoding defect in web crawls (the core ftfy case,
    * documented in the WHATWG encoding standard + ftfy's published
    * heuristic). A candidate repair is accepted only when (a) the text has
    * a non-ASCII char, (b) EVERY char maps back to a cp1252 byte, and
    * (c) those bytes re-decode as strictly valid UTF-8 — legitimate
    * accented text fails (c) (isolated 0xE9 etc. is malformed UTF-8), and
    * non-Latin scripts fail (b), so the transform is conservative:
    * fixed-point for clean text, applied up to 3 rounds for
    * double/triple-encoded strings. Deterministic, allocation-bounded,
    * executor-local (used from a codegen'd expression — see
    * plans.TextExpressions.MojibakeRepairExpr). */
  def repairMojibake(s: String): String = {
    var cur = s
    var iter = 0
    while (iter < 3) {
      var hasHi = false
      var i = 0
      while (i < cur.length && !hasHi) { if (cur.charAt(i) >= 0x80) hasHi = true; i += 1 }
      if (!hasHi) return cur
      val bytes = encodeCp1252(cur)
      if (bytes == null) return cur
      val dec = strictUtf8(bytes)
      if (dec == null || dec == cur || dec.indexOf('\uFFFD') >= 0) return cur
      cur = dec
      iter += 1
    }
    cur
  }

  // ---- Unicode normalization ----

  /** Unicode normalization (NFC/NFD/NFKC/NFKD via the JDK's
    * java.text.Normalizer — the Unicode standard annex #15 algorithm).
    * The curation-standard pre-hash pass: NFC canonicalizes composed vs
    * decomposed spellings so exact/MinHash dedup keys agree; NFKC
    * additionally folds compatibility forms (ligatures, fullwidth/
    * halfwidth, circled digits) the way mC4/CCNet normalize before
    * counting. Called from the codegen'd
    * [[graft.plans.UnicodeNormalizeExpr]]. */
  def unicodeNormalize(s: String, form: String): String =
    java.text.Normalizer.normalize(s,
      java.text.Normalizer.Form.valueOf(form.toUpperCase(java.util.Locale.ROOT)))

  // ---- UDF wrappers (registered by GraftFunctions.registerAll) ----

  val minhashUdf: UserDefinedFunction =
    udf((text: String, shingle: Int, n: Int) =>
      if (text == null) null else minhashSignature(text, shingle, n))
  val simhashUdf: UserDefinedFunction =
    udf((text: String) => if (text == null) null else Long.box(simhash64(text)))
  val fingerprintUdf: UserDefinedFunction =
    udf((text: String) => if (text == null) null else Long.box(fingerprint64(text)))
  val langIdUdf: UserDefinedFunction =
    udf((text: String) => if (text == null) null else langId(text))
  val jaccardUdf: UserDefinedFunction =
    udf((a: String, b: String, shingle: Int) =>
      if (a == null || b == null) null else Double.box(shingleJaccard(a, b, shingle)))

  def minhash(text: Column, shingleSize: Int = 5, numHashes: Int = 128): Column =
    minhashUdf(text, lit(shingleSize), lit(numHashes))
  // simhash/fingerprint route to the codegen'd native expressions
  // (plans.TextExpressions) — requires GraftFunctions.registerAll, which
  // every operator entry point calls.
  def simhash(text: Column): Column = call_function("graft_simhash", text)
  def fingerprint(text: Column): Column = call_function("graft_fingerprint", text)
  def repairEncoding(text: Column): Column = call_function("repair_mojibake", text)
  def languageOf(text: Column): Column = langIdUdf(text)
}
