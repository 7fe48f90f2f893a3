package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Round-10 specs: the two operators round 9 swept in ungated.
  *
  * MojibakeSpec pins `repair_mojibake` (TextFunctions.repairMojibake +
  * the codegen'd MojibakeRepairExpr) with programmatic round-trip
  * vectors: mojibake is DERIVED in-test (UTF-8 encode → WHATWG cp1252
  * decode over the spec's own table), never hand-typed, so a wrong
  * golden can't hide a wrong kernel.
  */
class MojibakeSpec extends SparkTestBase {

  /** WHATWG windows-1252 high half (encoding standard, index = byte-0x80).
    * Independent re-statement of the table so a transcription slip in the
    * main kernel's copy fails the round-trip. */
  private val hi: Array[Char] = Array(
    0x20AC, 0x0081, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
    0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x008D, 0x017D, 0x008F,
    0x0090, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x009D, 0x017E, 0x0178)
    .map(_.toChar)

  /** One round of "UTF-8 bytes read as windows-1252" damage. */
  private def mojibake(s: String): String =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).map { b =>
      val ub = b & 0xff
      if (ub >= 0x80 && ub <= 0x9f) hi(ub - 0x80) else ub.toChar
    }.mkString

  private val cleanLatin = Seq(
    "Café au lait", "naïve résumé", "Straße grüßen", "¡Ángel! ¿señor?",
    // every WHATWG remap in one string, incl. the five C1 holes the JDK
    // decoder loses to U+FFFD (0x81 0x8D 0x8F 0x90 0x9D <-> U+0081 ...)
    "It’s “quoted” — em–en • … € ‰ Œ œ Š š Ž ž Ÿ ƒ ˆ ˜ ‚ „ † ‡ ‹ › ™",
    "\u0081\u008d\u008f\u0090\u009d") // the 5 C1 holes, escaped

  test("single-encoded mojibake round-trips back to the original") {
    cleanLatin.foreach { s =>
      val m = mojibake(s)
      assert(m != s, s"fixture must actually damage: $s")
      assert(TextFunctions.repairMojibake(m) == s, s"repair of ${m}")
    }
  }

  test("double- and triple-encoded mojibake repairs within 3 rounds") {
    cleanLatin.take(3).foreach { s =>
      assert(TextFunctions.repairMojibake(mojibake(mojibake(s))) == s)
      assert(TextFunctions.repairMojibake(mojibake(mojibake(mojibake(s)))) == s)
    }
  }

  test("fixed points: clean text of any script is untouched; idempotent") {
    val clean = Seq("plain ascii, nothing else.", "", "Café au lait",
      "Привет, мир", "データ分析と机器学习", "🙂 emoji stays",
      "mixed: Ωμέγα & تجربة")
    clean.foreach { s =>
      assert(TextFunctions.repairMojibake(s) == s, s"must not touch: $s")
    }
    cleanLatin.foreach { s =>
      val r = TextFunctions.repairMojibake(mojibake(s))
      assert(TextFunctions.repairMojibake(r) == r)
    }
  }

  test("conservative: plausible-but-invalid candidates are left alone") {
    // 'Ã' alone maps to byte 0xC3 — a dangling UTF-8 lead byte, strict
    // decode fails, so the repair must bail rather than guess
    assert(TextFunctions.repairMojibake("Ã") == "Ã")
    // cp1252-encodable text whose bytes decode to DIFFERENT valid text
    // must only change when the decode is strictly valid UTF-8
    val s = "A±B" // 0xB1 alone is a continuation byte — invalid
    assert(TextFunctions.repairMojibake(s) == s)
  }

  test("SQL registration + codegen expression match the kernel, null-safe") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val inputs = cleanLatin.map(mojibake) ++ Seq("plain", null)
    val df = inputs.toDF("t")
      .select(col("t"), call_function("repair_mojibake", col("t")).as("r"))
    val rows = df.collect()
    rows.foreach { row =>
      val t = row.getString(0)
      val expected = if (t == null) null else TextFunctions.repairMojibake(t)
      assert(row.getString(1) == expected)
    }
    // WholeStageCodegen keeps the expression in the codegen'd stage
    // (the literal frame above constant-folds to a LocalTableScan, so
    // assert over a parquet-backed scan where codegen actually runs)
    val dfp = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(call_function("repair_mojibake", col("text")).as("r"))
    val plan = dfp.queryExecution.executedPlan.toString
    // "*(1)" prefixes the WholeStageCodegen span in the simple plan form
    assert(plan.contains("*(1) Project [repair_mojibake"), plan)
    assert(dfp.count() > 0)
  }
}

/** Pins `Dedup.keepBest`: survivor choice, group-size annotation,
  * deterministic tie-breaks, and the one-shuffle plan contract. */
class KeepBestSpec extends SparkTestBase {

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox", 5.0),
      (2L, "the  quick  brown  fox", 3.0), // damaged variant of group A
      (3L, " the quick brown fox ", 4.0),  // padded variant of group A
      (4L, "lonely document", 1.0),
      (5L, "tie game", 2.0),
      (6L, "tie game", 2.0)                // exact tie -> lowest id wins
    ).toDF("doc_id", "text", "quality")
  }

  private def norm = trim(regexp_replace(col("text"), "\\s+", " "))

  test("keeps the best-scored variant per group and annotates group size") {
    val out = Dedup.keepBest(fixture,
      groupKey = Seq(norm),
      better = Seq(col("quality").desc, col("doc_id").asc))
      .select(col("doc_id"), col("n_members")).orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 3L), (4L, 1L), (5L, 2L)))
  }

  test("survivor need not be the lowest id") {
    val out = Dedup.keepBest(fixture,
      groupKey = Seq(norm),
      better = Seq(col("quality").asc, col("doc_id").asc)) // worst wins
      .select(col("doc_id")).orderBy(col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(2L, 4L, 5L))
  }

  test("rank and group-size windows share ONE shuffle") {
    val plan = Dedup.keepBest(fixture, Seq(norm), Seq(col("quality").desc))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }
}

/** Pins the SemDeDup K ≈ √N contract now enforced in code (r9 verdict
  * ask #4): `semDedupAutoK` is the sizing rule, `semDedupAuto` derives
  * trained centroids from one count() so a naive caller gets the
  * paper's N^1.5 pair-cost scaling by default. */
class SemDedupAutoKSpec extends SparkTestBase {
  import graft.operators.Similarity

  test("auto-K follows the sqrt-N rule with a 16 floor") {
    assert(Similarity.semDedupAutoK(0L) == 16)
    assert(Similarity.semDedupAutoK(100L) == 16)  // floor wins below 256
    assert(Similarity.semDedupAutoK(256L) == 16)
    assert(Similarity.semDedupAutoK(257L) == 17)  // sqrt takes over here
    assert(Similarity.semDedupAutoK(500L) == 23)
    assert(Similarity.semDedupAutoK(1000000L) == 1000)
  }

  test("semDedupAuto blocks into at most ceil(sqrt(N)) clusters") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val k = Similarity.semDedupAutoK(n)
    val out = Similarity.semDedupAuto(emb, tau = 0.4).cache()
    try {
      assert(out.count() == n) // one verdict row per input
      val cl = out.agg(
        countDistinct(col("cluster")), min(col("cluster")),
        max(col("cluster"))).head()
      assert(cl.getLong(0) <= k, s"clusters=${cl.getLong(0)} k=$k")
      assert(cl.getInt(1) >= 0 && cl.getInt(2) < k)
      // the keep-lowest-id policy always keeps the corpus minimum
      val minKept = out.orderBy(col("vec_id")).limit(1)
        .select(col("kept")).head().getBoolean(0)
      assert(minKept)
    } finally { out.unpersist() }
  }
}

/** Pins the DSIR Gumbel top-k sampler (r9 verdict ask #5): derived
  * noise, determinism per seed, seed sensitivity, and the exact-decimal
  * ranking key decomposition. */
class DsirGumbelSpec extends SparkTestBase {
  import graft.operators.TextAnalysis

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("same seed reproduces the identical selection; seeds differ") {
    val a = TextAnalysis.dsirGumbelTopK(docs, col("lang") === "en", 42L, 20)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    val b = TextAnalysis.dsirGumbelTopK(docs, col("lang") === "en", 42L, 20)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    val c = TextAnalysis.dsirGumbelTopK(docs, col("lang") === "en", 7L, 20)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    assert(a == b)
    assert(a != c, "a different seed must perturb the selection")
    assert(a.size == 20 && a.distinct.size == 20)
  }

  test("gumbel key = decimal log-weight + derived noise, noise finite") {
    val sel = TextAnalysis.dsirGumbelTopK(docs, col("lang") === "en", 42L, 20)
    val rows = sel.select(col("doc_id"), col("log_weight"), col("gumbel_key"))
      .collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      // recompute the noise exactly as documented: first 60 bits of
      // md5("42-<id>"), u=(x+0.5)/2^60, g=round(-ln(-ln u), 6)
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"42-$id".getBytes("UTF-8"))
      val hex = d.take(8).map(b => f"$b%02x").mkString.take(15)
      val x = java.lang.Long.parseLong(hex, 16)
      val u = (x + 0.5) / 1152921504606846976.0
      val g = BigDecimal(-math.log(-math.log(u)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      val lw = r.getDecimal(1)
      val key = r.getDecimal(2)
      assert((BigDecimal(lw) + g).compare(BigDecimal(key)) == 0,
        s"doc $id: $lw + $g != $key")
    }
  }
}

/** Pins the C4 blocklist filter and the CCNet perplexity tiers. */
class CurationTailSpec extends SparkTestBase {
  import graft.operators.TextAnalysis

  test("blocklistFlag: token-boundary, case-insensitive, list-wide") {
    import spark.implicits._
    val df = Seq(
      (1L, "clean text here"),
      (2L, "contains dup token"),
      (3L, "the duped word must not match"),   // boundary: no hit
      (4L, "SLOW in caps"),
      (5L, "vector at end: vector"),
      (6L, "dup"),                             // whole-string match
      (7L, "endswith dup")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.blocklistFlag(df, Seq("dup", "vector", "slow"))
      .orderBy(col("doc_id")).collect().map(_.getBoolean(2)).toSeq
    assert(out == Seq(false, true, false, true, true, true, true))
  }

  test("perplexityBuckets: per-partition equal-frequency tiers, " +
       "deterministic ties, short docs excluded") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = TextAnalysis.perplexityBuckets(docs, "lang", 3).cache()
    try {
      // every scored doc gets a tier 1..3; per-lang tier sizes differ
      // by at most one (ntile contract)
      assert(out.filter(col("tier") < 1 || col("tier") > 3).count() == 0)
      val sizes = out.groupBy(col("lang"), col("tier")).count()
        .groupBy(col("lang"))
        .agg((max(col("count")) - min(col("count"))).as("spread"))
        .collect().map(_.getLong(1))
      assert(sizes.forall(_ <= 1), sizes.toSeq.toString)
      // deterministic: re-running yields the identical assignment
      val again = TextAnalysis.perplexityBuckets(docs, "lang", 3)
      assert(out.except(again).count() == 0 && again.except(out).count() == 0)
    } finally { out.unpersist() }
  }
}

/** Pins Dedup.bloomHistoryFlag: the no-false-negative guarantee, a
  * bounded false-positive rate, and normalization-insensitivity. */
class BloomHistorySpec extends SparkTestBase {
  import graft.operators.Dedup

  test("every true duplicate is flagged; fp rate bounded; norm-insensitive") {
    import spark.implicits._
    val history = (1L to 400L).map(i => (i, s"historical document number $i"))
      .toDF("doc_id", "text")
    val newDocs = (
      (1L to 100L).map(i => (1000 + i, s"historical document number $i")) ++
      // whitespace/case variants of history rows must still flag
      Seq((2001L, "  Historical   document number 7 "),
          (2002L, "HISTORICAL DOCUMENT NUMBER 8")) ++
      (1L to 300L).map(i => (3000 + i, s"genuinely fresh content $i"))
    ).toDF("doc_id", "text")
    val out = Dedup.bloomHistoryFlag(newDocs, history, fpp = 0.01)
      .select(col("doc_id"), col("maybe_dup")).collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toMap
    // Bloom guarantee: zero false negatives, incl. normalization variants
    (1L to 100L).foreach(i => assert(out(1000 + i), s"missed dup $i"))
    assert(out(2001L) && out(2002L), "normalization variants must flag")
    // false positives bounded well above fpp = 1%
    val fp = (1L to 300L).count(i => out(3000 + i))
    assert(fp <= 15, s"fp = $fp of 300 at fpp = 0.01")
  }
}

/** Pins unicode_normalize (UAX #15 via java.text.Normalizer): form
  * semantics, idempotence, codegen registration, null safety. */
class UnicodeNormalizeSpec extends SparkTestBase {
  import graft.functions.TextFunctions.unicodeNormalize

  test("NFC composes, NFKC folds compatibility forms, both idempotent") {
    val dec = "Cafe\u0301"            // e + combining acute
    assert(unicodeNormalize(dec, "NFC") == "Caf\u00e9")
    assert(unicodeNormalize("\u212b", "NFC") == "\u00c5")  // angstrom
    assert(unicodeNormalize("\ufb01le", "NFC") == "\ufb01le") // ligature kept
    assert(unicodeNormalize("\ufb01le", "NFKC") == "file")    // ...folded
    assert(unicodeNormalize("\u2460\u00b2", "NFKC") == "12")
    assert(unicodeNormalize("\uff83\uff9e\uff70\uff80", "NFKC") == "\u30c7\u30fc\u30bf")
    // NFD decomposes back
    assert(unicodeNormalize("Caf\u00e9", "NFD") == dec)
    // idempotence on every form
    Seq("NFC", "NFD", "NFKC", "NFKD").foreach { f =>
      val once = unicodeNormalize("\u2460 Caf\u00e9 \ufb01le \u212b", f)
      assert(unicodeNormalize(once, f) == once, f)
    }
    // lowercase form names accepted
    assert(unicodeNormalize(dec, "nfc") == "Caf\u00e9")
  }

  test("SQL registration, codegen span, null safety, dedup-key use") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val df = Seq("Cafe\u0301", "Caf\u00e9", null).toDF("t")
      .select(call_function("unicode_normalize", col("t"), lit("NFC")).as("n"))
    val rows = df.collect().map(r => Option(r.getString(0)))
    assert(rows(0) == rows(1) && rows(0).contains("Caf\u00e9"))
    assert(rows(2).isEmpty)
    // composed and decomposed spellings now share one exact-dedup key
    val keys = Seq((1L, "Cafe\u0301"), (2L, "Caf\u00e9")).toDF("id", "t")
      .select(xxhash64(call_function("unicode_normalize", col("t"), lit("NFC"))))
      .collect().map(_.getLong(0))
    assert(keys(0) == keys(1))
    val plan = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(call_function("unicode_normalize", col("text"), lit("NFC")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [unicode_normalize"), plan)
  }
}

/** Differential gate for the blocklist's two paths: the regex
  * alternation (small lists) and the Aho-Corasick automaton (large
  * lists) must agree on every document. */
class AhoCorasickSpec extends SparkTestBase {
  import graft.functions.AhoCorasick
  import graft.operators.TextAnalysis

  test("kernel: boundaries, overlaps, case, substring collisions") {
    val ac = new AhoCorasick(Seq("dup", "slow", "he", "hers", "ab0"))
    assert(ac.containsAny("a dup here"))
    assert(!ac.containsAny("duped and dups"))      // boundary blocks
    assert(ac.containsAny("DUP!"))                 // case-insensitive
    assert(ac.containsAny("x hers y"))             // suffix-path output
    assert(ac.containsAny("he said"))
    assert(!ac.containsAny("shepherd"))            // inner 'he' blocked
    assert(ac.containsAny("ab0."))                 // digit inside word
    assert(!ac.containsAny("ab01"))                // digit boundary blocks
    assert(!ac.containsAny(""))
    assert(!ac.containsAny(null))
  }

  test("non-ASCII folding matches the (?iu) regex path exactly") {
    // the fold is java-regex's simple per-codepoint mapping
    // (Character.toLowerCase(toUpperCase(cp))), locale-independent:
    // Cyrillic, accented Latin, Greek, and the Turkish dotted İ all
    // fold the same way on both paths
    val words = Seq("привет", "café", "größe", "ΣΟΦΙΑ", "İstanbul")
    val ac = new AhoCorasick(words)
    val re = words.map(java.util.regex.Pattern.quote)
      .mkString("(?iu)(^|[^a-z0-9])(", "|", ")([^a-z0-9]|$)")
      .r.pattern
    val texts = Seq(
      "ПРИВЕТ мир", "привет", "он сказал Привет!", "приветствие",
      "CAFÉ au lait", "café.", "cafe", "in İSTANBUL today",
      "istanbul plain", "ıstanbul dotless", "GRÖSSE", "größe!",
      "σοφια lower", "Σοφια mixed", "ΣΟΦΙΑ UPPER", "x σοφιαs y")
    texts.foreach { t =>
      assert(ac.containsAny(t) == re.matcher(t).find(),
        s"paths diverge on '$t'")
    }
  }

  test("automaton path is a codegen'd expression, not a Scala UDF") {
    import spark.implicits._
    val docs = Seq((1L, "a dup here"), (2L, "clean")).toDF("doc_id", "text")
    val out = TextAnalysis.blocklistFlag(docs, Seq("dup", "slow"),
      acThreshold = 0)
    val exprs = out.queryExecution.analyzed.expressions.map(_.toString)
    assert(exprs.exists(_.contains("graft_blocklist_match")),
      s"expected BlocklistMatchExpr in the plan, got: $exprs")
    assert(!out.queryExecution.executedPlan.toString.contains("ScalaUDF"),
      "the automaton probe must not run as a Scala UDF")
    // and whole-stage codegen still compiles the probe
    val rows = out.orderBy(col("doc_id")).collect()
    assert(rows.map(_.getBoolean(2)).toSeq == Seq(true, false))
  }

  test("regex and automaton paths agree document-by-document") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // a list large enough to force the AC path when threshold is low:
    // fixture vocabulary + noise words that never match
    val words = Seq("dup", "vector", "slow", "spark", "customer") ++
      (1 to 600).map(i => s"neverpresent$i")
    val viaRegex = TextAnalysis
      .blocklistFlag(docs, words, acThreshold = Int.MaxValue)
      .select(col("doc_id"), col("blocked"))
    val viaAc = TextAnalysis
      .blocklistFlag(docs, words, acThreshold = 1)
      .select(col("doc_id"), col("blocked"))
    assert(viaRegex.except(viaAc).count() == 0)
    assert(viaAc.except(viaRegex).count() == 0)
    // and the list actually matches something
    assert(viaAc.filter(col("blocked")).count() > 0)
  }
}
