package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language ID, fingerprinting. Quality metrics are native
  * column expressions (codegen'd, no UDF); langid/fingerprint use the
  * deterministic kernels in [[TextFunctions]].
  */
object TextAnalysis {

  /** Whitespace tokens (empty-safe). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: word-piece regex segments
    * (letters / digits / punctuation runs), the usual pre-tokenizer shape. */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?U)(?<=\\W)(?=\\w)|(?<=\\w)(?=\\W)|\\s+"), t => length(t) > 0))

  /** Punctuation character count (native regexp_count). */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "(?U)\\p{Punct}", ""))

  /** Heuristic document quality in [0,1]: combines length band, mean word
    * length plausibility, punctuation ratio, and alpha ratio. Mirrors the
    * usual Gopher/C4-style filters, all as one codegen'd expression. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nChar = length(text).cast("double")
    val meanWordLen = when(nTok > 0, (nChar - nTok + 1) / nTok).otherwise(lit(0.0))
    val punctRatio = when(nChar > 0, punctCount(text) / nChar).otherwise(lit(1.0))
    val alphaRatio = when(nChar > 0,
      length(regexp_replace(text, "(?U)[^\\p{L}]", "")).cast("double") / nChar).otherwise(lit(0.0))
    val lenScore = least(nTok / 50.0, lit(1.0))
    val wordLenScore = when(meanWordLen.between(2.0, 12.0), 1.0).otherwise(0.3)
    val punctScore = when(punctRatio < 0.2, 1.0).otherwise(0.4)
    round(lenScore * 0.4 + wordLenScore * 0.2 + punctScore * 0.2 + alphaRatio * 0.2, 6)
  }

  def languageOf(text: Column): Column = TextFunctions.languageOf(text)

  def fingerprint(text: Column): Column = TextFunctions.fingerprint(text)

  /** Token-bounded chunking with overlap — the context-window packing step
    * of a training pipeline: each document becomes `ceil` chunks of at most
    * `maxTokens` whitespace tokens, consecutive chunks sharing `overlap`
    * tokens. Entirely native expressions (split → transform over a chunk
    * sequence → posexplode): per-row map + generate, no shuffle, no UDF —
    * the plan is a single codegen'd scan-project at any corpus size.
    *
    * Chunk i covers tokens [i*step, i*step + maxTokens) with
    * step = maxTokens - overlap; short/empty documents yield exactly one
    * (possibly empty) chunk so no input row is silently dropped.
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    maxTokens: Int = 64, overlap: Int = 16): DataFrame = {
    require(maxTokens > overlap && overlap >= 0,
      s"need maxTokens > overlap >= 0, got ($maxTokens, $overlap)")
    val step = maxTokens - overlap
    // materialize the token array ONCE per row (the gopherFlags/q207
    // recipe): the chunk transform's lambda otherwise re-evaluates the
    // captured split+filter subtree PER CHUNK ELEMENT (higher-order
    // lambdas are interpreted and re-run captured non-attribute
    // subtrees — the lmBigramScore measurement). A separate projection
    // makes `__toks` an attribute the lambda just reads; values are
    // bit-identical (same expression, evaluated once).
    val pre = df.select(col(idCol), tokens(col(textCol)).as("__toks"))
    val toks = col("__toks")
    val lastChunk = greatest(lit(0),
      ceil((size(toks).cast("double") - maxTokens) / step).cast("int"))
    val chunks = transform(sequence(lit(0), lastChunk), i => {
      val sl = slice(toks, i * step + 1, lit(maxTokens))
      struct(array_join(sl, " ").as("chunk_text"), size(sl).as("n_tok"))
    })
    pre.select(col(idCol), posexplode(chunks).as(Seq("chunk_id", "c")))
      .select(col(idCol), col("chunk_id"),
        col("c.chunk_text").as("chunk_text"), col("c.n_tok").as("n_tok"))
  }

  /** Within-document repetition metrics — the Gopher/MassiveText-style
    * quality signals used to drop boilerplate-heavy pages from training
    * corpora (published rule set: duplicate line fraction, most-frequent
    * n-gram share). Per-document:
    *   dup_line_frac    = 1 - distinct(non-empty lines) / lines
    *   top_bigram_share = count(most frequent word 2-gram) / total 2-grams
    *                      (0.0 for documents with fewer than 2 tokens)
    *
    * Plan: one explode of per-doc bigrams → two-level aggregation keyed by
    * (doc, gram) then doc — partial aggregation applies at both levels, the
    * only shuffle key is (doc_id, gram), and nothing is ever collected per
    * doc into one row except the final counters. Line stats are pure
    * expressions on the scan.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // r16: MAP-ONLY. The old shape exploded per-doc bigrams through a
    // (doc, gram) two-level aggregation and joined the shares back — two
    // exchanges plus a join for a metric that is row-local by definition
    // (one ROW is one DOCUMENT — the DocsStream design note). The
    // codegen'd TopBigramShareExpr kernel counts bigrams in one pass per
    // row; StreamRepetitionSpec already pinned kernel-vs-aggregation
    // value parity (identical token stream, identical max/total math,
    // 0.0 below 2 tokens), so every value is unchanged and the operator
    // now runs at scan speed with zero shuffle at any corpus size
    // (guide §2.4: remove shuffles outright).
    graft.functions.GraftFunctions.registerAll(df.sparkSession)
    // one split+filter per row (the non-codegen higher-order expression
    // was re-evaluated per reference otherwise — see gopherFlags)
    df.select(col(idCol), col(textCol),
        filter(split(col(textCol), "\n"), l => length(trim(l)) > 0)
          .as("__lines"))
      .select(
        col(idCol),
        size(col("__lines")).as("n_lines"),
        when(size(col("__lines")) > 0,
          lit(1.0) - size(array_distinct(col("__lines"))).cast("double") /
            size(col("__lines")))
          .otherwise(0.0).as("dup_line_frac"),
        call_function("graft_top_bigram_share", col(textCol))
          .as("top_bigram_share"))
  }

  /** The published Gopher quality-rule battery (Rae et al. 2021 §A1.1 —
    * the MassiveText filter set), one boolean per rule plus the combined
    * keep decision:
    *
    *   g_word_count : 50 ≤ words ≤ 100 000
    *   g_mean_len   : mean word length in [3, 10]
    *   g_symbol     : (hash + ellipsis) / words ≤ 0.1
    *   g_bullets    : ≤ 90% of lines start with a bullet
    *   g_ellipsis   : ≤ 30% of lines end with an ellipsis
    *   g_alpha      : ≥ 80% of words contain a letter
    *   g_stopwords  : ≥ 2 of the 8 required English stopwords present
    *
    * All rules are native expressions over one scan — per-row map work,
    * zero shuffle, codegen'd end to end; at 100 TB this runs at parquet
    * read speed. Complements [[repetitionStats]] (the repetition half of
    * the same paper's rules, which needs an aggregation). */
  def gopherFlags(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    // materialize the word/line arrays ONCE per row: the downstream rules
    // reference them up to 7×, and higher-order array expressions
    // (filter/transform lambdas) are not whole-stage-codegen'd, so each
    // reference re-split and re-filtered the text (measured: most of
    // q207's per-task time). A separate projection holds the arrays;
    // CollapseProject keeps it (non-cheap aliases used more than once
    // are not inlined), so every rule below reads the computed column.
    // Values are bit-identical — same expressions, evaluated once.
    val pre = df.select(col(idCol), t.as("__t"),
      filter(split(t, "\\s+"), w => length(w) > 0).as("__words"),
      filter(transform(split(t, "\n"), trim(_)),
        l => length(l) > 0).as("__lines"))
    gopherFlagsPre(pre, idCol)
  }

  private def gopherFlagsPre(pre: DataFrame, idCol: String): DataFrame = {
    val t = col("__t")
    val words = col("__words")
    val nWords = size(words).cast("double")
    val meanLen = when(nWords > 0,
      length(concat_ws("", words)).cast("double") / nWords).otherwise(0.0)
    val hashes = (length(t) - length(regexp_replace(t, "#", ""))).cast("double")
    val ellipses = ((length(t) -
      length(regexp_replace(t, "\\.\\.\\.", ""))) / 3).cast("double")
    val symbolRatio = when(nWords > 0, (hashes + ellipses) / nWords).otherwise(1.0)
    val lines = col("__lines")
    val nLines = size(lines).cast("double")
    val bulletFrac = when(nLines > 0,
      size(filter(lines, l => substring(l, 1, 1).isin("•", "-", "*")))
        .cast("double") / nLines).otherwise(0.0)
    val ellipsisFrac = when(nLines > 0,
      size(filter(lines, l => l.endsWith("..."))).cast("double") / nLines)
      .otherwise(0.0)
    val alphaFrac = when(nWords > 0,
      size(filter(words, w => w.rlike("\\p{L}"))).cast("double") / nWords)
      .otherwise(0.0)
    val required = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val lowered = transform(words, lower(_))
    val stopHits = size(filter(array(required.map(lit): _*),
      s => array_contains(lowered, s)))
    val flags = Seq(
      "g_word_count" -> nWords.between(50.0, 100000.0),
      "g_mean_len"   -> meanLen.between(3.0, 10.0),
      "g_symbol"     -> (symbolRatio <= 0.1),
      "g_bullets"    -> (bulletFrac <= 0.9),
      "g_ellipsis"   -> (ellipsisFrac <= 0.3),
      "g_alpha"      -> (alphaFrac >= 0.8),
      "g_stopwords"  -> (stopHits >= 2))
    pre.select(
      (col(idCol) +: size(words).as("n_words") +:
        flags.map { case (n, c) => c.as(n) }) :+
        flags.map(_._2).reduce(_ && _).as("keep"): _*)
  }

  /** Full per-document report. */
  def analyze(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      tokenCount(t).as("n_tokens"),
      subwordCount(t).as("n_subwords"),
      length(t).as("n_chars"),
      qualityScore(t).as("quality"),
      languageOf(t).as("lang_pred"),
      fingerprint(t).as("fingerprint"))
  }

  /** FastText/CCNet-style linear quality classifier over token n-gram
    * features with an EXPLICIT weight vocabulary:
    * p = sigmoid(bias + Σ_g count(g)·w(g)). A shipped quality model is a
    * few thousand weighted n-grams; carrying the vocabulary as a map
    * literal compiles the whole scorer into one codegen'd map-only
    * projection — no explode, no join, no shuffle, no UDF — so at 100 TB
    * it runs at scan speed next to the other per-document metrics.
    * Tokens are lowercased alnum runs; `n = 2` scores word bigrams
    * (features joined with a single space), etc. */
  /** Corpus-trained bigram-LM quality score — the CCNet-lineage
    * perplexity filter (Wenzek et al. 2020, "CCNet: Extracting High
    * Quality Monolingual Datasets from Web Crawl Data" trains a KenLM
    * and keeps low-perplexity documents; here the model is a bigram LM
    * with add-one smoothing trained on the corpus itself, which needs no
    * external model file and is exactly replayable by the oracle).
    * Per document: avg negative log-likelihood of its first `maxTokens`
    * lowercase alpha tokens under p(w|prev) = (c2+1)/(c1+V). High
    * `avg_nll` = surprising/garbled text, low = fluent-for-this-corpus —
    * the split CCNet thresholds on.
    *
    * Scale: two grouped counts over narrow (prev, cur) pairs (≤ maxTokens
    * rows per doc — text bytes never shuffle beyond tokenization) + one
    * join of the doc bigrams against the count tables; the model tables
    * are bounded by distinct-bigram count, not corpus size. Per-position
    * terms are rounded to 6 decimals and summed as DECIMAL(18,9), so the
    * aggregate is exact and order-independent — bit-stable across
    * partitionings, retries, and engines. */
  def lmBigramScore(df: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text",
                    maxTokens: Int = 64): DataFrame = {
    val toks = slice(
      filter(split(lower(col(textCol)), "[^a-z]+"), t => t =!= ""),
      1, maxTokens)
    val docs = df.select(col(idCol).as("doc_id"), toks.as("toks"))
    // bigrams via arrays_zip of two shifted slices: `toks` is referenced
    // a constant number of times per ROW. (A transform(sequence(...),
    // i -> element_at(toks, i)) lambda re-evaluates the captured `toks`
    // subtree PER ELEMENT once CollapseProject inlines the tokenization
    // into it — measured 20× slower on the documents fixture.)
    val nb = greatest(size(col("toks")) - 1, lit(0))
    val bi = docs
      .select(col("doc_id"),
        explode(arrays_zip(
          slice(col("toks"), lit(1), nb),
          slice(col("toks"), lit(2), nb))).as("b"))
      .select(col("doc_id"), col("b").getField("0").as("prev"),
        col("b").getField("1").as("cur"))
    val c2 = bi.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("n2"))
    // n1 (rows per prev) is exactly Σ n2 over prev — derive it from the
    // c2 table instead of re-running the tokenize+explode pass over the
    // corpus a second time (guide §2.3 aggregate-before-shuffle; values
    // identical integers by construction)
    val c1 = c2.groupBy(col("prev")).agg(sum(col("n2")).as("n1"))
    val vocab = docs.select(explode(col("toks")).as("t"))
      .agg(countDistinct(col("t")).as("vsz"))
    bi.join(c2, Seq("prev", "cur")).join(c1, Seq("prev")).crossJoin(vocab)
      .select(col("doc_id"),
        round(-log((col("n2") + lit(1.0)) / (col("n1") + col("vsz"))), 6)
          .cast("decimal(18,9)").as("nll"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("nll")).cast("double"), 4).as("avg_nll"))
  }

  def scoreLinear(df: DataFrame, textCol: String,
                  weights: Map[String, Double], bias: Double = 0.0,
                  n: Int = 1, outCol: String = "quality_prob"): DataFrame = {
    require(n >= 1, "n-gram order must be >= 1")
    require(weights.nonEmpty, "empty weight vocabulary")
    val toks = filter(split(lower(col(textCol)), "[^\\p{L}\\p{N}]+"),
      t => length(t) > 0)
    val grams =
      if (n == 1) toks
      else when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)))
        .otherwise(array().cast("array<string>"))
    val wmap = typedLit(weights)
    val z = lit(bias) + aggregate(grams, lit(0.0),
      (acc, g) => acc + coalesce(element_at(wmap, g), lit(0.0)))
    df.withColumn(outCol, lit(1.0) / (lit(1.0) + exp(-z)))
  }

  /** DSIR-style importance scoring (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023): score every
    * raw-pool document by the log importance weight of a target-domain
    * bag-of-words model against the raw-pool model,
    * log w(x) = Σ_t [ln p_target(t) − ln p_raw(t)], both unigram models
    * with add-one smoothing over the joint vocabulary. The paper then
    * resamples via Gumbel top-k; the deterministic top-m-by-weight variant
    * implemented by callers is its no-noise ablation (and the GPT-3-style
    * heuristic-classification selection), which keeps the operator exactly
    * oracle-replayable — the model is nothing but grouped counts.
    *
    * `targetPred` marks the target-domain rows INSIDE `df` (e.g.
    * `col("lang") === "en"`); every non-target row is scored. Like
    * [[lmBigramScore]], per-token terms round to 6 decimals and sum as
    * DECIMAL(18,9), so the score is order-independent and bit-stable
    * across partitionings and engines.
    *
    * Scale: the two count tables are vocabulary-sized grouped aggregates
    * (never corpus-sized), the totals row is one aggregate pass, and the
    * scoring join shuffles only (doc_id, token) pairs capped at
    * `maxTokens` per document — text bytes never shuffle. Nothing is
    * collected to the driver; at 100 TB the vocab tables stay distributed
    * (sort-merge join on the token key) or broadcast if small. */
  def dsirScore(df: DataFrame, targetPred: Column,
                idCol: String = "doc_id", textCol: String = "text",
                maxTokens: Int = 64): DataFrame = {
    val toks = slice(
      filter(split(lower(col(textCol)), "[^a-z]+"), t => t =!= ""),
      1, maxTokens)
    val tok = df
      .select(col(idCol).as("doc_id"), targetPred.as("is_target"),
        explode(toks).as("t"))
    val ct = tok.filter(col("is_target"))
      .groupBy(col("t")).agg(count(lit(1)).as("nt_tok"))
    val cr = tok.groupBy(col("t")).agg(count(lit(1)).as("nr_tok"))
    val totals = tok.agg(
      sum(when(col("is_target"), 1L).otherwise(0L)).as("nt"),
      count(lit(1)).as("nr"),
      countDistinct(col("t")).as("v"))
    tok.filter(!col("is_target"))
      .join(ct, Seq("t"), "left").join(cr, Seq("t")).crossJoin(totals)
      .select(col("doc_id"),
        round(
          log((coalesce(col("nt_tok"), lit(0L)) + lit(1.0)) /
              (col("nt") + col("v"))) -
          log((col("nr_tok") + lit(1.0)) / (col("nr") + col("v"))), 6)
          .cast("decimal(18,9)").as("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("w")).as("log_weight"))
  }

  /** DSIR's actual sampler (Xie et al. 2023 §2): draw m documents
    * without replacement from softmax(log w) via the Gumbel top-k trick
    * — key_i = log w_i + g_i with g_i ~ Gumbel(0, 1) i.i.d., keep the m
    * largest keys ([[dsirScore]]'s deterministic top-m is this sampler's
    * no-noise ablation). The noise is derived, never drawn at eval time:
    * u_i = (first-60-bits-of md5("<seed>-<doc_id>") + 0.5) / 2^60
    * ∈ (0, 1) strictly, g_i = −ln(−ln u_i) — deterministic per
    * (seed, doc_id) and computable identically by any engine with md5
    * (the hash gate needs DuckDB to replay the exact noise). g rounds to
    * 6 decimals and joins the DECIMAL(18,9) log-weight, so the ranking
    * key is an exact decimal — order-independent and bit-stable across
    * partitionings and engines (the q229/q230 discipline).
    *
    * Scale: adds one map-side expression (md5 + two ln) and a global
    * top-m to [[dsirScore]]'s plan — no extra shuffle; the top-m is a
    * TakeOrdered over per-partition heaps, never a full sort. */
  def dsirGumbelTopK(df: DataFrame, targetPred: Column, seed: Long, m: Int,
                     idCol: String = "doc_id", textCol: String = "text",
                     maxTokens: Int = 64): DataFrame = {
    val scored = dsirScore(df, targetPred, idCol, textCol, maxTokens)
    val hex = substring(
      md5(concat_ws("-", lit(seed.toString), col("doc_id").cast("string"))),
      1, 15)
    // 15 hex digits = 60 bits; +0.5 keeps u off both endpoints so the
    // double Gumbel transform never hits ±Inf
    val u = (conv(hex, 16, 10).cast("double") + lit(0.5)) /
      lit(1152921504606846976.0) // 2^60
    val g = round(-log(-log(u)), 6).cast("decimal(18,9)")
    scored
      .withColumn("gumbel_key", col("log_weight") + g)
      .orderBy(col("gumbel_key").desc, col("doc_id"))
      .limit(m)
  }

  /** C4-style blocklist page filter (Raffel et al. 2020 §2.2: drop any
    * page containing a token on the "bad words" list). Matching is
    * token-boundary and case-insensitive; the whole list compiles to
    * ONE alternation regex evaluated by the codegen'd `rlike` —
    * map-only, zero shuffle, the list rides in the instruction stream;
    * past `acThreshold` terms the list compiles instead to a codegen'd
    * Aho–Corasick expression (one pass per document regardless of list
    * size — typical blocklists are a few hundred terms and the regex
    * wins, 10^4+-term multilingual lists need the automaton).
    * Returns the input plus a `blocked` flag — `filter(!blocked)` is
    * the scrub. */
  def blocklistFlag(df: DataFrame, words: Seq[String],
                    textCol: String = "text",
                    acThreshold: Int = 256): DataFrame = {
    require(words.nonEmpty, "empty blocklist")
    if (words.size <= acThreshold) {
      // (?iu): UNICODE_CASE keeps the alternation's folding identical to
      // the automaton path's java-regex simple fold for non-ASCII terms
      // (multilingual blocklists); ASCII behavior is unchanged
      val pat = words.map(java.util.regex.Pattern.quote)
        .mkString("(?iu)(^|[^a-z0-9])(", "|", ")([^a-z0-9]|$)")
      df.withColumn("blocked", col(textCol).rlike(pat))
    } else {
      // large lists: one Aho–Corasick pass per document instead of the
      // regex alternation's per-position scan over 10^4+ branches. The
      // automaton is codegen'd (plans.BlocklistMatchExpr holds the
      // flat-array automaton as a plan reference object), so this path
      // stays inside whole-stage codegen like the rlike path — no
      // Scala-UDF boxing/serialization layer. Identical boundary and
      // folding semantics, differential-tested in AhoCorasickSpec.
      val id = BlocklistInterner.intern(words)
      registerBlocklistFn(df.sparkSession)
      df.withColumn("blocked",
        call_function("graft_blocklist", col(textCol), lit(id)))
    }
  }

  /** Automaton handles for [[blocklistFlag]]'s codegen path: expressions
    * carry a tiny interned id through the SQL function registry (the
    * MatchText.AnalyzerInterner pattern) and resolve the shared automaton
    * at plan build — one build per distinct word list per JVM. */
  private object BlocklistInterner {
    private val byWords = new java.util.concurrent.ConcurrentHashMap[
      Seq[String], Integer]()
    private val byId = new java.util.concurrent.ConcurrentHashMap[
      Integer, graft.functions.AhoCorasick]()
    private val seq = new java.util.concurrent.atomic.AtomicInteger(0)
    def intern(words: Seq[String]): Int =
      byWords.computeIfAbsent(words.toList, _ => {
        val n = Integer.valueOf(seq.incrementAndGet())
        byId.put(n, new graft.functions.AhoCorasick(words))
        n
      }).intValue()
    def lookup(id: Int): graft.functions.AhoCorasick = {
      val ac = byId.get(Integer.valueOf(id))
      require(ac != null, s"unknown blocklist handle $id")
      ac
    }
  }

  /** Idempotent registration of the `graft_blocklist` expression builder. */
  private def registerBlocklistFn(
      spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_blocklist", { exprs =>
        val id = exprs(1).eval(null) match {
          case i: Int  => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"graft_blocklist expects a literal list handle, got $other")
        }
        graft.plans.BlocklistMatchExpr(exprs(0), BlocklistInterner.lookup(id))
      }, "scala_udf")

  /** CCNet-style perplexity tiering (Wenzek et al. 2020 §4.3): rank
    * documents by LM score within each `byCol` partition (language in
    * the paper) and split into `buckets` equal-frequency tiers —
    * head/middle/tail at buckets = 3, the quality tiers CCNet samples
    * from downstream. Ranking key is [[lmBigramScore]]'s bit-stable
    * (avg_nll, doc_id), so tier assignment is deterministic and
    * engine-replayable; documents with <2 in-vocab tokens have no
    * bigram evidence and are excluded (as in the paper's LM scoring).
    *
    * Scale: the LM is two vocab-sized grouped counts ([[lmBigramScore]]);
    * tiering adds ONE window pass over per-document rows partitioned by
    * `byCol` — a shuffle proportional to document count, not tokens. */
  def perplexityBuckets(df: DataFrame, byCol: String, buckets: Int = 3,
                        idCol: String = "doc_id", textCol: String = "text",
                        maxTokens: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = lmBigramScore(df, idCol, textCol, maxTokens)
    val w = Window.partitionBy(col(byCol))
      .orderBy(col("avg_nll"), col("doc_id"))
    df.select(col(idCol).as("doc_id"), col(byCol))
      .join(scored, Seq("doc_id"))
      .withColumn("tier", ntile(buckets).over(w))
      .select(col("doc_id"), col(byCol), col("avg_nll"), col("tier"))
  }
}
