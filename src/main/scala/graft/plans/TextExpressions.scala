package graft.plans

import graft.functions.TextFunctions
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd text → MinHash LSH band keys, fused into one expression.
  *
  * The dedup hot path previously ran TWO Scala UDFs per document (signature,
  * then band keys), each paying a serialization round-trip and breaking
  * whole-stage codegen. This expression calls the same deterministic kernel
  * (`TextFunctions.minhashBandKeys` — splitmix64/FNV family, shingle-dedup
  * optimization) directly from generated code: the 128-long signature never
  * leaves the local frame, and the projection stays inside the codegen span.
  * Registered as `graft_minhash_bands` by `GraftFunctions.registerAll`.
  */
case class MinHashBandsExpr(child: Expression, shingleSize: Int,
                            numHashes: Int, bands: Int)
    extends UnaryExpression {

  override def prettyName: String = "graft_minhash_bands"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextFunctions.minhashBandKeys(
      input.asInstanceOf[UTF8String].toString, shingleSize, numHashes, bands))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.TextFunctions.minhashBandKeys(
         |    $c.toString(), $shingleSize, $numHashes, $bands));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd text → SORTED distinct char-shingle hash array
  * (`TextFunctions.shingleArray` kernel) — the pre-shingle projection for
  * near-dup pair verification: each document's shingle set materializes
  * ONCE before the candidate join, so the verify stage merge-counts two
  * sorted arrays ([[JaccardSortedExpr]]) instead of re-normalizing and
  * re-hashing both texts per candidate pair (guide §4; the r15
  * single-pass-tokenization recipe applied to the dedup family).
  * Registered as `graft_shingles`. */
case class ShingleArrayExpr(child: Expression, shingleSize: Int)
    extends UnaryExpression {

  override def prettyName: String = "graft_shingles"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextFunctions.shingleArray(
      input.asInstanceOf[UTF8String].toString, shingleSize))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.TextFunctions.shingleArray(
         |    $c.toString(), $shingleSize));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd exact Jaccard over two SORTED distinct long arrays
  * (`TextFunctions.jaccardSortedLongs` merge-count kernel — zero
  * allocation per pair). The verify-stage companion of
  * [[ShingleArrayExpr]]; agrees bit-for-bit with
  * `TextFunctions.shingleJaccard` over the same shingle sets.
  * Registered as `graft_jaccard_sorted`. */
case class JaccardSortedExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_jaccard_sorted"
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _                      => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>) arguments")

  override def nullSafeEval(a: Any, b: Any): Any =
    TextFunctions.jaccardSortedLongs(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextFunctions.jaccardSortedLongs($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd 64-bit SimHash (`TextFunctions.simhash64` kernel). Registered
  * as `graft_simhash`. */
case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_simhash"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    TextFunctions.simhash64(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextFunctions.simhash64($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd most-frequent-bigram share
  * (`TextFunctions.topBigramShare` kernel) — the row-local form of the
  * Gopher repetition metric: one call per document, zero shuffle, values
  * identical to the old (doc, gram) two-level aggregation
  * (StreamRepetitionSpec parity). Registered as
  * `graft_top_bigram_share`; shared by the batch `repetitionStats` and
  * the streaming `DocsStream.docRepetitionMetrics`. */
case class TopBigramShareExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_top_bigram_share"
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  // null text maps to 0.0 at the REGISTRATION wrapper (coalesce) — the
  // metric's convention; the expression itself is standard null-safe
  override def nullSafeEval(input: Any): Any =
    TextFunctions.topBigramShare(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextFunctions.topBigramShare($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd rolling 64-bit document fingerprint
  * (`TextFunctions.fingerprint64` kernel). Registered as
  * `graft_fingerprint`. */
case class FingerprintExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_fingerprint"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    TextFunctions.fingerprint64(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextFunctions.fingerprint64($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd BLAKE3 hex digest (`graft.functions.Blake3` kernel — public
  * BLAKE3 spec; digests pinned to the reference's HashFunctionsTest
  * vectors). Registered as `blake3`, completing the reference hash family
  * (md5/sha1 are Spark built-ins). */
case class Blake3Expr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "blake3"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.functions.Blake3.hexDigest(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.Blake3.hexDigest($c.toString()));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd mojibake repair (`TextFunctions.repairMojibake` kernel —
  * conservative windows-1252↔UTF-8 round-trip repair, the core published
  * ftfy heuristic over the WHATWG encoding tables). Map-only: zero shuffle
  * at any scale; the kernel bails on the first non-cp1252-mappable char so
  * clean non-Latin corpora pay one scan of the char array. Registered as
  * `repair_mojibake`. */
case class MojibakeRepairExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "repair_mojibake"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      TextFunctions.repairMojibake(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.TextFunctions.repairMojibake($c.toString()));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd Unicode normalization (`TextFunctions.unicodeNormalize` —
  * java.text.Normalizer, UAX #15): NFC/NFD/NFKC/NFKD selected by the
  * second argument. Map-only, zero shuffle — the curation-standard
  * normalize-before-hash pass (composed vs decomposed spellings hash
  * identically after NFC; NFKC folds ligatures/fullwidth/circled
  * forms). Registered as `unicode_normalize(text, 'NFC')`. */
case class UnicodeNormalizeExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "unicode_normalize"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string) arguments")

  override def nullSafeEval(s: Any, f: Any): Any =
    UTF8String.fromString(TextFunctions.unicodeNormalize(
      s.asInstanceOf[UTF8String].toString,
      f.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, f) =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.TextFunctions.unicodeNormalize(
         |    $c.toString(), $f.toString()));""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd fused analyzer chain (round-5 close of the "gram pipeline
  * runs interpreted" note): the ENTIRE configured analyzer — char filters
  * → tokenize → case fold → ascii fold → length/stop filters → stemmer →
  * edge-grams → shingles — executes as ONE kernel call per row
  * (`MatchText.evalTokens`, the same code the driver-side query-term path
  * runs, so Column results and `Analyzer.tokens` agree BY CONSTRUCTION).
  * The compositional Column path this replaces chained 5-8 higher-order
  * array expressions, each materializing an intermediate array and
  * evaluating its lambda interpreted; here the token list stays a local
  * Scala value until the final ArrayData. The analyzer config rides the
  * expression as a serialized field (NOT a driver-side registry id), so
  * executor JVMs in a real cluster evaluate it locally. Registered as
  * `graft_analyze` on demand by `MatchText.Analyzer.apply`. */
case class AnalyzerChainExpr(child: Expression,
                             analyzer: graft.operators.MatchText.Analyzer)
    extends UnaryExpression {
  override def prettyName: String = "graft_analyze"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    graft.operators.MatchText.evalTokens(analyzer, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftAnalyzer", analyzer,
      "graft.operators.MatchText.Analyzer")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.operators.MatchText.evalTokens($ref, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd Aho–Corasick blocklist membership
  * (`TextAnalysis.blocklistFlag`'s >`acThreshold`-term path): the
  * flat-array automaton rides the plan as a reference object —
  * `ctx.addReferenceObj`, the [[AnalyzerChainExpr]] pattern — so the
  * probe stays inside whole-stage codegen with no Scala-UDF
  * null-boxing/serialization layer, exactly like the ≤threshold regex
  * path's `rlike`. Map-only at any scale; the automaton broadcasts
  * once per executor inside the serialized plan. Boundary and folding
  * semantics are [[graft.functions.AhoCorasick]]'s, differential-gated
  * against the regex alternation in [[graft.AhoCorasickSpec]]. */
case class BlocklistMatchExpr(child: Expression,
                              automaton: graft.functions.AhoCorasick)
    extends UnaryExpression {
  override def prettyName: String = "graft_blocklist_match"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    automaton.containsAny(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBlocklistAc", automaton,
      "graft.functions.AhoCorasick")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.containsAny($c.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
