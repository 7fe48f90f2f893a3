package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Reference string scalars whose edges Spark's built-ins get wrong —
  * round-15 conformance gaps found by porting the remaining reference
  * string suites (StringLeftRightFunctionTest, ChrFunctionTest,
  * StringSplitPartFunctionTest):
  *
  *  - left/right with NEGATIVE lengths are PG's all-but-N semantics
  *    (scalar/string/StringLeftRightFunction.java: `left(s, -3)` drops
  *    the last 3 chars, `right(s, -6)` drops the first 6), where
  *    Spark's builtins return ''.
  *  - chr() is loud outside [1, 0x10FFFF] with the reference's exact
  *    messages (ChrFunction.java: 0 → "null character not permitted",
  *    negative/too-large → "requested character too large for
  *    encoding: N"), where Spark's chr wraps modulo 256 and maps
  *    negatives to ''. The accepted value renders through the
  *    reference's own `(char)` narrowing — BMP semantics, ported
  *    faithfully.
  *  - split_part() rejects index < 1 loudly and treats an EMPTY
  *    delimiter as no-split (index 1 → whole text, else '') per
  *    StringSplitPartFunction.java, where Spark's builtin accepts
  *    negative (from-the-end) indexes and splits '' into characters.
  *
  * All char-based (Java String) like the reference; map-only scalars,
  * codegen'd via the static helpers below. */
object GraftStringEdges {

  /** StringLeftRightFunction.left — the evaluate wrapper's
    * `len == 0 || str.isEmpty() → ""` guard included */
  def left(str: UTF8String, len: Int): UTF8String = {
    val s = str.toString
    if (len == 0 || s.isEmpty) return UTF8String.EMPTY_UTF8
    if (len > 0)
      return UTF8String.fromString(s.substring(0, math.min(len, s.length)))
    val finalLen = s.length + len
    if (finalLen > 0) UTF8String.fromString(s.substring(0, finalLen))
    else UTF8String.EMPTY_UTF8
  }

  /** StringLeftRightFunction.right — same zero/empty guard */
  def right(str: UTF8String, len: Int): UTF8String = {
    val s = str.toString
    if (len == 0 || s.isEmpty) return UTF8String.EMPTY_UTF8
    if (len < 0)
      return UTF8String.fromString(s.substring(math.min(-len, s.length)))
    val finalLen = s.length - len
    if (finalLen <= 0) str
    else UTF8String.fromString(s.substring(finalLen))
  }

  /** ChrFunction.evaluate — loud range, reference messages verbatim */
  def chr(value: Int): UTF8String = {
    if (value == 0)
      throw new IllegalArgumentException("null character not permitted")
    if (value > 0x0010ffff || value < 0)
      throw new IllegalArgumentException(
        s"requested character too large for encoding: $value")
    UTF8String.fromString(String.valueOf(value.toChar))
  }

  /** StringSplitPartFunction.evaluate */
  def splitPart(text: UTF8String, delimiter: UTF8String, index: Int): UTF8String = {
    if (index < 1)
      throw new IllegalArgumentException(
        "index in split_part must be greater than zero")
    val t = text.toString
    val d = delimiter.toString
    if (d.isEmpty)
      return if (index == 1) text else UTF8String.EMPTY_UTF8
    var startIndex = 0
    var i = 1
    while (i < index) {
      val pos = t.indexOf(d, startIndex)
      if (pos < 0) return UTF8String.EMPTY_UTF8
      startIndex = pos + d.length
      i += 1
    }
    var endIndex = t.indexOf(d, startIndex)
    if (endIndex < 0) endIndex = t.length
    UTF8String.fromString(t.substring(startIndex, endIndex))
  }
}

/** `left(str, len)` / `right(str, len)` with the reference's negative-
  * length semantics; strict nulls on both arguments. */
case class GraftLeftRightExpr(left: Expression, right: Expression,
                              leftSide: Boolean)
    extends BinaryExpression {
  override def prettyName: String = if (leftSide) "left" else "right"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (left.dataType == StringType || left.dataType == NullType) &&
      (Seq[DataType](IntegerType, LongType, ShortType, ByteType, NullType)
        .contains(right.dataType))
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, int) arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def nullSafeEval(s: Any, l: Any): Any =
    if (leftSide)
      GraftStringEdges.left(s.asInstanceOf[UTF8String],
        l.asInstanceOf[Number].intValue())
    else
      GraftStringEdges.right(s.asInstanceOf[UTF8String],
        l.asInstanceOf[Number].intValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, l) =>
      s"graft.plans.GraftStringEdges.${if (leftSide) "left" else "right"}($s, (int) $l)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** `chr(int)` — the reference's loud-range code-point render. */
case class GraftChrExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "chr"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq[DataType](IntegerType, LongType, ShortType, ByteType, NullType)
      .contains(child.dataType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"chr requires an integer argument, got ${child.dataType.simpleString}")
  }
  override def nullSafeEval(v: Any): Any =
    GraftStringEdges.chr(v.asInstanceOf[Number].intValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.plans.GraftStringEdges.chr((int) $v)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `split_part(text, delimiter, index)` — the reference's 1-based,
  * loud-on-nonpositive, empty-delimiter-is-no-split contract; strict
  * nulls on all three arguments. */
case class GraftSplitPartExpr(first: Expression, second: Expression,
                              third: Expression)
    extends TernaryExpression {
  override def prettyName: String = "split_part"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (first.dataType == StringType || first.dataType == NullType) &&
      (second.dataType == StringType || second.dataType == NullType) &&
      (Seq[DataType](IntegerType, LongType, ShortType, ByteType, NullType)
        .contains(third.dataType))
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "split_part requires (string, string, int) arguments")
  }
  override def nullSafeEval(t: Any, d: Any, i: Any): Any =
    GraftStringEdges.splitPart(t.asInstanceOf[UTF8String],
      d.asInstanceOf[UTF8String], i.asInstanceOf[Number].intValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, d, i) =>
      s"graft.plans.GraftStringEdges.splitPart($t, $d, (int) $i)")
  override protected def withNewChildrenInternal(
      f1: Expression, f2: Expression, f3: Expression): Expression =
    copy(first = f1, second = f2, third = f3)
}
