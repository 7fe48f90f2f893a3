package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's lpad/rpad (scalar/string/StringPaddingFunction.java),
  * whose edges differ from Spark's built-ins:
  *  - len > 50000 raises "len argument exceeds predefined limit of
  *    50000" (the reference's DoS guard — kept, it is part of the
  *    observable surface);
  *  - len <= 0, or both str and fill empty → '' ;
  *  - str already >= len → prefix of len (TRUNCATES, like Spark);
  *  - fill EMPTY with str shorter than len → str unchanged (Spark's
  *    UTF8String.lpad loops over an empty pad differently; DuckDB
  *    raises "Insufficient padding" here — which is why the catalog
  *    entry replays these arms as golden VALUES);
  *  - otherwise cyclic fill, left or right.
  * Char-based like the reference (Java char arrays), via a String
  * round-trip — pad strings are tiny plan literals, the per-row cost is
  * one allocation, and the operator stays map-only. */
object GraftPad {
  val LenLimit = 50000

  /** Entry point takes the len operand as LONG and range-checks it
    * LOUDLY before narrowing — a raw `(int)` cast silently wrapped
    * BIGINT lengths past int range (e.g. 2^32 + 49999 padded quietly
    * to 49999), where the reference's integer implicit cast raises
    * "integer value out of range" before its 50000 guard (ADVICE r15). */
  def pad(str: UTF8String, len: Long, fill: UTF8String,
          left: Boolean): UTF8String = {
    if (len > Int.MaxValue || len < Int.MinValue)
      throw new IllegalArgumentException(
        s"integer value out of range: $len")
    pad(str, len.toInt, fill, left)
  }

  def pad(str: UTF8String, len: Int, fill: UTF8String,
          left: Boolean): UTF8String = {
    if (len > LenLimit)
      throw new IllegalArgumentException(
        s"len argument exceeds predefined limit of $LenLimit")
    val s = str.toString
    val f = fill.toString
    if (len <= 0 || (s.isEmpty && f.isEmpty))
      return UTF8String.EMPTY_UTF8
    if (s.length >= len) return UTF8String.fromString(s.substring(0, len))
    if (f.isEmpty) return str
    val buffer = new Array[Char](len)
    val padLen = len - s.length
    if (left) {
      s.getChars(0, s.length, buffer, padLen)
      var i = 0
      while (i < padLen) { buffer(i) = f.charAt(i % f.length); i += 1 }
    } else {
      s.getChars(0, s.length, buffer, 0)
      var i = s.length
      var j = 0
      while (i < len) { buffer(i) = f.charAt(j % f.length); i += 1; j += 1 }
    }
    UTF8String.fromString(String.valueOf(buffer))
  }
}

/** `graft_lpad(str, len[, fill])` / `graft_rpad(str, len[, fill])` —
  * strict null on every argument (the reference returns NULL if any of
  * str/len/fill is null), default fill ' '. Codegen'd. */
case class GraftPadExpr(first: Expression, second: Expression,
                        third: Expression, leftPad: Boolean)
    extends TernaryExpression {
  override def prettyName: String = if (leftPad) "graft_lpad" else "graft_rpad"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (first.dataType == StringType || first.dataType == NullType) &&
      (Seq[DataType](IntegerType, LongType, ShortType, ByteType, NullType)
        .contains(second.dataType)) &&
      (third.dataType == StringType || third.dataType == NullType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, int, string) arguments")
  }
  override def nullSafeEval(s: Any, l: Any, f: Any): Any =
    GraftPad.pad(s.asInstanceOf[UTF8String],
      l.asInstanceOf[Number].longValue(), f.asInstanceOf[UTF8String], leftPad)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, l, f) =>
      s"graft.plans.GraftPad.pad($s, (long) $l, $f, $leftPad)")
  override protected def withNewChildrenInternal(
      f1: Expression, f2: Expression, f3: Expression): Expression =
    copy(first = f1, second = f2, third = f3)
}
