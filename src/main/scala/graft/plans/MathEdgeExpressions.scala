package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** The reference's math-function edge semantics (server/src/main/java/
  * io/crate/expression/scalar/arithmetic/), where Spark's builtins
  * diverge observably:
  *  - `log(x)` is BASE 10 (LogFunction registers Math.log10 under the
  *    name `log`; Spark's log is the natural log) and `log(x, b)` takes
  *    the VALUE FIRST (Spark's two-arg log is (base, x));
  *  - log/ln raise LOUDLY on non-positive arguments ("given arguments
  *    would result in: '-Infinity'/'NaN'"; Spark returns NULL) and
  *    log(x, 1) raises the division-by-zero error;
  *  - `sqrt` of a negative raises "cannot take square root of a
  *    negative number" (Spark: NaN);
  *  - single-argument `round` is java.lang.Math.round — ties toward
  *    POSITIVE INFINITY (round(-2.5) is -2 where Spark's HALF_UP says
  *    -3) with an INTEGRAL return type (float→int, double→long,
  *    RoundFunction.java:48). Two-argument round keeps Spark's builtin
  *    (both engines are BigDecimal HALF_UP there). */
object CrateMath {

  private def validate(v: Double, caller: String): Double = {
    if (v == 0.0)
      throw new IllegalArgumentException(
        s"$caller: given arguments would result in: '-Infinity'")
    if (v < 0.0)
      throw new IllegalArgumentException(
        s"$caller: given arguments would result in: 'NaN'")
    v
  }

  def sqrt(v: Double): Double = {
    if (v < 0)
      throw new IllegalArgumentException(
        "cannot take square root of a negative number")
    Math.sqrt(v)
  }

  def log10(v: Double): Double = Math.log10(validate(v, "log(x)"))

  def ln(v: Double): Double = Math.log(validate(v, "ln(x)"))

  def logB(x: Double, b: Double): Double = {
    validate(x, "log(x, b)")
    validate(b, "log(x, b)")
    val den = Math.log(b)
    if (den == 0)
      throw new IllegalArgumentException(
        "log(x, b): given 'base' would result in a division by zero.")
    Math.log(x) / den
  }

  def roundF(v: Float): Int = Math.round(v)
  def roundD(v: Double): Long = Math.round(v)
}

/** Loud unary math (`sqrt` / `log` / `ln`) over a double child; `fn`
  * comes only from the registration site (fixed strings). Codegen'd. */
case class CrateMathExpr(child: Expression, fn: String)
    extends UnaryExpression {
  require(Set("sqrt", "log10", "ln").contains(fn), s"unknown fn $fn")
  override def prettyName: String = if (fn == "log10") "log" else fn
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType || child.dataType == NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double argument")
  override def nullSafeEval(input: Any): Any = fn match {
    case "sqrt"  => CrateMath.sqrt(input.asInstanceOf[Double])
    case "log10" => CrateMath.log10(input.asInstanceOf[Double])
    case "ln"    => CrateMath.ln(input.asInstanceOf[Double])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CrateMath.$fn($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `log(x, b)` — the reference's (value, base) order with loud
  * validation. Codegen'd. */
case class CrateLogBaseExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "log"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(left, right).forall(e => e.dataType == DoubleType ||
        e.dataType == NullType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "log(x, b) requires double arguments")
  override def nullSafeEval(a: Any, b: Any): Any =
    CrateMath.logB(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.CrateMath.logB($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Single-argument `round` — Math.round for float/double (ties toward
  * +∞, integral return); every other input type keeps Spark's Round
  * (identical semantics there). */
case class CrateRoundExpr(child: Expression)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable {
  override def prettyName: String = "round"
  override def children: Seq[Expression] = Seq(child)
  override lazy val replacement: Expression = child.dataType match {
    case FloatType  => CrateRoundPrim(child, toLong = false)
    case DoubleType => CrateRoundPrim(child, toLong = true)
    case _ =>
      org.apache.spark.sql.catalyst.expressions.Round(child, Literal(0))
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

case class CrateRoundPrim(child: Expression, toLong: Boolean)
    extends UnaryExpression {
  override def prettyName: String = "round"
  override def dataType: DataType = if (toLong) LongType else IntegerType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    if (toLong) CrateMath.roundD(input.asInstanceOf[Double])
    else CrateMath.roundF(input.asInstanceOf[Float])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (toLong)
      defineCodeGen(ctx, ev, c => s"graft.plans.CrateMath.roundD($c)")
    else defineCodeGen(ctx, ev, c => s"graft.plans.CrateMath.roundF($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
