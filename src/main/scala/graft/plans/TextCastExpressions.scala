package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, If, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** The reference's value→TEXT rendering (StringType.implicitCast /
  * CharacterTypeTest): identical to Spark's string cast EXCEPT booleans,
  * which render PG-style as 't'/'f' (StringTypeTest
  * .test_implicit_cast_boolean_to_text — Spark says "true"/"false").
  * `x::text` / `x::varchar` / `CAST(x AS text)` route here via Dialect;
  * varchar(n)/char(n) wrap this with the reference's truncate/pad
  * (StringType.explicitCast truncates overflow, CharacterType blank-
  * pads). Codegen delegates to the branch-resolved inner expression, so
  * the non-boolean path keeps Cast's own generated code. */
case class ToTextExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_to_text"
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  private lazy val inner: Expression = child.dataType match {
    case BooleanType => If(child, Literal("t"), Literal("f"))
    case StringType  => child
    case _           => Cast(child, StringType, Some("UTC"))
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    inner.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = inner.genCode(ctx)
    ev.copy(code = code.code, isNull = code.isNull, value = code.value)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
