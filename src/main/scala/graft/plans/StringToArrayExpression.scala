package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PG `string_to_array(str, sep[, null_string])` (reference
  * StringToArrayFunction.java) — r14: adds the 3-arg form the round-3
  * UDF missed, as a native expression:
  *  - str NULL → NULL (even when the other arguments are null);
  *  - str ''  → [] (any separator);
  *  - sep NULL → one element per CHARACTER;
  *  - sep ''  → the whole string as one element;
  *  - otherwise split on the LITERAL separator, keeping empties;
  *  - null_string: every element equal to it becomes SQL NULL — a NULL
  *    null_string means NO substitution (the function is deliberately
  *    NOT strict on this argument, per the reference's
  *    test_null_null_string_parameter). */
case class StringToArrayExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.size == 2 || children.size == 3,
    "string_to_array takes 2 or 3 arguments")
  override def prettyName: String = "string_to_array"
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(e =>
        e.dataType == StringType || e.dataType == NullType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string arguments")
  override def eval(input: InternalRow): Any = {
    val sv = children(0).eval(input)
    if (sv == null) return null
    val s = sv.asInstanceOf[UTF8String].toString
    val sepV = children(1).eval(input)
    val sep = if (sepV == null) null else sepV.asInstanceOf[UTF8String].toString
    val nullV = if (children.size == 3) children(2).eval(input) else null
    val nullStr =
      if (nullV == null) null else nullV.asInstanceOf[UTF8String].toString
    val parts: Seq[String] =
      if (s.isEmpty) Seq.empty
      else if (sep == null) s.map(_.toString)
      else if (sep.isEmpty) Seq(s)
      else s.split(java.util.regex.Pattern.quote(sep), -1).toSeq
    new GenericArrayData(parts.map { p =>
      if (nullStr != null && p == nullStr) null
      else UTF8String.fromString(p)
    }.toArray[Any])
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
