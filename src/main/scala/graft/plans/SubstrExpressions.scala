package graft.plans

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's substr/substring (server/src/main/java/io/crate/
  * expression/scalar/SubstrFunction.java), which Spark's builtin
  * diverges from on the edges:
  *  - (string, int[, int]) CLAMPS: begin ≤ 1 clamps to the string
  *    start — substr('hello', -3) is 'hello', NOT Spark's from-the-end
  *    'llo' (SubstrFunction.java:105 `max(0, beginIdx - 1)`); a begin
  *    past the end yields ''; the length window is counted from the
  *    CLAMPED start (so substr('hello', -2, 4) is 'hell', where PG
  *    would shrink the window); a NEGATIVE length is LOUD
  *    (String.substring raises), a faithful quirk;
  *  - (string, string) is the REGEX EXTRACT overload
  *    (SubstrExtractFunction): first match, group 1 when the pattern
  *    has groups else group 0, NULL when no match.
  * Offsets count UTF-16 chars exactly like the reference's
  * String.substring (surrogate pairs are 2). */
object CrateSubstr {

  def eval2(s0: UTF8String, begin: Int): UTF8String = {
    val s = s0.toString
    val start = math.max(0, begin - 1)
    if (start > s.length - 1) UTF8String.EMPTY_UTF8
    else UTF8String.fromString(s.substring(start))
  }

  def eval3(s0: UTF8String, begin: Int, len: Int): UTF8String = {
    val s = s0.toString
    val start = math.max(0, begin - 1)
    if (start > s.length - 1) return UTF8String.EMPTY_UTF8
    var end = s.length
    if (start + len < end) end = start + len
    UTF8String.fromString(s.substring(start, end))
  }

  def extract(s0: UTF8String, pattern: UTF8String): UTF8String = {
    val m = java.util.regex.Pattern.compile(pattern.toString)
      .matcher(s0.toString)
    if (m.find()) {
      val g = m.group(if (m.groupCount() > 0) 1 else 0)
      if (g == null) null else UTF8String.fromString(g)
    } else null
  }
}

/** `substr`/`substring` with the reference's semantics; dispatches on
  * the second argument's type (string → regex extract). Codegen'd. */
case class CrateSubstrExpr(children: Seq[Expression]) extends Expression {
  require(children.size == 2 || children.size == 3,
    "substr takes 2 or 3 arguments")
  override def prettyName: String = "substr"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  private def isExtract: Boolean =
    children.size == 2 && children(1).dataType == StringType
  private def intOk(t: DataType): Boolean = t match {
    case IntegerType | LongType | ShortType | ByteType | NullType => true
    case _ => false
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (children(0).dataType == StringType ||
      children(0).dataType == NullType) &&
      (if (children.size == 2) intOk(children(1).dataType) ||
        children(1).dataType == StringType
       else intOk(children(1).dataType) && intOk(children(2).dataType))
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "substr requires (string, integer[, integer]) or (string, string)")
  }
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val s = children(0).eval(input)
    if (s == null) return null
    val a1 = children(1).eval(input)
    if (a1 == null) return null
    if (isExtract)
      CrateSubstr.extract(s.asInstanceOf[UTF8String],
        a1.asInstanceOf[UTF8String])
    else if (children.size == 2)
      CrateSubstr.eval2(s.asInstanceOf[UTF8String], toInt(a1))
    else {
      val a2 = children(2).eval(input)
      if (a2 == null) return null
      CrateSubstr.eval3(s.asInstanceOf[UTF8String], toInt(a1), toInt(a2))
    }
  }
  private def toInt(v: Any): Int = v match {
    case i: Int   => i
    case l: Long  => Math.toIntExact(l)
    case s: Short => s.toInt
    case b: Byte  => b.toInt
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c0 = children(0).genCode(ctx)
    val c1 = children(1).genCode(ctx)
    val c2 = if (children.size == 3) Some(children(2).genCode(ctx)) else None
    val call =
      if (isExtract)
        s"graft.plans.CrateSubstr.extract(${c0.value}, ${c1.value})"
      else if (children.size == 2)
        s"graft.plans.CrateSubstr.eval2(${c0.value}, (int) ${c1.value})"
      else
        s"graft.plans.CrateSubstr.eval3(${c0.value}, (int) ${c1.value}, " +
          s"(int) ${c2.get.value})"
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val extraEval = c2.map(_.code).getOrElse(
      org.apache.spark.sql.catalyst.expressions.codegen.EmptyBlock)
    val extraNull = c2.map(c => s" || ${c.isNull}").getOrElse("")
    ev.copy(code =
      code"""
        ${c0.code}
        ${c1.code}
        $extraEval
        boolean ${ev.isNull} = ${c0.isNull} || ${c1.isNull}$extraNull;
        UTF8String ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $call;
          ${ev.isNull} = ${ev.value} == null;
        }
      """)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
