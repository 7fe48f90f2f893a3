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

/** The reference's BOOLEAN cast (server/src/main/java/io/crate/types/
  * BooleanType.java:205 implicitCast): the PG string map with
  * `on`/`off` included (Spark's cast lacks them), UNTRIMMED lookup
  * (' t' raises), LOUD "Can't convert … to boolean" on garbage
  * (Spark silently nulls), and numbers true iff STRICTLY POSITIVE
  * (booleanFromNumber: `doubleValue() > 0.0` — so -1 is FALSE where
  * Spark's nonzero rule says true). */
object BoolCastUtil {

  private val Map: java.util.HashMap[String, java.lang.Boolean] = {
    val m = new java.util.HashMap[String, java.lang.Boolean]()
    for (f <- Seq("f", "false", "n", "no", "off", "0")) m.put(f, false)
    for (t <- Seq("t", "true", "y", "yes", "on", "1")) m.put(t, true)
    m
  }

  def fromString(s0: org.apache.spark.unsafe.types.UTF8String): Boolean = {
    val v = Map.get(s0.toString.toLowerCase(java.util.Locale.ENGLISH))
    if (v == null)
      throw new IllegalArgumentException(
        "Can't convert \"" + s0 + "\" to boolean")
    v.booleanValue()
  }

  def fromDouble(v: Double): Boolean = v > 0.0
}

/** `x::boolean` — the reference cast. Codegen'd. */
case class BoolCastExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_bool_cast"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | LongType | IntegerType | ShortType | ByteType |
           DoubleType | FloatType | _: DecimalType | NullType |
           BooleanType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"Can't cast ${other.simpleString} to boolean")
    }
  override def nullSafeEval(input: Any): Any = input match {
    case b: Boolean => b
    case s: org.apache.spark.unsafe.types.UTF8String =>
      BoolCastUtil.fromString(s)
    case l: Long    => BoolCastUtil.fromDouble(l.toDouble)
    case i: Int     => BoolCastUtil.fromDouble(i.toDouble)
    case i: Short   => BoolCastUtil.fromDouble(i.toDouble)
    case i: Byte    => BoolCastUtil.fromDouble(i.toDouble)
    case d: Double  => BoolCastUtil.fromDouble(d)
    case f: Float   => BoolCastUtil.fromDouble(f.toDouble)
    case d: org.apache.spark.sql.types.Decimal =>
      BoolCastUtil.fromDouble(d.toDouble)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case BooleanType => defineCodeGen(ctx, ev, c => s"$c")
      case StringType =>
        defineCodeGen(ctx, ev,
          c => s"graft.plans.BoolCastUtil.fromString($c)")
      case _: DecimalType =>
        defineCodeGen(ctx, ev,
          c => s"graft.plans.BoolCastUtil.fromDouble($c.toDouble())")
      case _ =>
        defineCodeGen(ctx, ev,
          c => s"graft.plans.BoolCastUtil.fromDouble((double) $c)")
    }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The reference's `concat(...)` (server/src/main/java/io/crate/
  * expression/scalar/ConcatFunction.java:222 GenericConcatFunction):
  * null arguments are SKIPPED (PG behavior — concat(null, 'x') is 'x',
  * all-null is ''), where Spark's concat nulls the whole result. The
  * `||` operator has its own type-dispatched family (op_|| —
  * strict-null strings, null-skipping arrays, append/prepend arms),
  * routed by Dialect.passPipeConcat to the graft_op_concat builder in
  * GraftFunctions; only the FUNCTION spelling routes here (Dialect
  * rename). Array argument lists peel off at the graft_concat BUILDER
  * (null-skipping array_cat); everything else renders to text with the
  * reference's implicit casts (booleans as 't'/'f') and concatenates
  * via codegen'd ConcatWs — which skips nulls natively. */
case class GraftConcatExpr(children: Seq[Expression])
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable {
  override def prettyName: String = "graft_concat"
  override lazy val replacement: Expression =
    if (children.exists(_.dataType.isInstanceOf[ArrayType]))
      // array children normally peel off at the REGISTRY builder
      // (null-skipping array_cat, GraftFunctions); this branch only
      // remains for directly-constructed instances
      org.apache.spark.sql.catalyst.expressions.Concat(children)
    else if (children.exists(_.dataType.isInstanceOf[MapType])) {
      // OBJECT merge (ObjectMergeFunction): first-level keys merge with
      // the RIGHT side winning, null operands are skipped, all-null is
      // null — Spark's map_concat instead errors on duplicate keys and
      // nulls the whole result. A foldable EMPTY map literal (`{}` /
      // `map()`) types as map<string,string> whatever its siblings are;
      // it contributes no keys, so drop it before the same-type check.
      def emptyMapLit(c: Expression): Boolean =
        c.dataType.isInstanceOf[MapType] && c.foldable && {
          val v = c.eval()
          v != null && v.asInstanceOf[
            org.apache.spark.sql.catalyst.util.MapData].numElements() == 0
        }
      val kept = children.filterNot(emptyMapLit)
      if (kept.exists(_.dataType.isInstanceOf[MapType]))
        GraftObjectMergeExpr(kept)
      else children.find(_.dataType.isInstanceOf[MapType]).get
    }
    else
      org.apache.spark.sql.catalyst.expressions.ConcatWs(
        Literal("") +: children.map {
          case c if c.dataType == StringType => c
          case c => ToTextExpr(c)
        })
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** The reference's OBJECT merge (scalar/object/ObjectMergeFunction —
  * the `concat(obj, obj)` overload): only FIRST-level keys merge, the
  * right operand wins a key conflict, null operands are skipped, and
  * an all-null argument list is NULL. Spark's own map_concat raises
  * DUPLICATED_MAP_KEY and is strict-null, so the semantics need their
  * own expression. Same-typed maps only (Spark's analyzer rejects
  * heterogeneous map merges long before evaluation). */
case class GraftObjectMergeExpr(children: Seq[Expression])
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "graft_object_merge"
  override def dataType: org.apache.spark.sql.types.DataType =
    children.map(_.dataType)
      .find(_.isInstanceOf[MapType]).getOrElse(children.head.dataType)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // compare key/value types only — valueContainsNull may differ
    // between a map literal and a typed NULL cast
    val mapTypes = children.map(_.dataType).collect {
      case MapType(k, v, _) => (k, v)
    }.distinct
    if (mapTypes.size == 1 && children.forall(c =>
        c.dataType.isInstanceOf[MapType] || c.dataType == NullType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires identically-typed map (object) arguments")
  }
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val mt = dataType.asInstanceOf[MapType]
    val acc = new java.util.LinkedHashMap[Any, Any]()
    var sawNonNull = false
    children.foreach { c =>
      val v = c.eval(input)
      if (v != null) {
        sawNonNull = true
        val m = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
        val ks = m.keyArray().toObjectArray(mt.keyType)
        val vs = m.valueArray().toObjectArray(mt.valueType)
        var i = 0
        while (i < ks.length) { acc.put(ks(i), vs(i)); i += 1 }
      }
    }
    if (!sawNonNull) return null
    val ks = new Array[Any](acc.size)
    val vs = new Array[Any](acc.size)
    var i = 0
    val it = acc.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); ks(i) = e.getKey; vs(i) = e.getValue; i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayBasedMapData(ks, vs)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
