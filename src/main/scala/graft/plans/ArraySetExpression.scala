package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The reference's `array_set` (scalar/ArraySetFunction.java) — BOTH
  * overloads, replacing the round-7 Long-only Scala UDF that silently
  * ignored out-of-range indexes:
  *
  *  - array_set(array, indexes int[], values E[]): per-pair 1-based
  *    set; an index past the end APPENDS, padding the gap with NULLs
  *    ([1,2,3], [5] → [1,2,3,NULL,v]); indexes <= 0 raise
  *    "Updating arrays with indexes <= 0 is not supported"; BOTH null
  *    indexes and values → the array unchanged; ONE null or a size
  *    mismatch raises the reference's exact message.
  *  - array_set(array, index int, value E): same setElement; null
  *    index → NULL (STRICTNULL), null VALUE sets a null element.
  *
  * Generic over the element type (the UDF was pinned to bigint[]);
  * eval-only (CodegenFallback) — array mutation is not a pipeline hot
  * path, and the expression still runs inside whole-stage-codegen'd
  * projections via the fallback. */
case class GraftArraySetExpr(first: Expression, second: Expression,
                             third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def prettyName: String = "array_set"

  private def elemType: DataType =
    first.dataType.asInstanceOf[ArrayType].elementType

  /** Bare NULL/NULL resolves to the VECTOR signature like the
    * reference's test_null_for_target_indexes_and_null_for_target_values
    * (which gets the array back unchanged), so an untyped NULL index
    * pair is vector-form here too. */
  private def vectorForm: Boolean =
    second.dataType.isInstanceOf[ArrayType] ||
      (second.dataType == NullType &&
        (third.dataType.isInstanceOf[ArrayType] ||
          third.dataType == NullType))

  override def dataType: DataType = first.dataType match {
    case ArrayType(et, _) => ArrayType(et, containsNull = true)
    case other            => other // checkInputDataTypes rejects
  }
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    first.dataType match {
      case ArrayType(_, _) =>
        second.dataType match {
          // ArrayType(NullType) is the type of an empty `array()` /
          // all-null literal — legal, it contributes no updates
          case ArrayType(IntegerType | LongType | ShortType | NullType, _)
              if third.dataType.isInstanceOf[ArrayType] ||
                third.dataType == NullType => TypeCheckSuccess
          case IntegerType | LongType | ShortType | NullType =>
            TypeCheckSuccess
          case _ => TypeCheckFailure(
            "array_set requires (array, int[] , values[]) or " +
              "(array, int, value) arguments")
        }
      case _ => TypeCheckFailure("array_set requires an array argument")
    }
  }

  private def toIdx(x: Any): Int = x match {
    case i: Int   => i
    case l: Long  => Math.toIntExact(l)
    case s: Short => s.toInt
    case null     => // the reference NPEs unboxing a null index — loud
      throw new NullPointerException("array_set: null index element")
  }

  private def setElement(buf: java.util.ArrayList[Any], index0: Int,
                         value: Any): Unit = {
    if (index0 <= 0)
      throw new UnsupportedOperationException(
        "Updating arrays with indexes <= 0 is not supported")
    val index = index0 - 1 // CrateDB arrays are 1-based
    if (index < buf.size) buf.set(index, value)
    else {
      var i = buf.size
      while (i < index) { buf.add(null); i += 1 }
      buf.add(value)
    }
  }

  // null handling is form-specific, so eval overrides the strict default
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val arr = first.eval(input)
    if (arr == null) return null
    val idx = second.eval(input)
    val vals = third.eval(input)
    val src = arr.asInstanceOf[ArrayData].toObjectArray(elemType)
    val buf = new java.util.ArrayList[Any](src.length + 4)
    src.foreach(buf.add)
    if (vectorForm) {
      if (idx == null && vals == null)
        return new GenericArrayData(src)
      if (idx == null || vals == null ||
          idx.asInstanceOf[ArrayData].numElements() !=
            vals.asInstanceOf[ArrayData].numElements())
        throw new IllegalArgumentException(
          "`array_set(array, indexes, values)`: the size of indexes and " +
            "values must match or both be nulls")
      val idxType = second.dataType.asInstanceOf[ArrayType].elementType
      val valType = third.dataType.asInstanceOf[ArrayType].elementType
      val is = idx.asInstanceOf[ArrayData].toObjectArray(idxType)
      val vs = vals.asInstanceOf[ArrayData].toObjectArray(valType)
      var i = 0
      while (i < is.length) {
        setElement(buf, toIdx(is(i)), vs(i))
        i += 1
      }
    } else {
      if (idx == null) return null // STRICTNULL on the scalar index
      setElement(buf, toIdx(idx), vals) // a null VALUE sets null
    }
    new GenericArrayData(buf.toArray)
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    throw new IllegalStateException("eval is overridden")

  override protected def withNewChildrenInternal(
      f1: Expression, f2: Expression, f3: Expression): Expression =
    copy(first = f1, second = f2, third = f3)
}
