package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `information_schema._pg_expandarray(anyarray)` (reference
  * expression/tablefunctions/PgExpandArrayTest — the pg-compat
  * set-returning function): one row per element as (x = the element,
  * n = its 1-based index); NULL input produces NO rows (the reference
  * test pins `_pg_expandarray(null::text[])` → empty). Expressed as a
  * Catalyst `Generator` — the SURVEY §2.9 mapping for set-returning
  * functions — so it runs in SELECT position exactly like
  * posexplode, and Catalyst plans it as a codegen-compatible
  * `Generate` node (per-partition, no shuffle). The Dialect strips the
  * `information_schema.` qualifier onto the registered name. */
case class PgExpandArrayGen(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {
  override def prettyName: String = "graft_pg_expandarray"

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def elementSchema: StructType = StructType(Seq(
    StructField("x", elemType, nullable = true),
    StructField("n", IntegerType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: ArrayType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array argument, got ${other.simpleString}")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val arr = v.asInstanceOf[ArrayData]
      val et = elemType
      (0 until arr.numElements()).map { i =>
        InternalRow(arr.get(i, et), i + 1)
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
