package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `object_keys(obj)` — top-level key names of an OBJECT (reference
  * scalar/ObjectKeysFunction via docs/general/builtins/scalar-functions.rst).
  * OBJECTs surface two ways in graft: as MAP columns (dynamic-schema reads,
  * `sources/DynamicObjects`) and as STRUCTs (OBJECT literals, strict
  * column policies). Both are one OBJECT type to the reference, so both
  * resolve here — maps defer to `map_keys`, structs fold to their field
  * names at analysis (the names are part of the TYPE, not the value).
  */
case class ObjectKeysExpr(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable {
  import org.apache.spark.sql.catalyst.expressions.{CreateArray, If, IsNull, Literal, MapKeys}

  override def prettyName: String = "object_keys"

  override lazy val replacement: Expression = child.dataType match {
    case s: StructType =>
      If(IsNull(child), Literal(null, ArrayType(StringType)),
        CreateArray(s.fieldNames.toSeq.map(n => Literal(UTF8String.fromString(n), StringType))))
    case NullType => Literal(null, ArrayType(StringType))
    case _        => MapKeys(child)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** CrateDB `date_format([fmt, [tz,]] ts)` (reference
  * scalar/timestamp/DateFormatFunction.java:43 — MySQL `%`-patterns,
  * default `'%Y-%m-%dT%H:%i:%s.%fZ'`, optional explicit zone, and a
  * BIGINT timestamp argument is epoch MILLIS, CrateDB's native unit).
  * The pattern/zone must be literals (they always are in reference SQL);
  * both fold at analysis, so execution is Spark's native codegen'd
  * `date_format` — no UDF in the hot path.
  */
case class GraftDateFormatExpr(fmt: Expression, tz: Expression, ts: Expression)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable {
  import org.apache.spark.sql.catalyst.expressions.{Cast, DateFormatClass, Literal, MillisToTimestamp}

  override def prettyName: String = "date_format"
  override def children: Seq[Expression] = Seq(fmt, tz, ts)

  private def litString(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case _ => throw new IllegalArgumentException(
      s"date_format $what must be a string literal")
  }

  override lazy val replacement: Expression = {
    val pattern = graft.functions.TimeFunctions.translateMySqlPattern(
      litString(fmt, "format"))
    val zone = litString(tz, "timezone")
    val instant = ts.dataType match {
      case LongType    => MillisToTimestamp(ts)
      case IntegerType | ShortType | ByteType =>
        MillisToTimestamp(Cast(ts, LongType))
      case StringType  => Cast(ts, TimestampType, Some("UTC"))
      case _           => ts
    }
    DateFormatClass(instant, Literal(UTF8String.fromString(pattern), StringType), Some(zone))
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(fmt = c(0), tz = c(1), ts = c(2))
}

/** CrateDB `timezone(tz, ts)` (reference scalar/timestamp/TimezoneFunction
  * via docs/general/builtins/scalar-functions.rst §timezone): converts
  * between naive wall-time and instant readings.
  *
  *  - BIGINT (epoch millis, CrateDB's timestamp-without-tz unit) and STRING
  *    arguments are naive wall times: "treat as located in `tz`" → instant
  *    (`to_utc_timestamp` direction; doc example
  *    `timezone('Europe/Madrid', 257504400000)` → 257500800000).
  *  - TIMESTAMP arguments are instants (Spark timestamps always are):
  *    instant → wall time in `tz` (`from_utc_timestamp` direction, the
  *    doc's timestamp-with-time-zone variant).
  */
case class GraftTimezoneExpr(tz: Expression, ts: Expression)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable {
  import org.apache.spark.sql.catalyst.expressions.{Cast, FromUTCTimestamp, MillisToTimestamp, ToUTCTimestamp}

  override def prettyName: String = "timezone"
  override def children: Seq[Expression] = Seq(tz, ts)

  /** Direction per the reference's overloads (TimezoneFunction.java:
    * a WITH-time-zone input converts the instant to the zone's WALL
    * time (timestamp without tz); a WITHOUT-time-zone input (millis
    * longs, NTZ values, `::timestamp without time zone` casts)
    * re-anchors the wall time IN the zone, yielding the UTC instant —
    * `timezone('Europe/Madrid', '…10:00+01:00'::timestamp without
    * time zone)` is 09:00Z, the docs' 257504400000). */
  override lazy val replacement: Expression = ts.dataType match {
    case LongType   => ToUTCTimestamp(MillisToTimestamp(ts), tz)
    case IntegerType | ShortType | ByteType =>
      ToUTCTimestamp(MillisToTimestamp(Cast(ts, LongType)), tz)
    case StringType => ToUTCTimestamp(Cast(ts, TimestampType, Some("UTC")), tz)
    case TimestampNTZType =>
      ToUTCTimestamp(Cast(ts, TimestampType, Some("UTC")), tz)
    case _ => ts match {
      case graft.plans.TimestampCastExpr(_, false) => ToUTCTimestamp(ts, tz)
      case _ => FromUTCTimestamp(ts, tz)
    }
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(tz = c(0), ts = c(1))
}

/** `pg_typeof(expr)` — returns the CrateDB display name of the argument's
  * type as a plan-time constant (reference
  * scalar/systeminformation/PgTypeofFunction.java:58 captures the BOUND
  * argument type, not the runtime value, so `pg_typeof(null::bigint)` is
  * `'bigint'` and the value is never inspected). Foldable: the name is known
  * once analysis binds the child, so ConstantFolding erases it from the
  * physical plan entirely.
  */
case class PgTypeofExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "pg_typeof"
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def foldable: Boolean = true

  override def eval(input: InternalRow): Any =
    UTF8String.fromString(PgTypeofExpr.crateName(child.dataType))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PgTypeofExpr {
  /** Spark type → CrateDB type display name (reference io/crate/types/
    * DataTypes.java:397 name registry; ArrayType.java:223 `<inner>_array`). */
  def crateName(dt: DataType): String = dt match {
    case NullType           => "undefined"
    case BooleanType        => "boolean"
    case ByteType           => "byte"
    case ShortType          => "smallint"
    case IntegerType        => "integer"
    case LongType           => "bigint"
    case FloatType          => "real"
    case DoubleType         => "double precision"
    case _: DecimalType     => "numeric"
    case _: StringType      => "text"
    case DateType           => "date"
    case TimestampType      => "timestamp with time zone"
    case TimestampNTZType   => "timestamp without time zone"
    case _: DayTimeIntervalType | _: YearMonthIntervalType
                            => "interval"
    case ArrayType(e, _)    => crateName(e) + "_array"
    case _: MapType | _: StructType => "object"
    case other              => other.simpleString
  }
}

/** `current_setting(name [, missing_ok])` — session-setting lookup
  * (reference scalar/CurrentSettingFunction — pg compat). Reads the Spark
  * SQL conf: `SQLConf.get` resolves to the session conf on the driver and to
  * the propagated snapshot inside tasks, so the expression is safe wherever
  * it lands in the plan. Unknown setting → error, unless `missing_ok` is
  * true → null (the PG contract).
  */
case class CurrentSettingExpr(name: Expression, missingOk: Option[Expression])
    extends Expression with CodegenFallback {

  override def prettyName: String = "current_setting"
  override def children: Seq[Expression] = name +: missingOk.toSeq
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  // Settings are per-session constants: with literal arguments the lookup
  // folds on the DRIVER during optimization, where the full session conf is
  // visible (tasks only see the propagated spark.sql.* snapshot).
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (name.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects a string setting name")
    else if (missingOk.exists(_.dataType != BooleanType))
      TypeCheckResult.TypeCheckFailure(s"$prettyName missing_ok must be boolean")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    val n = name.eval(input)
    if (n == null) return null
    val key = n.toString
    // the reference's session settings that have no spark.sql.* conf
    // (SessionSettingRegistry): default search_path is the `doc` schema
    if (key == "search_path") return UTF8String.fromString("doc")
    val v = try Option(SQLConf.get.getConfString(key, null)) catch {
      case _: Exception => None
    }
    v match {
      case Some(s) => UTF8String.fromString(s)
      case None =>
        val ok = missingOk.exists(e => e.eval(input) == true)
        if (ok) null
        else throw new IllegalArgumentException(s"Unrecognised setting: $key")
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(name = newChildren.head, missingOk = newChildren.drop(1).headOption)
}

/** `null_or_empty(object_or_array)` — true when the argument is NULL or has
  * no elements (reference scalar/NullOrEmptyFunction.java:57, registered for
  * both the OBJECT and ARRAY signatures). Type-aware at analysis time:
  * arrays/maps test `size() = 0`; a struct (how graft represents typed
  * OBJECT literals) always carries its declared fields, so only the null
  * test applies. RuntimeReplaceable — the optimizer substitutes the plain
  * codegen'd composition, nothing here survives into the physical plan.
  */
case class NullOrEmptyExpr(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable {
  import org.apache.spark.sql.catalyst.expressions.{EqualTo, IsNull, Literal, Or, Size}

  override def prettyName: String = "null_or_empty"

  override lazy val replacement: Expression = child.dataType match {
    case NullType      => Literal(true)
    case _: StructType => IsNull(child)
    case _             => Or(IsNull(child), EqualTo(Size(child), Literal(0)))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_dim_match(lhs, arr)` — the array argument of a quantified
  * comparison, auto-unnested "to the number of dimensions required"
  * (reference `docs/general/dql/selects.rst`: `1 = ANY([[1, 2], [3, 4]])`
  * is TRUE; AnyOperator binds the comparison at the lhs's dimension).
  * Resolved purely at analysis time: while the element type is itself an
  * array that does not structurally match the lhs type, wrap in `flatten`.
  * The lhs child is only consulted for its TYPE — it never evaluates here,
  * so the dialect can mention it twice without double execution.
  */
case class DimMatchExpr(left: Expression, arr: Expression)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable {
  import org.apache.spark.sql.catalyst.expressions.Flatten

  override def prettyName: String = "graft_dim_match"
  override def children: Seq[Expression] = Seq(left, arr)

  override lazy val replacement: Expression = {
    def loop(a: Expression): Expression = a.dataType match {
      case ArrayType(et: ArrayType, _)
          if !DataType.equalsStructurally(left.dataType, et, ignoreNullability = true) =>
        loop(Flatten(a))
      case _ => a
    }
    loop(arr)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), arr = newChildren(1))
}
