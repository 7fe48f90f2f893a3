package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The PG object-identifier cast family (reference types/RegclassType,
  * RegprocType, Regtype — round-15 conformance tail): `::regclass` /
  * `::regproc` / `::regtype` resolve a NAME to the oid used by the
  * matching pg_catalog relation, so pg-tooling introspection queries
  * (`WHERE attrelid = 'tbl'::regclass`) join correctly against
  * pg_class/pg_proc/pg_type.
  *
  *  - strings: relation/function names hash through PgCatalog.oid —
  *    the same scheme pg_class.oid / pg_proc.oid rows are generated
  *    with (the reference likewise derives oids by hashing,
  *    OidHash.relationOid/functionOid); regtype names resolve through
  *    the REAL wire-level type-oid table ('text'::regtype = 25).
  *    Quoted identifiers keep case, unquoted fold lower, and a
  *    schema-qualified name keeps its LAST segment (pg_class rows are
  *    keyed by bare relation name).
  *  - integers pass through (PG behavior: `123456789::regtype` is not
  *    an error); BIGINTs outside int range raise the reference's
  *    "... is outside of `int` range and cannot be cast to the
  *    <type> type" (RegclassTypeTest).
  *
  * Engine representation is the plain INT oid — the reference keeps
  * an (oid, name) pair and renders the NAME when cast to text; a
  * `::regclass::text` round-trip here shows the oid instead
  * (documented fringe, COVERAGE.md). */
object RegCasts {

  private val typeOids: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    for ((n, o) <- Seq(
      "bool" -> 16, "boolean" -> 16, "bytea" -> 17, "int8" -> 20,
      "bigint" -> 20, "int2" -> 21, "smallint" -> 21, "int4" -> 23,
      "int" -> 23, "integer" -> 23, "text" -> 25, "json" -> 114,
      "float4" -> 700, "real" -> 700, "float8" -> 701,
      "double precision" -> 701, "varchar" -> 1043,
      "character varying" -> 1043, "date" -> 1082,
      "timestamp" -> 1114, "timestamp without time zone" -> 1114,
      "timestamptz" -> 1184, "timestamp with time zone" -> 1184,
      "numeric" -> 1700, "decimal" -> 1700, "record" -> 2249))
      m.put(n, o)
    m
  }

  /** Unquote / lowercase / last-segment an identifier the way the
    * reference's IdentifierParser treats regclass strings. */
  private def normalizeIdent(raw: String): String = {
    val last = {
      // split on dots OUTSIDE double quotes
      var depth = false
      var start = 0
      var seg = raw
      var i = 0
      while (i < raw.length) {
        val c = raw.charAt(i)
        if (c == '"') depth = !depth
        else if (c == '.' && !depth) { start = i + 1 }
        i += 1
      }
      seg = raw.substring(start)
      seg
    }
    val t = last.trim
    if (t.length >= 2 && t.startsWith("\"") && t.endsWith("\""))
      t.substring(1, t.length - 1).replace("\"\"", "\"")
    else t.toLowerCase(java.util.Locale.ENGLISH)
  }

  def fromString(s: UTF8String, kind: String): Int = kind match {
    case "regtype" =>
      val n = normalizeIdent(s.toString)
      val o = typeOids.get(n)
      if (o != null) o.intValue
      else throw new IllegalArgumentException(
        s"Cannot cast `$s` to type `regtype`: unknown type name")
    case _ =>
      graft.sources.PgCatalog.oid(normalizeIdent(s.toString))
  }

  def fromLong(v: Long, kind: String): Int =
    if (v > Int.MaxValue || v < Int.MinValue)
      throw new IllegalArgumentException(
        s"$v is outside of `int` range and cannot be cast to the $kind type")
    else v.toInt
}

/** `x::regclass` / `::regproc` / `::regtype` → INT oid. Strict null. */
case class RegOidCastExpr(child: Expression, kind: String)
    extends UnaryExpression {
  override def prettyName: String = s"graft_${kind}_cast"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | IntegerType | LongType | ShortType | ByteType |
         NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"Cannot cast ${other.simpleString} to $kind")
  }
  override def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => RegCasts.fromString(s, kind)
    case n: Number     => RegCasts.fromLong(n.longValue, kind)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev,
          c => s"""graft.plans.RegCasts.fromString($c, "$kind")""")
      case _ =>
        defineCodeGen(ctx, ev,
          c => s"""graft.plans.RegCasts.fromLong((long) $c, "$kind")""")
    }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
