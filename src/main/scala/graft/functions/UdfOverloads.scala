package graft.functions

import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.types.DataType

/** Signature overloading for `CREATE FUNCTION` (reference
  * `user-defined-functions.rst` "Overloading": CrateDB resolves a UDF
  * call per argument types; `Functions.java` picks the exact signature
  * first, then the closest implicit-cast candidate). Spark's function
  * registry is name-keyed, so graft stores each overload's
  * implementation under a MANGLED name (`name__ovlK`) and registers ONE
  * dispatching builder under the plain name:
  *
  *  - one candidate (the overwhelmingly common case) → forwarded
  *    unconditionally, zero type inspection;
  *  - several candidates → arity filters first; then an EXACT
  *    dataType match on the resolved children; then the UNIQUE
  *    candidate every argument can up-cast to (Cast.canUpCast — the
  *    lossless subset of the reference's implicit conversions), with
  *    the casts made explicit;
  *  - no candidate / ambiguity → loud analysis error listing the known
  *    signatures, like the reference's "unknown function: name(args)".
  *
  * The registry is session-global (CrateDB UDFs are cluster-global) and
  * the dispatcher reads it at RESOLUTION time, so later overloads are
  * visible to already-registered names. */
object UdfOverloads {

  final case class Ovl(argDdl: Seq[String], retDdl: String, mangled: String) {
    lazy val argTypes: Seq[DataType] = argDdl.map(DataType.fromDDL)
    def sigString(name: String): String =
      s"$name(${argDdl.mkString(", ")})"
  }

  private val byName =
    new java.util.concurrent.ConcurrentHashMap[String, Vector[Ovl]]()

  def overloads(name: String): Vector[Ovl] =
    byName.getOrDefault(name.toLowerCase, Vector.empty)

  /** Adds (or replaces, per same argDdl) an overload; returns the
    * mangled slot name and whether that signature already existed. */
  def put(name: String, argDdl: Seq[String], retDdl: String): (String, Boolean) = {
    val key = name.toLowerCase
    val cur = byName.getOrDefault(key, Vector.empty)
    cur.indexWhere(_.argDdl.map(_.toUpperCase) == argDdl.map(_.toUpperCase)) match {
      case k if k >= 0 =>
        byName.put(key, cur.updated(k, Ovl(argDdl, retDdl, cur(k).mangled)))
        (cur(k).mangled, true)
      case _ =>
        val mangled = s"${key}__ovl${cur.length}"
        byName.put(key, cur :+ Ovl(argDdl, retDdl, mangled))
        (mangled, false)
    }
  }

  /** Removes one overload (by types, case-insensitive) or the only one
    * (types = None). Returns (the removed slot, how many remain);
    * throws when the name is unknown, the signature is unknown, or the
    * name is overloaded and no types were given. */
  def remove(name: String, types: Option[Seq[String]]): (Ovl, Int) = {
    val key = name.toLowerCase
    val cur = byName.getOrDefault(key, Vector.empty)
    require(cur.nonEmpty, s"function $name does not exist")
    val ix = types match {
      case Some(ts) =>
        val i = cur.indexWhere(_.argDdl.map(_.toUpperCase) == ts.map(_.toUpperCase))
        require(i >= 0, s"function ${name}(${ts.mkString(", ")}) does not exist" +
          s" — known: ${cur.map(_.sigString(name)).mkString("; ")}")
        i
      case None =>
        require(cur.length == 1,
          s"function $name is overloaded — specify the argument types " +
            s"(known: ${cur.map(_.sigString(name)).mkString("; ")})")
        0
    }
    val removed = cur(ix)
    val rest = cur.patch(ix, Nil, 1)
    if (rest.isEmpty) byName.remove(key) else byName.put(key, rest)
    (removed, rest.length)
  }

  def clear(name: String): Unit = byName.remove(name.toLowerCase)

  /** The plain-name dispatcher (see object doc). */
  def dispatch(name: String, exprs: Seq[Expression]): Expression = {
    val all = overloads(name)
    require(all.nonEmpty, s"function $name does not exist")
    def forward(o: Ovl): Expression =
      UnresolvedFunction(Seq(o.mangled), exprs, isDistinct = false)
    if (all.length == 1) return forward(all.head)
    val arity = all.filter(_.argDdl.length == exprs.length)
    if (arity.isEmpty) throw new IllegalArgumentException(
      s"unknown function: $name with ${exprs.length} arguments — known: " +
        all.map(_.sigString(name)).mkString("; "))
    if (arity.length == 1) return forward(arity.head)
    // several same-arity candidates: the children are resolved by the
    // time the analyzer looks functions up, so dispatch on their types
    val childTypes = exprs.map(_.dataType)
    def sameType(a: DataType, b: DataType): Boolean =
      a.catalogString == b.catalogString
    arity.find(o => o.argTypes.zip(childTypes).forall {
      case (p, c) => sameType(p, c)
    }) match {
      case Some(exact) => forward(exact)
      case None =>
        // Spark's canUpCast calls ANY→STRING safe; the reference's
        // precedence prefers same-family widening (int → bigint) over a
        // stringification — so try non-string targets first, and only
        // fall back to string-target casts when nothing else fits
        def fits(allowToString: Boolean)(o: Ovl): Boolean =
          o.argTypes.zip(childTypes).forall { case (p, c) =>
            sameType(p, c) || (Cast.canUpCast(c, p) &&
              (allowToString ||
                p != org.apache.spark.sql.types.StringType ||
                c == org.apache.spark.sql.types.StringType))
          }
        val strict = arity.filter(fits(allowToString = false))
        val castable =
          if (strict.nonEmpty) strict else arity.filter(fits(allowToString = true))
        castable match {
          case Vector(one) =>
            UnresolvedFunction(Seq(one.mangled),
              exprs.zip(one.argTypes).map { case (e, t) =>
                if (sameType(e.dataType, t)) e else Cast(e, t)
              }, isDistinct = false)
          case Vector() => throw new IllegalArgumentException(
            s"unknown function: $name(${childTypes.map(_.catalogString)
              .mkString(", ")}) — known: " +
              arity.map(_.sigString(name)).mkString("; "))
          case many => throw new IllegalArgumentException(
            s"ambiguous function call $name(${childTypes.map(_.catalogString)
              .mkString(", ")}) — candidates: " +
              many.map(_.sigString(name)).mkString("; "))
        }
    }
  }
}
