package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantified comparisons over subqueries: `x <op> ANY (SELECT …)` and
  * `x <op> ALL (SELECT …)` for op ∈ {<, <=, >, >=, =, !=} — the reference's
  * 12 operator variants (`expression/operator/any/AnyOperators.java`,
  * `operator/all/AllOperator.java`), which Spark SQL does not accept
  * natively.
  *
  * Rewrite strategy (scale-first):
  *  - ordering ops need only the subquery's 1-row aggregate summary
  *    (min, max, count, null-count): `x > ANY(S)` ⟺ `x > min(S)` etc. The
  *    summary row is broadcast — O(1) bytes regardless of |S|.
  *  - `= ANY` (membership) joins against the DISTINCT non-null values — a
  *    shuffled equality join, never a collected list.
  *  - ALL is the De Morgan dual: `x op ALL(S)` = `NOT (x negate(op) ANY(S))`
  *    — NOT flips TRUE/FALSE and preserves NULL, exactly SQL 3VL.
  *
  * 3VL truth table honored (matches PG/CrateDB, verified against DuckDB in
  * q101/q102): empty S → ANY is FALSE, ALL is TRUE regardless of x; a NULL
  * lhs or NULL elements can only turn definite-FALSE into NULL, never flip
  * TRUE/FALSE.
  */
object Quantified {

  private def negate(op: String): String = op match {
    case ">"  => "<="
    case "<"  => ">="
    case ">=" => "<"
    case "<=" => ">"
    case "="  => "!="
    case "!=" => "="
    case o    => throw new IllegalArgumentException(s"unsupported operator: $o")
  }

  /** One comparison to evaluate in a [[comparisons]] batch: `quantifier` is
    * "any" or "all". */
  final case class Spec(lhs: Column, op: String, quantifier: String, as: String)

  private def summarize(sub: DataFrame): DataFrame = {
    require(sub.columns.length == 1, "quantified subquery must select one column")
    val v = col(sub.columns.head)
    sub.agg(
      min(v).as("__minv"), max(v).as("__maxv"),
      count(lit(1)).as("__cnt"),
      sum(when(v.isNull, 1).otherwise(0)).as("__nnull"))
  }

  private def anyOrderingResult(lhs: Column, op: String): Column = {
    val probe = op match {
      case ">"  => lhs > col("__minv")
      case ">=" => lhs >= col("__minv")
      case "<"  => lhs < col("__maxv")
      case "<=" => lhs <= col("__maxv")
      // ∃v ≠ x ⟺ min ≠ x or max ≠ x (over non-null values)
      case "!=" => (lhs =!= col("__minv")) || (lhs =!= col("__maxv"))
      case o    => throw new IllegalArgumentException(s"unsupported ordering operator: $o")
    }
    when(col("__cnt") === 0, lit(false))
      .when(probe, lit(true)) // NULL probe falls through
      .when(col("__nnull") > 0 || lhs.isNull, lit(null).cast("boolean"))
      .otherwise(lit(false))
  }

  /** Evaluate MANY ordering comparisons against the SAME subquery with ONE
    * summary scan and one broadcast — at scale the subquery aggregation is
    * the dominant cost, so q-per-op rewrites (one scan each) waste |specs|−1
    * scans. Membership ops (`= ANY` / `!= ALL`) need the join path — use
    * [[anyComparison]]/[[allComparison]] for those. */
  def comparisons(df: DataFrame, sub: DataFrame, specs: Seq[Spec]): DataFrame = {
    val withS = df.crossJoin(broadcast(summarize(sub)))
    val out = specs.foldLeft(withS) { (acc, s) =>
      s.quantifier match {
        case "any" => acc.withColumn(s.as, anyOrderingResult(s.lhs, s.op))
        case "all" => acc.withColumn(s.as, !anyOrderingResult(s.lhs, negate(s.op)))
        case q     => throw new IllegalArgumentException(s"unsupported quantifier: $q")
      }
    }
    out.drop("__minv", "__maxv", "__cnt", "__nnull")
  }

  /** Adds boolean column `as` = `lhs op ANY(sub)`. `sub` must have exactly
    * one column (the subquery select list). */
  def anyComparison(df: DataFrame, lhs: Column, op: String, sub: DataFrame,
                    as: String): DataFrame = op match {
    case ">" | ">=" | "<" | "<=" | "!=" =>
      comparisons(df, sub, Seq(Spec(lhs, op, "any", as)))
    case "=" =>
      val v = col(sub.columns.head)
      val probe = sub.select(v.as("__v")).where(col("__v").isNotNull).distinct()
      df.crossJoin(broadcast(summarize(sub)))
        .withColumn("__lhs", lhs)
        .join(probe, col("__lhs") === col("__v"), "left")
        .withColumn(as,
          when(col("__cnt") === 0, lit(false))
            .when(col("__v").isNotNull, lit(true))
            .when(col("__nnull") > 0 || col("__lhs").isNull, lit(null).cast("boolean"))
            .otherwise(lit(false)))
        .drop("__lhs", "__v", "__minv", "__maxv", "__cnt", "__nnull")
    case o => throw new IllegalArgumentException(s"unsupported operator: $o")
  }

  /** Adds boolean column `as` = `lhs op ALL(sub)` via the De Morgan dual. */
  def allComparison(df: DataFrame, lhs: Column, op: String, sub: DataFrame,
                    as: String): DataFrame =
    anyComparison(df, lhs, negate(op), sub, as).withColumn(as, !col(as))
}
