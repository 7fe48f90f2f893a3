package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series join operators.
  *
  * The reference serves TSDB workloads with ordinary range predicates over
  * its time-partitioned tables (`docs/general/dql/` time-series examples);
  * an as-of join — "latest right row at or before each left timestamp" — is
  * the canonical operation a feature/training pipeline needs on top.
  *
  * Scale design: NO range join (a naive `l.ts >= r.ts` join explodes to
  * O(|L|·|R|) per key before the aggregation). Instead both sides are
  * union-tagged and a single `last_value(ignore nulls)` window pass per key
  * carries the most recent right-side values forward — one shuffle on the
  * key, O(|L|+|R|) rows total, the plan a hand-written merge join would
  * produce.
  */
object Temporal {

  /** Sessionize: assign each row a per-key session ordinal, starting a new
    * session when the gap since the previous event of the same key exceeds
    * `gapSeconds`. One window pass over (key, ts) — no driver state, the
    * same shape the reference's clients compute with time-bucketed SQL.
    * `tieCol` breaks equal-timestamp ordering deterministically. */
  def sessionize(df: DataFrame, keyCols: Seq[String], tsCol: String,
                 gapSeconds: Long, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val gapUs = gapSeconds * 1000000L
    val newSession = when(
      unix_micros(col(tsCol).cast("timestamp")) -
        lag(unix_micros(col(tsCol).cast("timestamp")), 1).over(w) > gapUs, 1L)
      .otherwise(0L)
    df.withColumn("session_id",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) + 1L)
  }

  /** As-of (backward) join: for every `left` row, append `valueCols` from
    * the latest `right` row with `right.tsCol <= left.tsCol`, matching on
    * `keyCols`. Rows with no prior right row get nulls (LEFT semantics).
    * `valueCols` must not collide with left's columns. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               tsCol: String, valueCols: Seq[String]): DataFrame = {
    require(valueCols.forall(v => !left.columns.contains(v)),
      "right value columns must not collide with left columns")
    val l = left.withColumn("__side", lit(1))
    // right rows with a NULL timestamp can never be "at or before" anything;
    // unguarded they'd sort first (NULLS FIRST) and leak their values into
    // every left row of the key
    val r = right.where(col(tsCol).isNotNull)
      .select((keyCols :+ tsCol).map(col) ++ valueCols.map(col): _*)
      .withColumn("__side", lit(0))
    // right sorts before left at equal ts → `<=` (inclusive) semantics
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(unioned) { (df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__side")
  }
}
