package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** DML semantics over Parquet tables (SURVEY.md §2.12).
  *
  * The reference implements INSERT upsert (`ON CONFLICT DO UPDATE`), UPDATE
  * (rewritten to upsert, `dml/UpdateToInsert.java`), DELETE, and `RETURNING`
  * on a mutable Lucene store. On an immutable Parquet substrate the same
  * semantics are copy-on-write: each statement is a declarative DataFrame
  * transform; `write` produces the next table version (a lakehouse format
  * would add snapshot isolation on top — the dataflow is identical).
  *
  * All transforms are distributed joins/windows — no driver-side row loops.
  * RETURNING is literally the affected-row DataFrame.
  */
object Dml {

  /** INSERT INTO ... SELECT: append semantics (schema aligned by name). */
  def insertInto(target: DataFrame, rows: DataFrame): DataFrame =
    target.unionByName(rows.select(target.columns.map(col).toSeq: _*))

  /** INSERT ... ON CONFLICT (key) DO NOTHING: keep existing rows, add only
    * rows whose key is absent. One anti-join (broadcast when small). */
  def upsertDoNothing(target: DataFrame, rows: DataFrame, keys: Seq[String]): DataFrame =
    target.unionByName(
      rows.join(target.select(keys.map(col).toSeq: _*), keys, "left_anti")
        .select(target.columns.map(col).toSeq: _*))

  /** INSERT ... ON CONFLICT (key) DO UPDATE SET (full-row replace): new rows
    * win over existing ones — MERGE INTO semantics, one outer-joined pass.
    * Last-writer-wins within `rows` is resolved by highest `versionCol`. */
  def upsertReplace(target: DataFrame, rows: DataFrame, keys: Seq[String],
                    versionCol: Option[String] = None): DataFrame = {
    val deduped = versionCol match {
      case Some(v) =>
        val w = Window.partitionBy(keys.map(col).toSeq: _*).orderBy(col(v).desc)
        rows.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
      case None => rows.dropDuplicates(keys)
    }
    val updates = deduped.select(target.columns.map(col).toSeq: _*)
    target.join(updates.select(keys.map(col).toSeq: _*), keys, "left_anti")
      .unionByName(updates)
  }

  /** UPDATE ... SET assignments WHERE cond, RETURNING *.
    * Returns (new table state, returning rows). */
  /** UPDATE WHERE cond. SQL semantics: the condition AND every assignment
    * right-hand side read the OLD row (the match is decided before any
    * assignment applies — a `SET base = 10 WHERE base = 4` row still
    * counts as touched). `post` assignments run as a second phase over the
    * NEW values of touched rows only — the router recomputes generated
    * columns there (reference GeneratedColumns.java recomputes from the
    * updated row). Returns (new state, touched rows after both phases). */
  def update(target: DataFrame, cond: Column, assignments: Map[String, Column],
             post: Map[String, Column] = Map.empty): (DataFrame, DataFrame) = {
    val hit = "__graft_upd"
    val marked = target.withColumn(hit, coalesce(cond, lit(false)))
    val phase1 = marked.select(target.columns.map { c =>
      assignments.get(c) match {
        case Some(exprCol) => when(col(hit), exprCol).otherwise(col(c)).as(c)
        case None          => col(c)
      }
    }.toSeq :+ col(hit): _*)
    val phase2 = phase1.select(target.columns.map { c =>
      post.get(c) match {
        case Some(exprCol) => when(col(hit), exprCol).otherwise(col(c)).as(c)
        case None          => col(c)
      }
    }.toSeq :+ col(hit): _*)
    (phase2.drop(hit), phase2.filter(col(hit)).drop(hit))
  }

  /** DELETE WHERE cond, RETURNING *. Returns (new state, deleted rows). */
  def delete(target: DataFrame, cond: Column): (DataFrame, DataFrame) =
    (target.filter(!coalesce(cond, lit(false))), target.filter(cond))

  /** CREATE TABLE ... PARTITIONED BY: write value-partitioned Parquet —
    * the direct analogue of the reference's partitioned tables
    * (`DocTableInfo.partitionedBy`, one Lucene index per value), and what
    * makes Catalyst prune partitions from WHERE clauses for free. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  def readTable(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)

  /** Atomically publish `next` as the new version of the Parquet table at
    * `path` — the commit protocol that makes copy-on-write DML real (the
    * reference gets the same guarantee from the Lucene translog,
    * `execution/dml/upsert/TransportShardUpsertAction.java:91`):
    *
    *  1. `next` (which may read FROM `path`) is fully materialized into a
    *     staging dir — the source is still intact if the job dies here;
    *  2. the staging write's `_SUCCESS` marker is verified;
    *  3. old and new are swapped by rename only ([[Maintenance.atomicSwap]]),
    *     so every moment in time has at least one complete copy on disk.
    *
    * Readers racing the swap see the old or the new version, never a
    * partial one. */
  def commitVersion(spark: SparkSession, next: DataFrame, path: String): Unit = {
    val staging = path + "__staging"
    next.write.mode("overwrite").parquet(staging)
    Maintenance.atomicSwap(spark, staging, path)
  }
}
