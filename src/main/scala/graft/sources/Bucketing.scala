package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables: the co-located-join strategy (SURVEY.md §2.3 scale
  * notes).
  *
  * The reference routes rows to shards by `CLUSTERED BY (col)`
  * (`DocTableInfo.clusteredBy`, default `_id`) so same-key rows land on the
  * same shard and distributed joins on the clustering key avoid cross-node
  * traffic. Spark's analogue is hash-bucketed tables: both sides bucketed by
  * the join key into the same bucket count join WITHOUT a shuffle — at
  * 100 TB this turns the dominant repeated-join cost into a one-time write
  * cost.
  */
object Bucketing {

  /** CREATE TABLE ... CLUSTERED BY (keys) INTO n BUCKETS, as a saved table
    * (bucket metadata lives in the catalog). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** True if the physical plan for `df` contains no shuffle exchange —
    * the assertion that bucketing actually removed the join shuffle. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
