package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table catalog.
  *
  * The reference models tables as sharded Lucene indexes
  * (`server/src/main/java/io/crate/metadata/doc/DocTableInfo.java:159`); here a
  * table is a Parquet dataset and Catalyst's DataSource V2 scan provides the
  * pushed-filter + pruned-column read that `Collect`
  * (`server/src/main/java/io/crate/planner/operators/Collect.java:87`) does via
  * Lucene queries.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped as INT64 TIMESTAMP(NANOS) (which Spark's
      // vectorized reader rejects — read nanos as long and divide to
      // micros, DuckDB's ns → us truncation) and as timestamp[us] without
      // UTC adjustment (which Spark 4 reads as TIMESTAMP_NTZ). Normalize
      // both to session-zone TIMESTAMP: the session runs UTC, so the
      // NTZ → LTZ cast is instant-preserving and matches DuckDB's naive
      // timestamps.
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
        case TimestampNTZType =>
          raw.withColumn("ts", raw("ts").cast(TimestampType))
        case _ => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every fixture table as a temp view so `spark.sql` works on the
    * same names the DuckDB oracle uses. Cheap + idempotent. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Register fixture tables as catalog (external parquet) tables and run
    * `ANALYZE TABLE … COMPUTE STATISTICS` on each — this is what actually
    * feeds `spark.sql.cbo.joinReorder` (reference
    * `TableStatsService.java:101`): CBO needs rowCount stats, which temp
    * views over bare file scans never have. `events` is excluded (its
    * TIMESTAMP(NANOS) column needs the converted temp view from [[load]]).
    * Idempotent; call once per session before stats-sensitive planning. */
  def registerAllWithStats(spark: SparkSession, dir: String): Unit = {
    // stats are pointless unless the planner consumes them
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    names.filterNot(_ == "events").foreach { n =>
      spark.catalog.dropTempView(n)
      spark.sql(s"CREATE TABLE IF NOT EXISTS $n USING parquet LOCATION '$dir/$n.parquet'")
      spark.sql(s"ANALYZE TABLE $n COMPUTE STATISTICS")
    }
    load(spark, dir, "events").createOrReplaceTempView("events")
  }
}
