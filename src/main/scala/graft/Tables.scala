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

  /** Resolved-scan memo: `spark.read.parquet` eagerly lists the dataset and
    * reads footers for schema inference on EVERY call — pure metadata work
    * that a catalog-backed engine does once (the reference caches table
    * metadata in DocTableInfo; Spark caches it for catalog tables but not
    * for repeated `read.parquet` calls). The fixture files are immutable,
    * so the resolved DataFrame (plan metadata only — every execution still
    * scans the parquet) is reused per (session, dir, table). Keyed on the
    * session REFERENCE (not a hash) so distinct sessions never collide. */
  private val loadMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // the nanos conf must be set before the first events read in any
    // session; cheap, so set it unconditionally (memo hit or not)
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    loadMemo.computeIfAbsent((spark, dir, name), _ => build(spark, dir, name))
  }

  private def build(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped as INT64 TIMESTAMP(NANOS) (which Spark's
      // vectorized reader rejects — read nanos as long and divide to
      // micros, DuckDB's ns → us truncation) and as timestamp[us] without
      // UTC adjustment (which Spark 4 reads as TIMESTAMP_NTZ). Normalize
      // both to session-zone TIMESTAMP: the session runs UTC, so the
      // NTZ → LTZ cast is instant-preserving and matches DuckDB's naive
      // timestamps.
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
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
  /** ANALYZE is a full scan per table; the fixture files are immutable, so
    * the computed stats are too — re-ANALYZE per invocation was pure
    * re-computation (the reference's TableStatsService likewise refreshes
    * on a schedule, not per statement). The memo skips the scan when this
    * (session, dir) already analyzed and the catalog tables still exist;
    * the temp-view unshadowing stays per-call because interleaved entries
    * re-register fixture temp views. */
  private val statsMemo = java.util.concurrent.ConcurrentHashMap.newKeySet[
    (SparkSession, String)]()

  def registerAllWithStats(spark: SparkSession, dir: String): Unit = {
    // stats are pointless unless the planner consumes them
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    val firstTime = statsMemo.add((spark, dir))
    names.filterNot(_ == "events").foreach { n =>
      spark.catalog.dropTempView(n)
      // location guard (ADVICE r15): CREATE TABLE IF NOT EXISTS is a no-op
      // when the name already points at a DIFFERENT dir's files — the old
      // path would then ANALYZE (and memoize) the wrong scale factor's
      // data silently. Drop and recreate when the location mismatches.
      val want = new org.apache.hadoop.fs.Path(s"$dir/$n.parquet").toUri.getPath
      val cur =
        if (!spark.catalog.tableExists(n)) None
        else Some(new org.apache.hadoop.fs.Path(spark.sessionState.catalog
          .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(n))
          .location).toUri.getPath)
      if (cur.exists(_ != want)) spark.sql(s"DROP TABLE $n")
      if (firstTime || cur.isEmpty || cur.exists(_ != want)) {
        spark.sql(s"CREATE TABLE IF NOT EXISTS $n USING parquet LOCATION '$dir/$n.parquet'")
        spark.sql(s"ANALYZE TABLE $n COMPUTE STATISTICS")
      }
    }
    load(spark, dir, "events").createOrReplaceTempView("events")
  }
}
