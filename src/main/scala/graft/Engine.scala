package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Engine facade: session tuning + SQL entry point.
  *
  * The reference's whole query lifecycle (parse → analyze → plan → optimize →
  * distributed phases; SURVEY.md §3, `io/crate/planner/Planner.java:273`)
  * collapses onto Catalyst. What remains for us is session configuration and
  * a small dialect shim ([[Dialect]]).
  *
  * Scale notes (targets a 1000-executor cluster even though tests run
  * local[32]):
  *  - AQE on: runtime partition coalescing, skew-join splitting and
  *    dynamic join-strategy switches replace the reference's stats-driven
  *    `ReorderHashJoin` / circuit-breaker machinery.
  *  - CBO + join reorder on: mirrors the reference's join-graph reordering
  *    (`planner/optimizer/rule/EliminateCrossJoin.java:50`).
  *  - shuffle partitions default to the local core count here; on a real
  *    cluster set it ~2-3× total cores (AQE coalesces the excess).
  */
object Engine {
  def session(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      // runtime bloom-filter pushdown on shuffle joins: the big-side scan
      // drops rows that can't match a selectively-filtered build side — the
      // lookup-join/runtime-filter analogue of the reference's doc-id
      // intersection, and a large win at 100 TB fact-dim joins
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // reference/PG standard-conforming strings: no backslash escapes
      // in '...' literals (also enforced in GraftFunctions.registerAll)
      .config("spark.sql.parser.escapedStringLiterals", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.registerAll(spark)
    // stage-completion ring for sys.operations_log starts with the session
    graft.sources.SysCatalog.installListener(spark)
    spark
  }

  /** SQL entry point with the CrateDB-isms translated (see [[Dialect]]).
    * Every statement lands in the `sys.jobs_log` ring buffer with its wall
    * time and outcome (reference `SysJobsLogTableInfo.java`).
    *
    * Fidelity note: `spark.sql` is lazy, so the recorded duration covers
    * parse/analyze/plan only and a failure that surfaces at action time
    * is not retro-logged — unlike the reference's ring buffer, which logs
    * completed execution. jobs_log here is a statement audit, not a
    * runtime profiler; Spark's own listener/UI is the runtime source of
    * truth. Documented rather than hooked (a QueryExecutionListener fires
    * per-action, not per-statement, and would double-count multi-action
    * DataFrames). */
  def sql(spark: SparkSession, stmt: String): DataFrame = {
    val t0 = System.currentTimeMillis
    try {
      val df = spark.sql(Dialect.translate(stmt))
      sources.SysCatalog.recordJob(stmt, t0, System.currentTimeMillis)
      df
    } catch {
      case e: Exception =>
        sources.SysCatalog.recordJob(stmt, t0, System.currentTimeMillis, e.getMessage)
        throw e
    }
  }
}
