package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder brief.
  *
  * `queries` maps every implemented SURVEY §2 operator (plus the pipeline
  * extension surface) to a runnable DataFrame build; `oracleSql` holds the
  * DuckDB-equivalent SQL for the hash-compare correctness gate. Queries
  * without an oracle (sketches, LSH, engine-specific hashes) get the
  * driver's weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on sf0.001 (TPC-H Q1 core); driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    QueriesRelational.queries("q02_tpch_q1")(spark, "/root/testdata/sf0.001")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesRelational.queries ++ QueriesWindow.queries ++
      QueriesFunctions.queries ++ QueriesFunctions2.queries ++
      QueriesFunctions3.queries ++ QueriesFunctions4.queries ++
      QueriesFunctions5.queries ++
      QueriesComposite.queries ++ QueriesPipeline.queries ++
      QueriesRound3.queries ++ QueriesRound4.queries ++
      QueriesRound5.queries ++ QueriesRound7.queries ++
      QueriesRound9.queries ++ QueriesRound10.queries ++
      QueriesRound11.queries ++ QueriesRound12.queries ++
      QueriesRound13.queries ++ QueriesRound14.queries ++
      QueriesRound15.queries

  def oracleSql: Map[String, String] =
    QueriesRelational.oracles ++ QueriesWindow.oracles ++
      QueriesFunctions.oracles ++ QueriesFunctions2.oracles ++
      QueriesFunctions3.oracles ++ QueriesFunctions4.oracles ++
      QueriesFunctions5.oracles ++
      QueriesComposite.oracles ++ QueriesPipeline.oracles ++
      QueriesRound3.oracles ++ QueriesRound4.oracles ++
      QueriesRound5.oracles ++ QueriesRound7.oracles ++
      QueriesRound9.oracles ++ QueriesRound10.oracles ++
      QueriesRound11.oracles ++ QueriesRound12.oracles ++
      QueriesRound13.oracles ++ QueriesRound14.oracles ++
      QueriesRound15.oracles
}
