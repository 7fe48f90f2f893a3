package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Foreign data wrapper (SURVEY.md §2.2): the reference's
  * `CREATE SERVER / CREATE FOREIGN TABLE` JDBC FDW
  * (`server/src/main/java/io/crate/fdw/JdbcForeignDataWrapper.java`,
  * `fdw/JdbcBatchIterator.java`) maps directly onto Spark's JDBC source,
  * which already does predicate pushdown and parallel partitioned reads —
  * strictly more than the reference's single-connection iterator.
  *
  * Untested in this environment (zero egress, no JDBC endpoint); the
  * surface is a thin, declarative passthrough.
  */
object Fdw {

  final case class Server(url: String, user: String = "", password: String = "",
                          options: Map[String, String] = Map.empty)

  /** `SELECT ... FROM foreign_table` — whole-table or pushdown-filtered scan. */
  def foreignTable(spark: SparkSession, server: Server, table: String): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", server.url)
      .option("dbtable", table)
    val withAuth =
      if (server.user.nonEmpty) r.option("user", server.user).option("password", server.password)
      else r
    server.options.foldLeft(withAuth) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  /** Partitioned parallel scan on a numeric column — the scale path for
    * large foreign tables (N concurrent range-bounded connections). */
  def foreignTablePartitioned(spark: SparkSession, server: Server, table: String,
                              partitionCol: String, lower: Long, upper: Long,
                              numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", server.url)
      .option("dbtable", table)
      .option("user", server.user).option("password", server.password)
      .option("partitionColumn", partitionCol)
      .option("lowerBound", lower.toString)
      .option("upperBound", upper.toString)
      .option("numPartitions", numPartitions.toString)
      .load()
}
