package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** `information_schema` emulation (SURVEY.md §2.2): the reference exposes
  * 27 information_schema tables (`metadata/information/`) plus `sys.*` and
  * `pg_catalog.*`. On Spark the catalog is the source of truth; these views
  * are small driver-built DataFrames — correct at any scale because catalog
  * metadata is never data-sized.
  */
object InformationSchema {

  def tables(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listTables().collect().toSeq
      .map(t => (Option(t.catalog).getOrElse("spark_catalog"),
        Option(t.namespace).map(_.mkString(".")).filter(_.nonEmpty).getOrElse("default"),
        t.name, t.tableType))
      .toDF("table_catalog", "table_schema", "table_name", "table_type")
  }

  def columns(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = spark.catalog.listTables().collect().toSeq.flatMap { t =>
      spark.catalog.listColumns(t.name).collect().toSeq.zipWithIndex.map { case (c, i) =>
        ("spark_catalog", "default", t.name, c.name, i + 1, c.dataType,
          c.nullable)
      }
    }
    rows.toDF("table_catalog", "table_schema", "table_name", "column_name",
      "ordinal_position", "data_type", "is_nullable")
  }

  /** Register both views under information_schema-style names. */
  def register(spark: SparkSession): Unit = {
    tables(spark).createOrReplaceTempView("information_schema_tables")
    columns(spark).createOrReplaceTempView("information_schema_columns")
  }
}
