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

  /** `information_schema.schemata` (reference
    * `metadata/information/InformationSchemataTableInfo.java`). */
  def schemata(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listDatabases().collect().toSeq
      .map(d => (Option(d.catalog).getOrElse("spark_catalog"), d.name))
      .toDF("catalog_name", "schema_name")
  }

  /** `information_schema.views` — temp + global views with their names;
    * Spark's catalog does not retain view text for temp views, so
    * `view_definition` is null there (the reference stores it). */
  def views(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listTables().collect().toSeq
      .filter(t => t.tableType != null &&
        (t.tableType.toUpperCase.contains("VIEW") || t.tableType.toUpperCase == "TEMPORARY"))
      .map(t => ("spark_catalog", "default", t.name, null: String))
      .toDF("table_catalog", "table_schema", "table_name", "view_definition")
  }

  /** `information_schema.routines` — registered SQL functions (reference
    * `InformationRoutinesTableInfo.java`: built-ins + UDFs). */
  def routines(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listFunctions().collect().toSeq
      .map(f => (f.name, if (f.isTemporary) "FUNCTION" else "FUNCTION",
        Option(f.className).getOrElse(""), f.isTemporary))
      .toDF("routine_name", "routine_type", "specific_name", "is_temporary")
  }

  /** `information_schema.table_constraints` — Spark tables carry no
    * enforced constraints; the view exists (reference parity) and is empty,
    * exactly like a constraint-free CrateDB schema. */
  def tableConstraints(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String, String, String, String)]
      .toDF("constraint_catalog", "constraint_schema", "constraint_name",
        "table_name", "constraint_type")
  }

  /** `information_schema.character_sets` — single UTF8 row (reference
    * `CharacterSetsTableInfo.java` hardcodes the same). */
  def characterSets(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("UTF8", "UCS", "UTF8")).toDF("character_set_name", "character_repertoire",
      "form_of_use")
  }

  /** Register all views under information_schema-style names. */
  def register(spark: SparkSession): Unit = {
    tables(spark).createOrReplaceTempView("information_schema_tables")
    columns(spark).createOrReplaceTempView("information_schema_columns")
    schemata(spark).createOrReplaceTempView("information_schema_schemata")
    views(spark).createOrReplaceTempView("information_schema_views")
    routines(spark).createOrReplaceTempView("information_schema_routines")
    tableConstraints(spark).createOrReplaceTempView("information_schema_table_constraints")
    characterSets(spark).createOrReplaceTempView("information_schema_character_sets")
  }
}
