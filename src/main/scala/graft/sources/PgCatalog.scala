package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Minimal `pg_catalog` emulation — the tables PostgreSQL clients and BI
  * tools actually probe on connect (reference `metadata/pgcatalog/` ships
  * 31; this is the compat core: pg_type, pg_namespace, pg_class,
  * pg_attribute, pg_proc, pg_database, pg_settings). OIDs are stable
  * name hashes, the same trick the reference uses (`OidHash.java`) since
  * neither engine has real Postgres OIDs. `Dialect.translate` strips the
  * `pg_catalog.` qualifier, so `SELECT * FROM pg_catalog.pg_type` works.
  */
object PgCatalog {

  /** Stable positive pseudo-OID (reference metadata/pgcatalog/OidHash.java). */
  def oid(name: String): Int = {
    val h = name.hashCode
    if (h == Int.MinValue) 42 else math.abs(h)
  }

  /** Postgres type OIDs for the Spark types we surface (the real wire-level
    * constants — clients hardcode these). */
  def pgTypeOid(dt: DataType): Int = dt match {
    case BooleanType      => 16
    case BinaryType       => 17
    case LongType         => 20
    case ShortType | ByteType => 21
    case IntegerType      => 23
    case _: StringType    => 25
    case FloatType        => 700
    case DoubleType       => 701
    case DateType         => 1082
    case TimestampNTZType => 1114
    case TimestampType    => 1184
    case _: DecimalType   => 1700
    case ArrayType(e, _)  => pgArrayOid(e)
    case _                => 2249 // record
  }

  private def pgArrayOid(e: DataType): Int = e match {
    case BooleanType   => 1000
    case LongType      => 1016
    case IntegerType   => 1007
    case _: StringType => 1009
    case FloatType     => 1021
    case DoubleType    => 1022
    case _             => 2287 // _record
  }

  def pgType(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (16, "bool", 1), (17, "bytea", -1), (20, "int8", 8), (21, "int2", 2),
      (23, "int4", 4), (25, "text", -1), (700, "float4", 4), (701, "float8", 8),
      (1000, "_bool", -1), (1007, "_int4", -1), (1009, "_text", -1),
      (1016, "_int8", -1), (1021, "_float4", -1), (1022, "_float8", -1),
      (1043, "varchar", -1), (1082, "date", 4), (1114, "timestamp", 8),
      (1184, "timestamptz", 8), (1700, "numeric", -1), (2249, "record", -1),
      (2287, "_record", -1), (114, "json", -1)
    ).toDF("oid", "typname", "typlen")
  }

  def pgNamespace(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((11, "pg_catalog"), (2200, "public"), (oid("information_schema"), "information_schema"),
      (oid("sys"), "sys"), (oid("doc"), "doc"))
      .toDF("oid", "nspname")
  }

  def pgClass(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listTables().collect().toSeq.map { t =>
      val kind = if (t.tableType != null && t.tableType.toUpperCase.contains("VIEW")) "v" else "r"
      (oid(t.name), t.name, 2200, kind)
    }.toDF("oid", "relname", "relnamespace", "relkind")
  }

  def pgAttribute(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = spark.catalog.listTables().collect().toSeq.flatMap { t =>
      try {
        spark.table(t.name).schema.fields.toSeq.zipWithIndex.map { case (f, i) =>
          (oid(t.name), f.name, pgTypeOid(f.dataType), i + 1, !f.nullable)
        }
      } catch { case _: Exception => Nil }
    }
    rows.toDF("attrelid", "attname", "atttypid", "attnum", "attnotnull")
  }

  def pgProc(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listFunctions().collect().toSeq
      .map(f => (oid(f.name), f.name, 11))
      .toDF("oid", "proname", "pronamespace")
  }

  def pgDatabase(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((oid("graft"), "graft", "UTF8")).toDF("oid", "datname", "encoding")
  }

  /** Credential-bearing conf values (fs.s3a secret keys, JDBC passwords,
    * tokens) are masked — same policy as `user_mapping_options`, which
    * already hides passwords; exposing the raw conf through SQL would leak
    * them to any client that can SELECT. */
  private val secretConfKey =
    java.util.regex.Pattern.compile("(?i)(password|secret|token|credential|\\bkey\\b|\\.key$|access[._-]?key|private[._-]?key)")

  def pgSettings(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.conf.getAll.toSeq.sortBy(_._1)
      .map { case (k, v) =>
        (k, if (secretConfKey.matcher(k).find()) "********" else v)
      }
      .toDF("name", "setting")
  }

  def registerAll(spark: SparkSession): Unit = {
    pgType(spark).createOrReplaceTempView("pg_type")
    pgNamespace(spark).createOrReplaceTempView("pg_namespace")
    pgClass(spark).createOrReplaceTempView("pg_class")
    pgAttribute(spark).createOrReplaceTempView("pg_attribute")
    pgProc(spark).createOrReplaceTempView("pg_proc")
    pgDatabase(spark).createOrReplaceTempView("pg_database")
    pgSettings(spark).createOrReplaceTempView("pg_settings")
  }
}
