package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Dynamic `OBJECT` columns (SURVEY.md §1 "hard parts").
  *
  * The reference's `OBJECT` column policies
  * (`libs/sql-parser/.../tree/ColumnPolicy.java`): `strict` (fixed
  * sub-schema), `dynamic` (new sub-columns appear on write), `ignored`
  * (untyped blob). Spark mapping implemented here:
  *
  *  - strict  → a `StructType` column: schema enforced at write time.
  *  - dynamic → schema-on-write via parquet `mergeSchema`: writers append
  *    files with wider struct schemas; readers see the union. Same contract
  *    as the reference's mapping updates, minus the cluster-state push.
  *  - ignored → keep the raw JSON string; [[objectSubscript]] lazily
  *    extracts typed paths (`get_json_object`), i.e. schema-on-read.
  */
object DynamicObjects {

  /** `o['a']['b']` subscript over an `ignored`-policy JSON string column. */
  def objectSubscript(jsonCol: Column, path: String*): Column =
    get_json_object(jsonCol, "$." + path.mkString("."))

  /** Parse an ignored-policy column into a typed struct on read. */
  def parseObject(jsonCol: Column, schema: StructType): Column =
    from_json(jsonCol, schema)

  /** Dynamic-policy write: append rows whose object column may carry NEW
    * sub-fields. Parquet stores each file's own schema. */
  def appendDynamic(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** Dynamic-policy read: union of all writers' schemas (mergeSchema). */
  def readDynamic(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
