package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** `COPY FROM` / `COPY TO` (SURVEY.md §2.2).
  *
  * Reference semantics: `COPY t FROM path` ingests json-lines or csv, with
  * glob support and a `RETURN SUMMARY` error channel
  * (`server/src/main/java/io/crate/execution/engine/collect/files/FileReadingIterator.java`,
  * `analyze/AnalyzedCopyFromReturnSummary.java`); `COPY t TO` writes
  * json-lines/csv, optionally gzipped
  * (`execution/dsl/projection/WriterProjection.java:45`).
  *
  * Spark-first: `spark.read.json/csv` already does distributed globbed,
  * gzip-transparent reads. The summary channel maps onto PERMISSIVE mode's
  * corrupt-record column + `input_file_name()` — per-file good/bad counts
  * come from one aggregation, no driver-side file loop.
  */
object CopyOps {

  val CorruptCol = "_corrupt_record"

  /** COPY FROM json-lines. Returns (good rows, per-file summary).
    * `schema` is required for a stable error channel (schema-on-read with a
    * corrupt-record column — same contract as the reference's typed target
    * table). Paths may be globs; .gz files decompress transparently. */
  def copyFromJson(spark: SparkSession, schema: StructType, paths: String*): (DataFrame, DataFrame) = {
    val withCorrupt = StructType(schema.fields :+ StructField(CorruptCol, StringType, nullable = true))
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(paths: _*)
      .withColumn("_file", input_file_name())
    split(raw, schema)
  }

  /** COPY FROM csv (with header). Same contract as [[copyFromJson]]. */
  def copyFromCsv(spark: SparkSession, schema: StructType, header: Boolean, paths: String*): (DataFrame, DataFrame) = {
    val withCorrupt = StructType(schema.fields :+ StructField(CorruptCol, StringType, nullable = true))
    val raw = spark.read
      .schema(withCorrupt)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(paths: _*)
      .withColumn("_file", input_file_name())
    split(raw, schema)
  }

  /** (good rows without bookkeeping cols, RETURN SUMMARY per file).
    * The parsed scan is cached: Spark disallows plans that read ONLY the
    * corrupt-record column from a raw file scan (the summary aggregation
    * would), and the cache also keeps COPY single-pass over the input. */
  private def split(raw0: DataFrame, schema: StructType): (DataFrame, DataFrame) = {
    val raw = raw0.cache()
    val good = raw.filter(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val summary = raw.groupBy(col("_file").as("uri"))
      .agg(
        count(when(col(CorruptCol).isNull, 1)).as("success_count"),
        count(col(CorruptCol)).as("error_count"),
        slice(collect_list(col(CorruptCol)), 1, 5).as("error_samples"))
      .orderBy(col("uri"))
    (good, summary)
  }

  /** COPY TO json-lines; gzip optional (reference formats :67-68). */
  def copyToJson(df: DataFrame, path: String, gzip: Boolean = false): Unit = {
    val w = df.write.mode("overwrite")
    (if (gzip) w.option("compression", "gzip") else w).json(path)
  }

  def copyToCsv(df: DataFrame, path: String, gzip: Boolean = false, header: Boolean = true): Unit = {
    val w = df.write.mode("overwrite").option("header", header.toString)
    (if (gzip) w.option("compression", "gzip") else w).csv(path)
  }

  /** COPY TO in the engine-native columnar format, optionally
    * value-partitioned (`COPY (query) TO dir WITH (format = parquet)
    * PARTITION BY (col)`): what a pipeline stage hands to the next one.
    * Partition columns become directory keys → downstream scans prune. */
  def copyToParquet(df: DataFrame, path: String,
                    partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }
}
