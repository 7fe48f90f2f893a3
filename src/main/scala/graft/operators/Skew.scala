package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-salting for joins whose hot keys AQE can't fix (e.g. when
  * the skewed side feeds a non-splittable downstream stage, or on engines
  * with AQE disabled).
  *
  * Standard technique: the skewed (large) side gets a random-free,
  * deterministic salt derived from a row-unique column; the small side is
  * replicated `saltFactor` times with every salt value. The join key becomes
  * (key, salt) — one hot key fans out across `saltFactor` reducers.
  *
  * Deterministic by construction (salt = pmod(xxhash64(unique col), N)), so
  * retries and speculative tasks agree.
  */
object Skew {

  /** Inner/left equi-join `large ⋈ small` on `key`, salted `saltFactor` ways.
    * `uniqueCol` is any column of `large` that varies within a key group
    * (a row id); it seeds the deterministic salt. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 uniqueCol: String, saltFactor: Int = 16,
                 joinType: String = "inner"): DataFrame = {
    val salted = large.withColumn("__salt", pmod(xxhash64(col(uniqueCol)), lit(saltFactor)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Per-key frequency report — find the hot keys worth salting.
    * One partial-aggregated pass; `topN` rows to the driver. */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(key)).limit(topN)
}
