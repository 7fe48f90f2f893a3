package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) join — the entity-resolution primitive a curation
  * pipeline needs to link near-identical names/titles across tables.
  *
  * Scale shape is the familiar block → equi-join → verify: both sides
  * explode to distinct character q-grams (native `transform`/`substring`
  * expressions, no UDF), grams above `maxGramFreq` are dropped (stop-gram
  * pruning — "Customer#00" style boilerplate would otherwise bucket
  * everything together), candidates are the distinct id pairs sharing a
  * surviving gram, and Spark's codegen'd `levenshtein` verifies. Nothing is
  * ever cross-joined.
  *
  * Recall: `maxDist` edits destroy at most `q·maxDist` grams, so pairs of
  * strings longer than `q·(maxDist+1)` always share a gram; pruning trades
  * recall only on grams more frequent than `maxGramFreq`.
  */
object FuzzyJoin {

  def pairs(a: DataFrame, aIdCol: String, aStrCol: String,
            b: DataFrame, bIdCol: String, bStrCol: String,
            maxDist: Int, q: Int = 3, maxGramFreq: Int = 10000): DataFrame = {
    val aa = a.select(col(aIdCol).as("id_a"), col(aStrCol).as("s_a"))
    val bb = b.select(col(bIdCol).as("id_b"), col(bStrCol).as("s_b"))
    def grams(df: DataFrame, id: String, s: String) =
      df.where(col(s).isNotNull).select(col(id), explode(array_distinct(expr(
        s"transform(sequence(1, greatest(length($s) - ${q - 1}, 1)), i -> substring($s, i, $q))")))
        .as("gram"))
    val ga = grams(aa, "id_a", "s_a")
    val gb = grams(bb, "id_b", "s_b")
    val keep = ga.select(col("gram")).unionAll(gb.select(col("gram")))
      .groupBy(col("gram")).agg(count(lit(1)).as("f"))
      .filter(col("f") <= maxGramFreq).select(col("gram"))
    val cands = ga.join(keep, Seq("gram")).join(gb.join(keep, Seq("gram")), Seq("gram"))
      .select(col("id_a"), col("id_b")).distinct()
    cands.join(aa, Seq("id_a")).join(bb, Seq("id_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
