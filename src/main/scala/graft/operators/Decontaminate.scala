package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag/drop corpus
  * documents that share any word n-gram with a benchmark/eval set (the
  * standard n=8 exact-substring protocol used for LLM training-data
  * hygiene).
  *
  * Scale shape (the benchmark set is small — thousands to millions of
  * rows — while the corpus is the 100 TB side):
  *  - the benchmark's distinct gram set is hashed to 8-byte keys and
  *    broadcast; the corpus side streams map-only through the join —
  *    corpus text is never shuffled, and no corpus-side aggregation
  *    happens before the match filter;
  *  - only matched (doc_id, gram-hash) survivors reach the per-doc count,
  *    so the one shuffle is proportional to the contamination rate, not
  *    the corpus.
  *
  * Reference capability analogue: crate/crate exposes the building blocks
  * (ngram analyzers, `server/src/main/java/io/crate/analyze/...` fulltext
  * options); the end-to-end decontamination pass is pipeline surface the
  * brief asks for beyond reference parity.
  */
object Decontaminate {

  private def wordGrams(n: Int) = udf((t: String) =>
    if (t == null) null
    else TextFunctions.tokenize(t).sliding(n).filter(_.length == n)
      .map(_.mkString(" ")).toArray.distinct)

  /** (doc_id, n_shared_grams) for every corpus doc sharing at least one
    * word `n`-gram with `benchmark`. Gram equality is exact (deterministic
    * tokenization: lowercase, whitespace split). */
  def flagContaminated(corpus: DataFrame, benchmark: DataFrame,
                       idCol: String, textCol: String, n: Int = 8): DataFrame = {
    val g = wordGrams(n)
    val benchGrams = benchmark
      .select(explode(g(col(textCol))).as("gram"))
      .select(xxhash64(col("gram")).as("gkey")).distinct()
    corpus
      .select(col(idCol).as("doc_id"), explode(g(col(textCol))).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("gkey"))
      .join(broadcast(benchGrams), Seq("gkey"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_grams")) // gkeys are distinct per doc already
  }

  /** Corpus minus contaminated docs (left_anti on the flagged set). The
    * flagged set is contamination-rate-sized, not corpus-sized, but is NOT
    * broadcast-hinted — AQE decides (same policy as Dedup.minhashDedup). */
  def dropContaminated(corpus: DataFrame, benchmark: DataFrame,
                       idCol: String, textCol: String, n: Int = 8): DataFrame =
    corpus.join(flagContaminated(corpus, benchmark, idCol, textCol, n)
      .select(col("doc_id").as(idCol)), Seq(idCol), "left_anti")
}
