package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text `MATCH` (reference:
  * `server/src/main/java/io/crate/expression/predicate/MatchPredicate.java:85`
  * backed by Lucene BM25). Spark-first rebuild in two tiers:
  *
  *  1. [[matchPredicate]] — row-local predicate: all/any query terms appear
  *     in the column (best_fields-ish boolean semantics). Native expressions.
  *  2. [[buildIndex]] / [[search]] — distributed inverted index as a
  *     DataFrame of postings with tf-idf scoring; the scale path (the index
  *     build is one shuffle; searches are broadcast-joined term lookups).
  */
object MatchText {

  private def termCol(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}\\p{N}]+"), t => length(t) > 0)

  /** `MATCH(col, 'query')` boolean: every query term occurs in the text. */
  def matchPredicate(text: Column, query: String): Column = {
    val terms = TextFunctions.tokenize(query.toLowerCase)
    terms.map(t => array_contains(termCol(text), t)).reduceOption(_ && _).getOrElse(lit(true))
  }

  /** `MATCH ... USING phrase`: exact phrase containment (normalized). */
  def phrasePredicate(text: Column, phrase: String): Column =
    lower(text).contains(phrase.toLowerCase)

  /** Inverted index: one row per (term, doc, tf) + doc count for idf.
    * Partitioned by term — the posting list layout a search engine shards. */
  def buildIndex(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), explode(termCol(col(textCol))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))

  /** BM25-ranked search (Robertson/Sparck-Jones, the scoring the reference
    * gets from Lucene): idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) summed over
    * query terms. Document length and avgdl come from the same index in two
    * cheap aggregations; scoring joins stay broadcast on the term side. */
  def searchBM25(index: DataFrame, query: String, topN: Int = 10,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val terms = TextFunctions.tokenize(query.toLowerCase).distinct.toSeq.toDF("term")
    val docLen = index.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val statsRow = docLen.agg(count(lit(1)), avg(col("dl"))).head()
    val nDocs = statsRow.getLong(0).toDouble
    val avgdl = statsRow.getDouble(1)
    val df_ = index.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    index.join(broadcast(terms), Seq("term"))
      .join(df_, Seq("term"))
      .join(docLen, Seq("doc_id"))
      .withColumn("idf", log(lit(1.0) + (lit(nDocs) - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("w", col("idf") * col("tf") * (k1 + 1) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl)))
      .groupBy("doc_id")
      .agg(sum(col("w")).as("score"), count(lit(1)).as("terms_hit"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topN)
  }

  /** tf-idf ranked search over a prebuilt index. Query terms are a tiny
    * DataFrame → broadcast hash join against the postings. */
  def search(index: DataFrame, query: String, topN: Int = 10): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val terms = TextFunctions.tokenize(query.toLowerCase).distinct.toSeq.toDF("term")
    val nDocs = index.select(col("doc_id")).distinct().count().toDouble
    val df_ = index.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    index.join(broadcast(terms), Seq("term"))
      .join(df_, Seq("term"))
      .withColumn("idf", log(lit(nDocs + 1.0) / (col("df") + 1.0)))
      .withColumn("w", col("tf") * col("idf"))
      .groupBy("doc_id")
      .agg(sum(col("w")).as("score"), count(lit(1)).as("terms_hit"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topN)
  }
}
