package graft.queries

import org.apache.spark.sql.DataFrame

/** Test seam for package-private query plumbing (TruthMemo guards). */
object QueriesAccess {
  def truthExactPairs(emb: DataFrame, threshold: Double, key: String): DataFrame =
    QueriesPipeline.TruthMemo.exactPairs(emb, threshold, key)
}
