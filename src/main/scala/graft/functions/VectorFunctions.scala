package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector similarity over `array<float>` embedding columns.
  *
  * Reference surface: `knn_match` / `vector_similarity`
  * (`server/src/main/java/io/crate/expression/scalar/KnnMatch.java:48`,
  * `VectorSimilarityFunction.java:35`) over `FLOAT_VECTOR` columns.
  *
  * Implementation is pure native higher-order functions (`zip_with` +
  * `aggregate`), which Catalyst evaluates without UDF serialization overhead
  * and keeps inside the optimized plan; math is double-precision and
  * sequential, so results are deterministic.
  */
object VectorFunctions {

  /** Codegen'd native cosine (graft.plans.CosineSimilarityExpr). Requires
    * [[GraftFunctions.registerAll]] on the session (idempotent, cheap).
    * Bit-identical to [[cosineSimilarity]]; one fused loop, no intermediate
    * arrays. */
  def cosineNative(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  /** Codegen'd native dot product (graft.plans.DotProductExpr). */
  def dotNative(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  private def d(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(d(a), lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity in [-1, 1]; null-safe via Spark's null propagation. */
  def cosineSimilarity(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Euclidean (L2) distance. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** CrateDB's `vector_similarity` = 1 / (1 + l2²) (Lucene convention). */
  def vectorSimilarity(a: Column, b: Column): Column = {
    val l2sq = aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
    lit(1.0) / (lit(1.0) + l2sq)
  }
}
