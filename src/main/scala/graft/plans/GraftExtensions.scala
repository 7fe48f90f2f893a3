package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst integration for graft (SURVEY.md §4 "custom work" item 5 —
  * shown here even though parity doesn't demand it, because it is the
  * mechanism a deployment uses to get graft behavior without code changes:
  * `spark.sql.extensions=graft.plans.GraftExtensions`).
  *
  * Injects an optimizer rule that transparently replaces the black-box
  * `vector_cosine` Scala UDF (kept for API compatibility) with the
  * codegen'd [[CosineSimilarityExpr]]: same semantics, but the optimizer
  * regains null-propagation/codegen and the row path loses the
  * serialization round-trip. The pattern generalizes: any UDF with a native
  * twin can be promoted post-hoc.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteVectorUdfs)
  }
}

/** `vector_cosine(a, b)` (ScalaUDF) → `CosineSimilarityExpr(a, b)`. */
object RewriteVectorUdfs extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case u: ScalaUDF if u.udfName.contains("vector_cosine") && u.children.size == 2 =>
        CosineSimilarityExpr(u.children(0), u.children(1))
    }
}
