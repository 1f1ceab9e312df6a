package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Catalyst optimizer rule: `graft_cosine(x, x)` ≡ 1.0 — self-similarity
  * folds to a literal, eliminating the whole dot-product loop when a
  * query joins a vector table to itself without excluding the diagonal.
  *
  * Deliberately small: it demonstrates the engine's optimizer-extension
  * tier (SURVEY.md §4: custom `Rule` slot) with a semantically safe
  * rewrite. Registered through `SparkSessionExtensions`
  * (`.withExtensions(new GraftExtensions)`) or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  *
  * Caveat: cosine(x,x) is NaN for a zero vector while this folds to 1.0;
  * embeddings are validated non-zero upstream (q37 norms), matching the
  * engine contract.
  */
object FoldSelfCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSim(a, b) if a.semanticEquals(b) && a.deterministic =>
        Literal(1.0, DoubleType)
    }
}

/** One-stop library installation: optimizer rule + both custom planner
  * strategies (per-group top-k, as-of join). A session built with
  * `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.functions.GraftExtensions`) plans
  * `TopKPerGroup` and `AsOfJoin` nodes without the DataFrame helpers'
  * call-time registration — the helpers keep their idempotent
  * `experimental.extraStrategies` fallback so either path works. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => FoldSelfCosine)
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    e.injectPlannerStrategy(_ => graft.plans.AsOfStrategy)
  }
}
