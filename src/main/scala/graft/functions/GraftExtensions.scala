package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{ArrayExists, EqualTo, Expression, If, IsNull, LambdaFunction, Literal, NamedLambdaVariable, Not}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Catalyst optimizer rule: `graft_cosine(x, x)` self-similarity folds
  * away the whole dot-product loop when a query joins a vector table to
  * itself without excluding the diagonal.
  *
  * The rewrite preserves the expression's semantics — an optimizer
  * rule must never change results:
  *  - NULL vector → NULL (BinaryExpression null-intolerance) — exact;
  *  - zero/empty vector → 0.0 (CosineSim's guarded denominator) — exact;
  *  - otherwise → 1.0, the mathematically true self-cosine. The
  *    computed path lands within 1 ULP of it (dot/(√n·√n) when n's
  *    square root is inexact), so this branch is bit-exact only when
  *    the norm is exactly representable — the deviation IS the
  *    optimization (matching bits would mean walking the norms anyway)
  *    and 1.0 is the more correct answer of the two.
  * So it folds to `if (isnull(x)) null else if (exists(x, e -> e != 0))
  * 1.0 else 0.0` — one short-circuiting pass with no multiplies and no
  * second norm walk, instead of a bare literal 1.0 that would turn NULL
  * and zero-vector rows into 1.0.
  *
  * Deliberately small: it demonstrates the engine's optimizer-extension
  * tier (SURVEY.md §4: custom `Rule` slot) with a semantically safe
  * rewrite. Registered through `SparkSessionExtensions`
  * (`.withExtensions(new GraftExtensions)`) or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object FoldSelfCosine extends Rule[LogicalPlan] {
  /** The rewrite is only applied to arrays whose type proves the
    * elements non-null: with a nullable element the two paths diverge —
    * `CosineSim.nullSafeEval` reads `getDouble` on the null slot (0.0
    * under UnsafeArrayData, NPE on a generic array) while the folded
    * `ArrayExists` evaluates under three-valued logic. Element-level
    * nulls are outside the engine's vector contract anyway (the dim
    * guard takes the same stance for lengths), but an optimizer rule
    * must not CHANGE what such inputs produce — so it simply declines
    * them. */
  private def elementsNonNull(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => !containsNull
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSim(a, b)
          if a.semanticEquals(b) && a.deterministic && elementsNonNull(a) =>
        val elem = NamedLambdaVariable("x", DoubleType, nullable = true)
        val nonZero = LambdaFunction(
          Not(EqualTo(elem, Literal(0.0, DoubleType))), Seq(elem))
        If(IsNull(a), Literal(null, DoubleType),
          If(ArrayExists(a, nonZero), Literal(1.0, DoubleType),
            Literal(0.0, DoubleType)))
    }
}

/** One-stop library installation: optimizer rule + both custom planner
  * strategies (per-group top-k, as-of join) + the SQL function registry
  * entries. A session built with `.withExtensions(new GraftExtensions)`
  * (or `spark.sql.extensions=graft.functions.GraftExtensions`) plans
  * `TopKPerGroup` and `AsOfJoin` nodes and resolves `graft_cosine` from
  * plain SQL text without the DataFrame helpers' call-time
  * registration — the helpers keep their idempotent fallbacks
  * (`experimental.extraStrategies`, `createOrReplaceTempFunction`) so
  * either path works. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => FoldSelfCosine)
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    e.injectPlannerStrategy(_ => graft.plans.AsOfStrategy)
    // SQL front door for the codegen expressions: a SQL-first session
    // reaches the engine's similarity and overlap kernels by name
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(CosineSim.FnName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CosineSim].getCanonicalName, CosineSim.FnName),
      CosineSim.build _))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(SortedOverlapCount.FnName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SortedOverlapCount].getCanonicalName, SortedOverlapCount.FnName),
      SortedOverlapCount.build _))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(BitInterleave16.FnName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[BitInterleave16].getCanonicalName, BitInterleave16.FnName),
      BitInterleave16.build _))
    // ... and for the UDAF tier: `graft_simhash(hash)` aggregates from
    // SQL text through the same ScalaAggregator the Column API binds
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(SimhashAgg.FnName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        SimhashAgg.getClass.getCanonicalName, SimhashAgg.FnName),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1) throw new IllegalArgumentException(
          s"${SimhashAgg.FnName} takes 1 argument (token hash bigint), " +
            s"got ${exprs.length}")
        // the bare ScalaAggregator, NOT pre-wrapped in an
        // AggregateExpression — the analyzer wraps registry-built
        // aggregate functions itself (same contract as udf.register)
        org.apache.spark.sql.graftshim.GraftSqlShim
          .scalaAggregator(SimhashAgg.asUdaf, exprs)
      }))
    // SQL front door for the whole-operator tiers: table-valued
    // `graft_asof(...)` / `graft_topk(...)` resolve from query text to
    // the custom logical nodes (and thence, via the strategies injected
    // above, to AsOfJoinExec / TopKPerGroupExec)
    graft.plans.GraftTableFunctions.descriptions.foreach(e.injectTableFunction)
  }
}
