package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}
import graft.functions.{JaccardCountsExpr, ShingleHashesExpr}

/**
 * Catalyst optimizer rule: rewrite the naive Jaccard-verify formulation
 *
 *   size(array_intersect(a, b)) / size(array_union(a, b))
 *
 * into the fused `jaccard_counts` kernel (one hash-set build + one probe;
 * see Hashing.jaccardCounts — ~2x on the blocked-verify hot loop) whenever
 * the inputs are PROVABLY duplicate-free. The guard matters: on arrays with
 * duplicates, array_intersect/array_union deduplicate their OUTPUT but the
 * packed counts would diverge — so the rule only fires when both sides are
 * expressions this engine knows produce distinct elements (shingle sets and
 * minhash signatures... the latter technically can repeat a value across
 * hash functions, so only shingle sets qualify).
 *
 * This is the engine's demonstration of the SparkSessionExtensions path
 * (SURVEY.md §4.2): users who write the textbook formulation get the kernel
 * for free; DedupOps calls it directly. Codegen subexpression elimination
 * dedupes the two jaccard_counts calls inside a projection.
 */
object FuseJaccardCounts extends Rule[LogicalPlan] {

  /** True iff the expression provably yields a duplicate-free array<long>. */
  private def isDistinctArray(e: Expression): Boolean = e match {
    case _: ShingleHashesExpr => true
    case Alias(c, _)          => isDistinctArray(c)
    case _                    => false
  }

  private def fused(a: Expression, b: Expression, hi: Boolean): Expression = {
    val packed = JaccardCountsExpr(a, b)
    val part =
      if (hi) ShiftRight(packed, Literal(32))
      else BitwiseAnd(packed, Literal(0xFFFFFFFFL, LongType))
    Cast(part, IntegerType)
  }

  // The legacySizeOfNull guard: with spark.sql.legacy.sizeOfNull=true the
  // original Size returns -1 for a null array while the fused kernel is
  // null-propagating — only fire under the modern (false) semantics.
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(ArrayIntersect(a, b), false) if isDistinctArray(a) && isDistinctArray(b) =>
      fused(a, b, hi = true)
    case Size(ArrayUnion(a, b), false) if isDistinctArray(a) && isDistinctArray(b) =>
      fused(a, b, hi = false)
  }
}

/** Session extensions installer: `GraftSession` wires this in; standalone
  * sessions can use `.withExtensions(GraftExtensions)`. */
object GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => FuseJaccardCounts)
}
