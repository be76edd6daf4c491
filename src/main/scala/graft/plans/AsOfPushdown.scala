package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Predicate pushdown THROUGH the custom as-of join.
  *
  * Catalyst's own PushDownPredicates only understands its built-in
  * operators, so without this rule a `Filter` above [[AsOfJoin]] stays
  * above it and the join processes rows the query immediately discards.
  * An as-of join is left-preserving and 1:1 (every left row emits exactly
  * one output row; payload columns are only attached), so any
  * deterministic conjunct that references ONLY left-side columns commutes
  * with the join and may move into the left child — where the stock rules
  * then carry it all the way into the scan (PushedFilters / partition
  * pruning). Conjuncts touching the nullable payload stay above.
  *
  * At 100 TB this is the difference between shuffling the full left side
  * into the join and shuffling only the rows the query wants.
  */
object AsOfPushdownRule extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoin) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
