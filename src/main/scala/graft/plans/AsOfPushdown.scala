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

/** Column pruning THROUGH the custom as-of join.
  *
  * Catalyst's ColumnPruning only understands its built-in operators, so a
  * `Project` above [[AsOfJoin]] leaves both children producing every
  * column — at 100 TB that is scan width and shuffle bytes for data the
  * query never reads. Driven by the Project above the join:
  *
  *  - unreferenced payload columns leave the node's `payload` list;
  *  - the left child narrows to (referenced left columns ∪ keys ∪ ts);
  *  - the right child narrows to (keys ∪ ts ∪ tiebreak ∪ kept payload).
  *
  * The inserted child Projects are then fair game for the stock rules,
  * which carry the narrowing into the scans (ReadSchema). Fires only
  * when something actually narrows, so the fixed point terminates.
  */
object AsOfPruningRule extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, j: AsOfJoin) =>
      val refs = p.references
      val keptPayload = j.payload.filter(a => refs.contains(a))
      val leftNeeded = AttributeSet(
        j.left.output.filter(refs.contains) ++ j.leftKeys :+ j.leftTs)
      val rightNeeded = AttributeSet(
        j.rightKeys ++ Seq(j.rightTs) ++ j.rightTiebreak ++ keptPayload)
      val narrowLeft = leftNeeded.size < j.left.output.size
      val narrowRight = rightNeeded.size < j.right.output.size
      if (keptPayload.size == j.payload.size && !narrowLeft && !narrowRight) p
      else {
        val newLeft =
          if (narrowLeft) Project(j.left.output.filter(leftNeeded.contains), j.left)
          else j.left
        val newRight =
          if (narrowRight) Project(j.right.output.filter(rightNeeded.contains), j.right)
          else j.right
        p.copy(child = j.copy(left = newLeft, right = newRight, payload = keptPayload))
      }
  }
}
