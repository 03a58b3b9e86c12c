package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeSet, Expression, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rules for [[AsOfJoinPlan]] — the built-in pushdown/pruning
  * rules pattern-match known node types, so without these a custom operator
  * is an optimization BARRIER: every filter above an as-of join would run
  * after the join, and the left side would scan all of its columns even
  * when the query uses two. At 100 TB these rewrites are the difference
  * between scanning a day and scanning a year:
  *
  *  1. left-filter pushdown: conjuncts over left-side columns move below
  *     the join (each left row's carry is independent of other left rows,
  *     so filtering left early never changes surviving rows' results);
  *  2. key-predicate transfer: a pushable conjunct over ONLY the join keys
  *     also copies to the right side with left→right key substitution
  *     (right rows in excluded key groups can never be carried);
  *  3. carry pruning: `asof_*` columns a parent Project never references
  *     drop out of the node (narrower right shuffle); if NO carry survives,
  *     the join disappears entirely;
  *  4. left column pruning: left columns the parent neither projects nor
  *     the join needs (keys, ts) are cut below the node.
  *
  * Registration-order caveat: the per-session path
  * (`experimental.extraOptimizations`) runs in the optimizer's final
  * "User Provided Optimizers" batch — late enough that path-based parquet
  * scans still split filters at PHYSICAL planning (PhysicalOperation walks
  * the Filter/Project stack, so PushedFilters and partition pruning on
  * `spark.read.parquet(dir)` sources still work — spec-asserted), but too
  * late for catalog-table `PruneFileSourcePartitions` stats or DSv2
  * `V2ScanRelationPushDown`, which run in earlier batches. Clusters that
  * need those install `spark.sql.extensions=graft.plans.GraftExtensions`,
  * whose injectOptimizerRule runs with the main optimizer batches.
  */
object AsOfJoinRules extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {

    case f @ Filter(cond, j: AsOfJoinPlan) =>
      // only the conjuncts BEFORE the first nondeterministic one are
      // candidates (Spark's own pushdown contract): reordering a
      // deterministic conjunct below e.g. rand() would change which rows
      // the nondeterministic expression is evaluated on
      val conjuncts = splitConjunctivePredicates(cond)
      val (candidates, tail) = conjuncts.span(_.deterministic)
      val (push, keepHead) =
        candidates.partition(_.references.subsetOf(j.left.outputSet))
      val keep = keepHead ++ tail
      if (push.isEmpty) f
      else {
        val leftKeyAttrs = AttributeSet(j.leftKeys.flatMap(_.references))
        // left→right key substitution map (only for plain attribute keys —
        // widened Cast keys keep positional correspondence via references)
        val keyMap: Map[Attribute, Expression] =
          j.leftKeys.zip(j.rightKeys).collect {
            case (la: Attribute, re) => la -> re
          }.toMap
        val toRight = push.filter(p =>
          p.references.subsetOf(leftKeyAttrs) &&
            p.references.forall(keyMap.contains))
        val newLeft = Filter(push.reduce(And), j.left)
        val newRight =
          if (toRight.isEmpty) j.right
          else Filter(toRight.map(_.transform {
            case a: Attribute if keyMap.contains(a) => keyMap(a)
          }).reduce(And), j.right)
        val nj = j.copy(left = newLeft, right = newRight)
        if (keep.isEmpty) nj else Filter(keep.reduce(And), nj)
      }

    case p @ Project(list, j: AsOfJoinPlan) =>
      val used = AttributeSet(list.flatMap(_.references))
      val keptCarry = j.carryOut.zip(j.carry).filter { case (out, _) => used.contains(out) }
      if (keptCarry.isEmpty) {
        // no carried column survives — the as-of join is dead code
        Project(list, j.left)
      } else {
        val needLeft = j.left.output.filter(a =>
          used.contains(a) ||
            j.leftKeys.exists(_.references.contains(a)) ||
            j.leftTs.references.contains(a))
        val newLeft: LogicalPlan =
          if (needLeft.length == j.left.output.length) j.left
          else Project(needLeft.map(a => a: NamedExpression), j.left)
        if (keptCarry.length == j.carryOut.length && (newLeft eq j.left)) p
        else p.copy(child = j.copy(
          left = newLeft,
          carry = keptCarry.map(_._2),
          carryOut = keptCarry.map(_._1)))
      }
  }
}
