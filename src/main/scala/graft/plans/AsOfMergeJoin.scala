package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, CreateStruct, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a first-class Catalyst operator: logical node → strategy →
  * sort-merge physical exec (the full custom-plan path, SURVEY.md §4 /
  * build-brief option (c)).
  *
  * Semantics: for each left row, the latest right row with
  * `rightTs <= leftTs` (strict: `<`) in the same key group; right rows with
  * NULL timestamps never match; left rows with NULL timestamps match
  * nothing; NULL keys group together (as-of is a carry within a key
  * partition, not an SQL equality join). Ties on (key, ts) among right rows
  * resolve to the maximal carry tuple — deterministic across retries, and
  * identical to the union-window formulation (graft.operators.AsOfJoin
  * .asOfUnionWindow), which the spec cross-checks.
  *
  * Why a custom exec beats the union-window trick at 100 TB: the union must
  * null-pad EVERY row to left-width + carry-width before its single big
  * shuffle+sort, so the exchange moves |L|+|R| maximally-wide rows. Here
  * each side shuffles only its own columns (the right side is pre-pruned to
  * key+ts+carry), EnsureRequirements co-partitions the two sides, each
  * sorts independently (AQE can pick different partition counts per side),
  * and the merge itself is a single streaming pass with O(1) state per
  * partition — no row widening, no window buffering.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    carry: Seq[Expression],
    carryOut: Seq[Attribute],
    strict: Boolean,
    /** (key, ts)-tie resolution columns — frozen at construction to the FULL
      * original carry list so that carry pruning (AsOfJoinRules) can never
      * change which right row wins a tie: a kept asof_ column's value must
      * not depend on which OTHER columns the query happens to select. */
    tieBreak: Seq[Expression]) extends BinaryNode {

  require(leftKeys.length == rightKeys.length, "as-of key arity mismatch")
  require(carry.length == carryOut.length, "carry/carryOut arity mismatch")
  // NOTE deliberately NO require on child output disjointness here: plan
  // canonicalization (cache/exchange reuse) rebuilds nodes with normalized
  // attrs ("none#0"...) that collide across children by design. The facade
  // (graft.operators.AsOfJoin.asOf) performs the self-join dedup + check.

  override def output: Seq[Attribute] = left.output ++ carryOut

  // carryOut attrs are minted by this node, not drawn from children —
  // without this the analyzer's MISSING_ATTRIBUTES check rejects the plan
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(carryOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, carry, carryOut, strict, tieBreak) =>
      AsOfMergeJoinExec(lk, rk, lts, rts, carry, carryOut, strict, tieBreak,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join. Children are hash-clustered on the keys and
  * sorted (keys, ts[, carry-struct]) — Spark's EnsureRequirements inserts
  * the exchanges/sorts exactly as it does for SortMergeJoin, so AQE,
  * partition coalescing and reuse all apply unchanged. */
case class AsOfMergeJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    carry: Seq[Expression],
    carryOut: Seq[Attribute],
    strict: Boolean,
    tieBreak: Seq[Expression],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ carryOut

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(carryOut)

  override def requiredChildDistribution: Seq[Distribution] =
    if (leftKeys.isEmpty) AllTuples :: AllTuples :: Nil
    else ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** Right side additionally sorts by the tie-break tuple (the FULL original
    * carry list — stable under carry pruning) so (key, ts) ties resolve
    * deterministically (max tuple wins via store-last). Skipped for
    * non-orderable types — ties are then input-order. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = {
    val rightTie =
      if (tieBreak.nonEmpty && tieBreak.forall(c => RowOrdering.isOrderable(c.dataType)))
        Seq(SortOrder(CreateStruct.create(tieBreak), Ascending))
      else Nil
    Seq(
      (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
      ((rightKeys :+ rightTs).map(SortOrder(_, Ascending))) ++ rightTie)
  }

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val carryExprs = carry
    val strictL = strict
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val nCarry = carryOut.length
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      if (!lIter.hasNext) Iterator.empty
      else {
        val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
        val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
        val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
        val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOut)
        val carryProj = UnsafeProjection.create(carryExprs, rOut)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
        val resultProj = UnsafeProjection.create(outAttrs, lOut ++ carryOut)
        val nullCarry = new GenericInternalRow(nCarry)
        val joined = new JoinedRow

        // O(1) merge state: the latest admissible right row's key + carry
        var storedKey: UnsafeRow = null
        var storedCarry: UnsafeRow = null
        var rHead: InternalRow = null

        def advanceRight(): Unit =
          rHead = if (rIter.hasNext) rIter.next() else null

        advanceRight()
        lIter.map { lRow =>
          val lKey = lKeyProj(lRow)
          val lTsRow = lTsProj(lRow)
          val lTsNull = lTsRow.isNullAt(0)
          // consume right rows that are admissible for this (and by sort
          // order, every later) left row; store-last-wins keeps the max
          // (ts, carry) among them
          var continue = rHead != null && !lTsNull
          while (continue) {
            val rKey = rKeyProj(rHead)
            val kc = keyOrd.compare(rKey, lKey)
            if (kc > 0) continue = false
            else if (kc < 0) {
              // right key already passed by the left cursor: no current or
              // future left row can match it (both sides key-sorted) — drain
              // without paying the store/copy
              advanceRight()
              continue = rHead != null
            } else {
              val rTsRow = rTsProj(rHead)
              val admissible =
                if (rTsRow.isNullAt(0)) true // NULL ts: consume, never store
                else {
                  val tc = tsOrd.compare(rTsRow, lTsRow)
                  if (strictL) tc < 0 else tc <= 0
                }
              if (admissible) {
                if (!rTsRow.isNullAt(0)) {
                  storedKey = rKey.copy()
                  storedCarry = carryProj(rHead).copy()
                }
                advanceRight()
                continue = rHead != null
              } else continue = false
            }
          }
          val matched = !lTsNull && storedKey != null && keyOrd.compare(storedKey, lKey) == 0
          resultProj(joined(lRow, if (matched) storedCarry else nullCarry))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfMergeJoin {
  /** Fresh output attributes for the carried columns. */
  def carryAttrs(carry: Seq[(String, org.apache.spark.sql.types.DataType)]): Seq[Attribute] =
    carry.map { case (n, dt) => AttributeReference(s"asof_$n", dt, nullable = true)() }
}
