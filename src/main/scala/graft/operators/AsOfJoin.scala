package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Generic as-of join: for each left row, the latest right row with
  * `rightTs <= leftTs` (or strictly `<`) within the same key.
  *
  * Default path is the native Catalyst operator (graft.plans.AsOfJoinPlan →
  * AsOfMergeJoinExec): each side shuffles only its own pruned columns,
  * EnsureRequirements co-partitions them, and the merge is one streaming
  * pass with O(1) state — no row widening through the exchange. A hot key
  * degrades to a sort, never a row explosion.
  *
  * [[asOfUnionWindow]] keeps the composable union → window-carry
  * formulation (one shuffle of L+R null-padded rows) as the differential
  * oracle — AsOfJoinSpec proves both produce identical results.
  */
object AsOfJoin {

  /** @param carry right-side columns to carry onto left rows (prefixed `asof_`)
    * @param strict if true, right rows at exactly leftTs are not matched */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, carry: Seq[String],
           strict: Boolean = false): DataFrame = {
    import org.apache.spark.sql.graftbridge.PlanBridge
    val spark = left.sparkSession
    PlanBridge.addStrategy(spark, graft.plans.AsOfJoinStrategy)
    PlanBridge.addOptimization(spark, graft.plans.AsOfJoinRules)
    // left: keys first then the rest (the documented output order); right:
    // pruned to exactly keys+ts+carry with unmatchable NULL-ts rows dropped
    val leftCols = left.columns
    val lPrep = left.select((keys ++ leftCols.filterNot(keys.contains)).map(col): _*)
    val rPrep = right.where(col(rightTs).isNotNull)
      .select(((keys :+ rightTs) ++ carry).distinct.map(col): _*)
    val lPlan = lPrep.queryExecution.analyzed
    // Self-join hazard: if left and right derive from the same relation the
    // two analyzed plans SHARE attribute exprIds, and the optimizer then
    // treats a right-side key as already provided by the left (it pruned the
    // right key column entirely — ATTRIBUTE_NOT_FOUND at exec). Spark's
    // analyzer fixes this for built-in joins in DeduplicateRelations; a
    // custom node must do it itself: re-instance every shared leaf relation
    // on the right, letting transformUpWithNewOutput rewrite the plan's
    // upstream references to the fresh ids.
    val rPlan = {
      import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
      import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
      import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
      // conflicts are EVERY left-subtree attribute, not just its output —
      // a shared leaf or shared intermediate alias collides even when the
      // left's final projection hides it
      val lAll = lPlan.outputSet ++ org.apache.spark.sql.catalyst.expressions.AttributeSet(
        lPlan.collect { case p => p.output }.flatten)
      val raw = rPrep.queryExecution.analyzed
      def renewAliases(nes: Seq[NamedExpression]): Seq[NamedExpression] = nes.map {
        case a: Alias if lAll.contains(a.toAttribute) => Alias(a.child, a.name)()
        case ne => ne
      }
      // entry guard uses lAll, not just lPlan.outputSet: right OUTPUT attrs
      // can collide with left INTERMEDIATE attrs (left re-aliased on top of
      // the shared relation) and still confuse attr-id-keyed optimizer state
      val rawAll = raw.outputSet ++ org.apache.spark.sql.catalyst.expressions.AttributeSet(
        raw.collect { case p => p.output }.flatten)
      val deduped =
        if (rawAll.intersect(lAll).isEmpty) raw
        else raw.transformUpWithNewOutput {
          case m: MultiInstanceRelation
              if m.asInstanceOf[LogicalPlan].outputSet.intersect(lAll).nonEmpty =>
            val fresh = m.newInstance()
            fresh -> m.asInstanceOf[LogicalPlan].output.zip(fresh.output)
          case p: Project if p.outputSet.intersect(lAll).nonEmpty =>
            val np = p.copy(projectList = renewAliases(p.projectList))
            np -> p.output.zip(np.output).filter { case (o, n) => o != n }
          case a: Aggregate if a.outputSet.intersect(lAll).nonEmpty =>
            val na = a.copy(aggregateExpressions = renewAliases(a.aggregateExpressions))
            na -> a.output.zip(na.output).filter { case (o, n) => o != n }
        }
      require(deduped.outputSet.intersect(lPlan.outputSet).isEmpty,
        "as-of join: could not deduplicate attributes shared between left and right")
      deduped
    }
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"as-of column not found: $n"))
    // mismatched key/ts types must COERCE, not silently lose every match:
    // the exec hashes and compares each side with its own type, so INT vs
    // BIGINT keys would land in different partitions and compare garbage
    // (built-in joins get this from the analyzer's type coercion — a custom
    // node must do it itself). Widen both sides to the tightest common type.
    import org.apache.spark.sql.catalyst.analysis.TypeCoercion
    import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
    def widen(l: Expression, r: Expression, what: String): (Expression, Expression) =
      if (l.dataType == r.dataType) (l, r)
      else TypeCoercion.findTightestCommonType(l.dataType, r.dataType) match {
        case Some(t) => (Cast(l, t), Cast(r, t))
        case None => throw new IllegalArgumentException(
          s"as-of $what types are incompatible: ${l.dataType.sql} vs ${r.dataType.sql}")
      }
    val (lk, rk) = keys.map(k => widen(attr(lPlan, k), attr(rPlan, k), s"key '$k'")).unzip
    val (lts, rts) = widen(attr(lPlan, leftTs), attr(rPlan, rightTs), "timestamp")
    val carryAttrs = carry.map(attr(rPlan, _))
    val plan = graft.plans.AsOfJoinPlan(
      lPlan, rPlan,
      lk, rk, lts, rts,
      carryAttrs,
      graft.plans.AsOfMergeJoin.carryAttrs(carryAttrs.map(a => a.name -> a.dataType)),
      strict,
      tieBreak = carryAttrs)
    PlanBridge.ofRows(spark, plan)
  }

  /** FORWARD as-of (pandas merge_asof direction='forward': the EARLIEST
    * right row with rightTs ≥ leftTs, or > when strict): the same native
    * operator on the REVERSED time axis — both timestamps negate (to
    * micros for timestamp axes), so backward's "latest ≤" becomes
    * forward's "earliest ≥" with identical tie/NULL semantics and zero new
    * exec code to maintain. */
  def asOfForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String, carry: Seq[String],
                  strict: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.{NumericType, TimestampType}
    def negExpr(df: DataFrame, c: String): Column = df.schema(c).dataType match {
      case TimestampType => -unix_micros(col(c))
      case _: NumericType => -col(c)
      case other => throw new IllegalArgumentException(
        s"forward as-of needs a timestamp or numeric axis, got ${other.sql}")
    }
    val l = left.withColumn("_fwd_ts", negExpr(left, leftTs))
    val r = right.withColumn("_fwd_ts_r", negExpr(right, rightTs))
    asOf(l, r, keys, "_fwd_ts", "_fwd_ts_r", carry, strict).drop("_fwd_ts")
  }

  /** Backward as-of with a TOLERANCE (pandas merge_asof tolerance): the
    * carries null out when the matched right row lies farther back than
    * `tolerance` (micros for timestamp axes, plain difference for numeric
    * ones). One post-projection over the operator output — matching
    * itself is unchanged, so the plan is the native exec plus a narrow
    * map. The right timestamp is carried internally to compute the gap
    * and dropped unless the caller asked for it. */
  def asOfWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 leftTs: String, rightTs: String, carry: Seq[String],
                 tolerance: Long, strict: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.{NumericType, TimestampType}
    val withTs = asOf(left, right, keys, leftTs, rightTs, (carry :+ rightTs).distinct, strict)
    val gap = left.schema(leftTs).dataType match {
      case TimestampType =>
        unix_micros(col(leftTs)) - unix_micros(col(s"asof_$rightTs"))
      case _: NumericType => col(leftTs) - col(s"asof_$rightTs")
      case other => throw new IllegalArgumentException(
        s"tolerance as-of needs a timestamp or numeric axis, got ${other.sql}")
    }
    // the flag materializes BEFORE the carries are nulled: a when() built
    // on asof_<rightTs> would re-resolve against the already-nulled column
    // when rightTs is itself in the carry list
    val flagged = withTs.withColumn("_tol_ok",
      col(s"asof_$rightTs").isNotNull && gap <= tolerance)
    val filtered = carry.foldLeft(flagged) { (d, c) =>
      d.withColumn(s"asof_$c", when(col("_tol_ok"), col(s"asof_$c")))
    }.drop("_tol_ok")
    if (carry.contains(rightTs)) filtered else filtered.drop(s"asof_$rightTs")
  }

  /** NEAREST as-of (pandas merge_asof direction='nearest'): the right row
    * minimizing |rightTs − leftTs|, ties to the backward (≤) side. Two
    * chained native passes — backward non-strict, then forward STRICT over
    * its output (each as-of emits exactly one row per left row, so the
    * second pass composes without a re-join; the equal-ts case already
    * belongs to backward and strict-forward never contests it) — and a
    * narrow per-carry projection picks the closer side. */
  def asOfNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String, carry: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{NumericType, TimestampType}
    val carryAll = (carry :+ rightTs).distinct
    val bwd = carryAll.foldLeft(
      asOf(left, right, keys, leftTs, rightTs, carryAll)) { (d, c) =>
      d.withColumnRenamed(s"asof_$c", s"_b_$c") }
    val both = carryAll.foldLeft(
      asOfForward(bwd, right, keys, leftTs, rightTs, carryAll, strict = true)) { (d, c) =>
      d.withColumnRenamed(s"asof_$c", s"_f_$c") }
    def micros(c: Column): Column = left.schema(leftTs).dataType match {
      case TimestampType => unix_micros(c)
      case _: NumericType => c
      case other => throw new IllegalArgumentException(
        s"nearest as-of needs a timestamp or numeric axis, got ${other.sql}")
    }
    val bGap = micros(col(leftTs)) - micros(col(s"_b_$rightTs"))
    val fGap = micros(col(s"_f_$rightTs")) - micros(col(leftTs))
    val useBwd = col(s"_b_$rightTs").isNotNull &&
      (col(s"_f_$rightTs").isNull || bGap <= fGap)
    both.select(left.columns.map(col) ++
      carry.map(c => when(useBwd, col(s"_b_$c")).otherwise(col(s"_f_$c")).as(s"asof_$c")): _*)
  }

  /** The union → single-window-pass formulation (differential oracle for
    * the native operator; also the shape to reach for where a custom
    * strategy cannot be installed). */
  def asOfUnionWindow(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String, carry: Seq[String],
                      strict: Boolean = false): DataFrame = {
    val leftCols = left.columns
    // carry travels as ONE struct per right row: last(ignoreNulls) must skip
    // whole rows, never individual null fields — per-column carries would
    // stitch values from different right rows and resurrect overwritten nulls
    val carryT = StructType(carry.map(c => right.schema(c)))
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .select((keys.map(col) :+ col("_ts") :+ col("_side")) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"_l_$c")) :+
        lit(null).cast(carryT).as("_r"): _*)
    // a NULL right timestamp would sort first (asc nulls-first) and be
    // carried as the "earliest" match onto every left row until a real
    // right row appears — unmatchable rows are excluded up front instead
    val r = right.where(col(rightTs).isNotNull)
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
      .select((keys.map(col) :+ col("_ts") :+ col("_side")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c")) :+
        struct(carry.map(col): _*).as("_r"): _*)
    // at equal ts: non-strict lets left rows see same-ts right rows (right
    // sorts first); strict hides them (left sorts first, frame ends at self).
    // The carry struct is the final sort key so ties among right rows with
    // identical (key, ts) resolve deterministically (max struct wins) —
    // without it, last() picks whichever row the partition sort happened to
    // place last.
    val sideOrder = if (strict) col("_side").desc else col("_side").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, sideOrder, col("_r").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
    carried.where(col("_side") === 1)
      .select(keys.map(col) ++
        leftCols.filterNot(keys.contains).map(c => col(s"_l_$c").as(c)) ++
        carry.map(c => col(s"_asof.$c").as(s"asof_$c")): _*)
  }
}
