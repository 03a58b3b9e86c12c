package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Catalyst integration points for the graft native expressions.
  *
  * Cluster-wide: `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  * Per-session: `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach(ext.injectFunction)
    // lowers AsOfJoinPlan → AsOfMergeJoinExec cluster-wide (the per-session
    // path is PlanBridge.addStrategy, done lazily by AsOfJoin.asOf), plus
    // the pushdown/pruning rules the built-in optimizer can't apply to a
    // node type it doesn't know
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => AsOfJoinRules)
  }
}

object GraftExtensions {

  private type FnDef = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def fn(name: String, cls: Class[_], arity: Int)(
      build: Seq[Expression] => Expression): FnDef = (
    FunctionIdentifier(name),
    new ExpressionInfo(cls.getName, name),
    (exprs: Seq[Expression]) => {
      require(exprs.length == arity,
        s"$name expects exactly $arity argument(s), got ${exprs.length}")
      build(exprs)
    })

  private val all: Seq[FnDef] = Seq(
    fn("relaxed_double_native", classOf[RelaxedParseDouble], 1)(e => RelaxedParseDouble(e.head)),
    fn("cosine_sim", classOf[CosineSim], 2)(e => CosineSim(e(0), e(1))),
    fn("text_stats", classOf[TextStats], 1)(e => TextStats(e.head)),
    fn("nfc_normalize", classOf[NfcNormalize], 1)(e => NfcNormalize(e.head)))

  /** Imperative registration into an existing session's function registry. */
  def register(spark: SparkSession): Unit =
    all.foreach(d => spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(d._1.funcName, d._3, "built-in"))
}
