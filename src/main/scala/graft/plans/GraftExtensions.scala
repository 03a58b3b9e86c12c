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
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.relaxedDoubleNative)
}

object GraftExtensions {

  private val relaxedDoubleNative: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("relaxed_double_native"),
    new ExpressionInfo(classOf[RelaxedParseDouble].getName, "relaxed_double_native"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1,
        s"relaxed_double_native expects exactly 1 argument, got ${exprs.length}")
      RelaxedParseDouble(exprs.head)
    })

  /** Imperative registration into an existing session's function registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      relaxedDoubleNative._1.funcName, relaxedDoubleNative._3, "built-in")
}
