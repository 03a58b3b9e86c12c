package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd L2 unit-normalization of an embedding column
  * (`array<float>` or `array<double>` → `array<double>`).
  *
  * The composed form — `transform(v, x => x / sqrt(aggregate(v, 0d,
  * (a,x) => a + x*x)))` — evaluates interpretively AND re-evaluates the
  * norm subtree per element unless let-bound (the HOF re-evaluation rule
  * recorded in BASELINE.md / PLANS.md);
  * normalization runs once per vector in every embedding operator's input
  * stage, so it deserves the same fused-loop treatment as [[CosineSim]].
  *
  * Semantics (bit-identical to the let-bound composed form):
  *  - elements promote to double (float→double is exact), the squared-sum
  *    accumulates in array order (left fold), one sqrt, one divide per
  *    element;
  *  - NULL if the array is NULL or any element is NULL (NULL poisons the
  *    fold);
  *  - NULL on zero norm (a zero vector has no direction — callers filter
  *    with isNotNull instead of dividing by zero) and on non-finite norms
  *    (NaN/Inf elements).
  */
case class L2Normalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "l2_normalize"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"l2_normalize expects array<float>/array<double>, got ${t.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    L2Normalize.normalize(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val box = ctx.freshName("unit")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $box =
         |  graft.plans.L2Normalize.normalize($v, $isFloat);
         |if ($box == null) { ${ev.isNull} = true; } else { ${ev.value} = $box; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)
}

object L2Normalize {

  /** One fused pass: squared-sum in array order, then scale; null-boxed so
    * codegen can branch on the NULL cases. */
  def normalize(v: ArrayData, isFloat: Boolean): ArrayData = {
    val n = v.numElements()
    val xs = new Array[Double](n)
    var ss = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null // NULL poisons the fold
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      xs(i) = x
      ss += x * x
      i += 1
    }
    val norm = math.sqrt(ss)
    if (norm == 0.0 || java.lang.Double.isNaN(norm) ||
        java.lang.Double.isInfinite(norm)) return null
    i = 0
    while (i < n) { xs(i) = xs(i) / norm; i += 1 }
    new GenericArrayData(xs)
  }
}
