package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd cosine similarity over two embedding columns
  * (`array<float>` or `array<double>`).
  *
  * This is the similarity hot path: brute-force top-k, embedding near-dup
  * and IVF re-ranking all evaluate cosine once per (query, candidate) PAIR —
  * at 100 TB that is the single most-executed scalar in the engine. The
  * composed-built-in form (`aggregate(zip_with(...))`, SimFns.cosine) never
  * enters whole-stage codegen: Spark evaluates higher-order functions
  * interpretively, allocating a lambda frame per element. Here the whole
  * dot/norm computation is ONE tight fused loop in generated Java.
  *
  * Semantics (exactly the composed form, so results are bit-identical):
  *  - elements promote to double before multiply/accumulate (float*float in
  *    double is exact); accumulation is array order (left fold);
  *  - NULL if either array is NULL, lengths differ, or any element is NULL
  *    (zip_with pads the shorter side with NULL and NULL poisons the fold);
  *  - denominator is sqrt(dot(a,a)) * sqrt(dot(b,b)) — NOT sqrt(prod) —
  *    to match the composed form's rounding;
  *  - NULL on zero denominator (try_divide) and on NaN (nanvl): zero vectors
  *    and NaN-laden inputs drop out of descending top-k rankings instead of
  *    claiming rank 1.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"cosine_sim expects two array<float>/array<double> args, got ${l.sql}, ${r.sql}")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    CosineSim.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val box = ctx.freshName("cos")
      s"""
         |Double $box = graft.plans.CosineSim.cosine(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if ($box == null) { ${ev.isNull} = true; } else { ${ev.value} = $box; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** One fused pass: dot(a,b), dot(a,a), dot(b,b) accumulated in array
    * order; boxed Double so codegen can branch on the NULL cases. */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null // zip_with null-pad ⇒ NULL result
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null // NULL poisons the fold
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) return null // try_divide: zero vector ⇒ NULL
    val c = dot / denom
    if (java.lang.Double.isNaN(c)) null else c // nanvl: NaN ⇒ NULL
  }
}
