package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native `trim-and-nullify` (data-table.lisp:48-56): strip the reference's
  * whitespace trimbag (space, tab, CR, LF, FF, VT, NBSP) from both ends;
  * empty or case-insensitive "nil" → NULL. Replaces two regexp_replace
  * passes + lower() on the schema-inference hot path; single index walk,
  * codegen'd. */
case class TrimNullify(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "trim_nullify"

  override protected def nullSafeEval(input: Any): Any =
    TrimNullify.trimNullify(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |UTF8String ${ev.value}_r = graft.plans.TrimNullify.trimNullify($c);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TrimNullify =
    copy(child = newChild)
}

object TrimNullify {

  private def isTrim(ch: Char): Boolean =
    ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r' || ch == '\f' ||
      ch == '\u000B' || ch == '\u00A0'

  def trimNullify(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    var lo = 0
    var hi = str.length
    while (lo < hi && isTrim(str.charAt(lo))) lo += 1
    while (hi > lo && isTrim(str.charAt(hi - 1))) hi -= 1
    val n = hi - lo
    if (n == 0) return null
    if (n == 3) {
      val c0 = str.charAt(lo); val c1 = str.charAt(lo + 1); val c2 = str.charAt(lo + 2)
      if ((c0 == 'n' || c0 == 'N') && (c1 == 'i' || c1 == 'I') && (c2 == 'l' || c2 == 'L'))
        return null
    }
    if (lo == 0 && hi == str.length) s
    else UTF8String.fromString(str.substring(lo, hi))
  }
}
