package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the reference's `relaxed-parse-float`
  * (data-table.lisp:74-90): strip whitespace (incl. NBSP), `$`, `,`, `%`,
  * then parse as double; NULL on anything else.
  *
  * This is the one place a custom Expression genuinely beats composed
  * built-ins (SURVEY.md §4): the composed form is
  * `try_cast(regexp_replace(c, "[\s $,%]", "") as double)` — a full
  * regex pass plus a second parse pass per value, sitting on the hot path of
  * schema inference (`guess_types`/`coerce_types`) and CSV auto-typing.
  * Here it is a single branch-predictable char scan with proper
  * `doGenCode`, so it stays inside whole-stage codegen.
  */
case class RelaxedParseDouble(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "relaxed_double"

  override protected def nullSafeEval(input: Any): Any =
    RelaxedParseDouble.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.plans.RelaxedParseDouble.parse($c);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RelaxedParseDouble =
    copy(child = newChild)
}

object RelaxedParseDouble {

  private def isStrippable(ch: Char): Boolean =
    ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r' || ch == '\f' ||
      ch == '\u000B' || ch == '\u00A0' || ch == '$' || ch == ',' || ch == '%'

  /** Single-pass strip + validate + parse; null (never throw) on failure.
    * INTENTIONALLY stricter than `try_cast(... as double)`: only finite
    * decimal/scientific literals parse — NaN/Infinity/hex-float/`1.5f`
    * Java-isms are rejected, matching the reference's relaxed-parse-float
    * (data-table.lisp:74-90), which never produces non-finite floats. */
  def parse(s: UTF8String): java.lang.Double = {
    if (s == null) return null
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    while (i < str.length) {
      val ch = str.charAt(i)
      if (!isStrippable(ch)) {
        // fast validity gate: only chars that can appear in a double literal
        val ok = (ch >= '0' && ch <= '9') || ch == '.' || ch == '+' || ch == '-' ||
          ch == 'e' || ch == 'E'
        if (!ok) return null
        sb.append(ch)
      }
      i += 1
    }
    if (sb.length == 0) return null
    try java.lang.Double.valueOf(sb.toString)
    catch { case _: NumberFormatException => null }
  }
}
