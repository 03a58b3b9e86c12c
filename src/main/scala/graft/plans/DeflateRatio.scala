package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd DEFLATE compression ratio — the Gopher/C4-style
  * "too compressible = repetitive boilerplate" quality signal:
  * `deflate(text).length / text.utf8Length` (level 6, raw deflate).
  *
  * Why a native expression (SURVEY §4 criteria): there is no built-in
  * compression function in Spark SQL, and a Scala UDF would pay
  * per-row encoder round-trips on exactly the multi-KB payloads where
  * the deflate loop itself already dominates — this stays inside
  * whole-stage codegen and reads the UTF8String's bytes directly with
  * zero copies on the input side.
  *
  * Determinism: java.util.zip.Deflater wraps the JDK's bundled zlib with
  * a FIXED level and default strategy, so the byte length is stable for a
  * given JVM — but it is NOT a cross-engine-portable definition, so the
  * ratio ships as a rows-only query (no DuckDB twin; invariants are
  * spec-pinned instead: monotone under repetition, bounded, deterministic).
  *
  * The reference has no compression surface at all (its string layer is
  * data-table.lisp:40-56); this extends the LLM-pipeline quality gates.
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "deflate_ratio"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"deflate_ratio expects a string argument, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any = {
    val r = DeflateRatio.compute(input.asInstanceOf[UTF8String])
    if (r.isNaN) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.plans.DeflateRatio.compute($c);
         |if (Double.isNaN(${ev.value})) {
         |  ${ev.isNull} = true;
         |  ${ev.value} = 0.0;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object DeflateRatio {

  /** NaN marks empty input (→ NULL at the expression layer). The Deflater
    * is allocated per call: it is not thread-safe, Spark evaluates rows on
    * many tasks concurrently, and `end()` frees the native zlib stream
    * deterministically (a thread-local would leak streams across the
    * executor's dynamic thread pools). Allocation cost is ~100ns against
    * a multi-µs deflate of any real document. */
  def compute(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.length == 0) return Double.NaN
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var out = 0L
      while (!d.finished()) out += d.deflate(buf)
      out.toDouble / raw.length
    } finally d.end()
  }
}
