package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram shingle GENERATOR — the custom-UDTF surface (SURVEY.md
  * §2.8: "explode (Generator/UDTF surface)"): one eval per row streams the
  * document's token n-grams as generated rows.
  *
  * Why not `explode(TextFns.shingles(...))`? The higher-order-function form
  * is interpreted (HOFs never enter codegen) and must MATERIALIZE the full
  * shingle array per document — every position pays n interpreted
  * `element_at` calls plus a `concat_ws`, and the array lives on the heap
  * just to be exploded again. The generator emits each shingle lazily from
  * the token array: no intermediate array, one UTF8String concat per
  * shingle, and downstream operators (hash, project, aggregate) stay in
  * whole-stage codegen below the GenerateExec.
  *
  * Parity contract (differential-tested in ScaleOpsSpec): identical rows to
  * `explode(TextFns.shingles(toks, n))` — shingles are space-joined n-grams,
  * null tokens are skipped inside a shingle exactly like `concat_ws`, and
  * documents shorter than n tokens generate nothing.
  */
case class ShingleGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"shingle width must be >= 1: $n")

  override def elementSchema: StructType =
    new StructType().add("shingle", StringType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_gen expects array<string>, got ${other.sql}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < n) Iterator.empty
    else {
      val m = arr.numElements()
      val toks = new Array[UTF8String](m)
      var i = 0
      while (i < m) { toks(i) = arr.getUTF8String(i); i += 1 }
      // one reusable scratch window: concatWs copies bytes eagerly, so the
      // emitted UTF8String never aliases it — zero per-shingle allocation
      val window = new Array[UTF8String](n)
      (0 to m - n).iterator.map { start =>
        System.arraycopy(toks, start, window, 0, n)
        // concatWs skips nulls — the concat_ws parity contract
        InternalRow(UTF8String.concatWs(ShingleGenerator.Sep, window: _*))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleGenerator =
    copy(child = newChild)
}

object ShingleGenerator {
  private val Sep: UTF8String = UTF8String.fromString(" ")
}
