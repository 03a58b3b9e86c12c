package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * canonicalization step a multilingual corpus pipeline runs before
  * tokenization/dedup (decomposed "e"+U+0301 and composed U+00E9 must hash
  * identically or near-dup clusters split by encoding accident).
  *
  * The reference's only string canonicalization is whitespace trimming
  * (data-table.lisp:45-56); this extends the same "clean before you type"
  * stage to Unicode. Spark has no built-in normalizer, and a Scala UDF
  * would break whole-stage codegen on the ingest hot path.
  *
  * Fast path: NFC is the identity on pure-ASCII text, so we scan the raw
  * UTF-8 bytes first and return the input untouched (no String allocation,
  * no Normalizer call) when every byte is < 0x80 — the common case for an
  * English-heavy corpus. java.text.Normalizer also exposes isNormalized,
  * which avoids the rebuild allocation for already-composed non-ASCII. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  def nfc(s: UTF8String): UTF8String = {
    if (s == null) return null
    // ASCII fast path over the raw bytes — identity under NFC
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
