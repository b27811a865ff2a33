package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column — the canonical-composition
  * pass a dedup key needs before hashing crawled text: the SAME user-visible
  * string arrives from different extractors as precomposed (é = U+00E9) or
  * decomposed (e + U+0301) code points, and byte-level hashing treats them
  * as different documents. NFC is the W3C-recommended storage form, so the
  * normalized key collapses exactly the variants that render identically
  * (canonical equivalence — compatibility variants like ﬁ-ligatures are
  * deliberately NOT collapsed; that is NFKC, a lossier policy decision).
  *
  * Spark ships no normalizer builtin, so this is the (b)-rung custom
  * Expression: a thin codegen'd wrapper over `java.text.Normalizer` (ICU-
  * free JDK implementation of UAX #15, stable across JDK releases for
  * assigned code points). The quick-check fast path inside the JDK makes
  * already-NFC text (virtually all real corpora) a single scan with no
  * allocation beyond the String round-trip.
  *
  * Null in → null out. Non-string input is rejected at analysis time.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "UTF8String.fromString(java.text.Normalizer.normalize(" +
        s"$c.toString(), java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Column-API form. */
  def apply(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
