package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static Unicode-normalization kernels referenced from generated code.
  * Text-pipeline normalization surface (north-star extension): a 100 TB
  * corpus mixes composed and decomposed encodings of the same glyphs, and
  * dedup/fingerprint/token kernels all assume one canonical byte form.
  *
  * java.text.Normalizer implements the same Unicode canonical algorithms
  * as DuckDB's utf8proc (`nfc_normalize`, `strip_accents`), which is what
  * makes the gate oracle exact.
  */
object UnicodeKernels {
  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))

  /** NFD-decompose, drop combining marks (Unicode category Mn), recompose.
    * 'é' → 'e'; characters with no canonical decomposition (æ, ß) pass
    * through — DuckDB strip_accents semantics.
    */
  def stripAccents(s: UTF8String): UTF8String = {
    val nfd = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    // iterate CODEPOINTS, not UTF-16 chars: a supplementary-plane Mn mark
    // is two surrogate chars, and Character.getType(char) on either half
    // reports SURROGATE — a char-wise loop would never strip it
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(
      java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFC))
  }
}

/** Canonical composition (NFC) of a string column. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override protected def nullSafeEval(v: Any): Any =
    UnicodeKernels.nfc(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.expressions.UnicodeKernels.nfc($v)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(child = c)
}

/** Diacritic removal (NFD → drop combining marks → NFC). */
case class StripAccents(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"
  override protected def nullSafeEval(v: Any): Any =
    UnicodeKernels.stripAccents(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.expressions.UnicodeKernels.stripAccents($v)")
  override protected def withNewChildInternal(c: Expression): StripAccents = copy(child = c)
}
