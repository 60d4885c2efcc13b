package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text normalization — the single-pass byte-scan equivalent of the
  * declarative chain
  * `trim(regexp_replace(lower(regexp_replace(text, "[^a-zA-Z0-9 ]", " ")), " +", " "))`
  * that fronts every text operator (fingerprints, shingles, tokens, quality
  * signals).
  *
  * Equivalence argument (pinned by `NormalizeTextSpec` over the corpus and
  * adversarial unicode): the first regex replaces every codepoint outside
  * `[a-zA-Z0-9 ]` with ONE space (Java regex classes match per codepoint,
  * including astral pairs), so `lower` only ever sees ASCII, where it is the
  * per-character +32 mapping; the space-collapse and trim fold into the
  * same scan. Non-ASCII input therefore reduces to: one space per leading
  * UTF-8 byte, continuation bytes skipped.
  *
  * Two regex compilations + three intermediate strings per row become one
  * bounded byte scan with a single output allocation.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"normalize_text expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = graft.functions.NormalizeText.normalize($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {

  /** The scan kernel; public static so generated code calls it directly. */
  def normalize(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val n     = bytes.length
    val out   = new Array[Byte](n)
    var len   = 0
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val b = bytes(i)
      val keep: Byte =
        if (b >= 'a' && b <= 'z') b
        else if (b >= '0' && b <= '9') b
        else if (b >= 'A' && b <= 'Z') (b + 32).toByte
        else 0
      if (keep != 0) {
        if (pendingSpace && len > 0) { out(len) = ' '; len += 1 }
        pendingSpace = false
        out(len) = keep
        len += 1
      } else {
        // any run of spaces / other ASCII / whole multibyte codepoints
        // collapses to one pending space (leading/trailing runs vanish =
        // trim); continuation bytes (0b10xxxxxx) ride inside the same run
        pendingSpace = true
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, len)
  }

  /** Column API: normalized text (lowercase, alnum + single spaces). */
  def normalizeText(text: Column): Column =
    GraftBridge.toColumn(NormalizeText(GraftBridge.toExpression(text)))
}
