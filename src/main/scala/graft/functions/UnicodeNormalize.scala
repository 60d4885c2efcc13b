package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (UAX #15) as a native codegen'd expression — the
  * canonicalization step a web corpus needs BEFORE any dedup or token
  * statistic: the same visible text arrives both precomposed (U+00E9) and
  * decomposed (U+0065 U+0301) across crawls, and every downstream equality
  * — exact dedup fingerprints, shingles, blocklist tokens — silently treats
  * them as different documents until the corpus is normalized to one form.
  * Spark has no built-in for this (`lower`/`trim` are byte-level); the JDK
  * implements the full algorithm, so the expression is a null-safe,
  * allocation-avoiding wrapper over `java.text.Normalizer`.
  *
  * `form` is one of NFC/NFD/NFKC/NFKD (validated at construction — an
  * invalid form fails at plan time, not per row). Two fast paths keep the
  * hot loop out of the allocator for real corpora: pure-ASCII byte scan
  * (ASCII is normalized under every form; the scan touches no chars), then
  * `Normalizer.isNormalized` (quick-check properties; most already-NFC web
  * text returns without allocating the normalized copy).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(
    UnicodeNormalize.Forms.contains(form),
    s"unicode_normalize form must be one of ${UnicodeNormalize.Forms.mkString("/")}, got '$form'")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = s"unicode_normalize_$form"

  @transient private lazy val javaForm = Normalizer.Form.valueOf(form)

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], javaForm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      // `form` is construction-validated, so the enum reference is safe to
      // splice as source text
      s"${ev.value} = graft.functions.UnicodeNormalize.normalize($s, java.text.Normalizer.Form.$form);"
    })

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {

  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** The kernel; public static so generated code calls it directly. */
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length && bytes(i) >= 0) i += 1
    if (i == bytes.length) return s // pure ASCII: normalized under every form
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }

  /** Column API: `text` normalized to `form` (NFC/NFD/NFKC/NFKD). */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    GraftBridge.toColumn(UnicodeNormalize(GraftBridge.toExpression(text), form))
}
