package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Encoding-health operators for web-scale corpora — the ftfy-shaped pass
  * every pretraining pipeline runs before anything else: detect mojibake
  * (UTF-8 bytes mis-decoded as Latin-1/cp1252 — "Ã©" for é, "â€™" for ’),
  * stray control characters, and replacement characters, and REPAIR the
  * single-pass mojibake case losslessly.
  *
  * Everything is codegen'd column functions. The repair is Spark's own
  * `encode`/`decode` pair: ISO-8859-1 maps every byte to U+00xx
  * bijectively, so `decode(encode(s, ISO-8859-1), UTF-8)` is EXACTLY the
  * inverse of the corruption (UTF-8 bytes read as Latin-1) whenever it
  * applies — no lookup tables, no UDF. Guards make the repair total:
  * it only fires when the text shows marks, is losslessly Latin-1
  * encodable, and the round-trip strictly reduces the mark count without
  * introducing replacement characters; otherwise the text passes through
  * unchanged.
  */
object Encoding {

  /** The mojibake fingerprint: a UTF-8 lead-byte character (Â/Ã/â as
    * Latin-1) followed by a continuation-byte character — either the raw
    * U+0080–U+00BF range (ISO-8859-1 display) or the cp1252 remapping of
    * 0x80–0x9F (€‚ƒ„…†‡ˆ‰Š‹ŒŽ‘’“”•–—˜™š›œžŸ). Plain Java/RE2 character
    * classes, so the DuckDB oracle evaluates the identical pattern.
    */
  val MojibakePattern: String =
    "[\u00C2\u00C3\u00E2][\\x80-\\xbf\u20AC\u201A\u0192\u201E\u2026\u2020\u2021\u02C6\u2030\u0160\u2039\u0152\u017D\u2018\u2019\u201C\u201D\u2022\u2013\u2014\u02DC\u2122\u0161\u203A\u0153\u017E\u0178]"
  /** Control characters that should not appear in clean text (C0 minus
    * tab/newline/CR, DEL, and the C1 block that raw Latin-1 mis-decodes
    * produce).
    */
  val ControlPattern: String = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f]"

  /** Count of mojibake marks in the text. */
  def mojibakeMarks(text: Column): Column =
    size(regexp_extract_all(text, lit(MojibakePattern), lit(0)))

  /** Count of U+FFFD replacement characters (a decoder already gave up). */
  def replacementChars(text: Column): Column =
    size(regexp_extract_all(text, lit("�"), lit(0)))

  /** Count of disallowed control characters. */
  def controlChars(text: Column): Column =
    size(regexp_extract_all(text, lit(ControlPattern), lit(0)))

  /** Single-pass mojibake repair (see object doc). Total: returns the
    * input unchanged unless every guard passes.
    */
  def fixMojibake(text: Column): Column = {
    // losslessly Latin-1 encodable ⟺ no code point above U+00FF
    val latin1Only = !text.rlike("[^\\x00-\\xff]")
    val repaired = decode(encode(text, "ISO-8859-1"), "UTF-8")
    when(
      mojibakeMarks(text) > 0 && latin1Only &&
        replacementChars(repaired) === 0 &&
        mojibakeMarks(repaired) < mojibakeMarks(text),
      repaired)
      .otherwise(text)
  }

  /** Per-document encoding profile: mark/control/replacement counts, the
    * repaired text, and whether the repair changed anything.
    */
  def encodingProfile(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("mojibake_marks", mojibakeMarks(t))
      .withColumn("replacement_chars", replacementChars(t))
      .withColumn("control_chars", controlChars(t))
      .withColumn("enc_fixed", fixMojibake(t))
      .withColumn("enc_changed", fixMojibake(t) =!= t)
  }
}
