package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Encoding

/** Mojibake detection + repair: the encode/decode round-trip must invert
  * the classic UTF-8-read-as-Latin-1 corruption exactly, and the guards
  * must keep the repair total (clean text, genuine unicode, and
  * irreparable text pass through unchanged).
  */
class EncodingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corrupt(s: String): String =
    new String(s.getBytes("UTF-8"), "ISO-8859-1")

  private def fixOne(s: String): String =
    Seq(s).toDF("t").select(Encoding.fixMojibake(col("t"))).head().getString(0)

  private def marks(s: String): Int =
    Seq(s).toDF("t").select(Encoding.mojibakeMarks(col("t"))).head().getInt(0)

  test("repair inverts single-pass mojibake for 2- and 3-byte sequences") {
    val originals = Seq(
      "café déjà vu",
      "naïve façade",
      // 3-byte € and – corrupt through C1 controls
      "price 20€ – ok",
      "Gefühl größer",
      "“smart quotes” and —dashes—")
    originals.foreach { o =>
      val c = corrupt(o)
      assert(c != o)
      assert(marks(c) > 0, s"no marks detected in corrupted '$c'")
      assert(fixOne(c) == o, s"repair failed for '$o'")
    }
  }

  test("clean ASCII and genuine unicode pass through unchanged") {
    val clean = Seq(
      "plain ascii text",
      "café déjà vu", // real accents, no corruption
      "русский", // non-Latin-1: lossless guard skips
      "日本語のテキスト")
    clean.foreach { s => assert(fixOne(s) == s, s"'$s' was altered") }
  }

  test("double-corrupted text repairs one layer without damage") {
    val once = corrupt("café")
    val twice = corrupt(once)
    // one fix application peels exactly one layer
    assert(fixOne(twice) == once)
    assert(fixOne(once) == "café")
  }

  test("encodingProfile flags counts and change bit") {
    val df = Seq(
      ("clean text", 0),
      (corrupt("café"), 1)).toDF("text", "tag")
    val prof = Encoding.encodingProfile(df, "text").collect()
      .map(r => (r.getAs[Int]("tag"), r.getAs[Int]("mojibake_marks"),
        r.getAs[Boolean]("enc_changed"))).toSet
    assert(prof.exists { case (t, m, ch) => t == 0 && m == 0 && !ch })
    assert(prof.exists { case (t, m, ch) => t == 1 && m > 0 && ch })
  }

  test("control and replacement character counts") {
    val s = "a\u0001b\u0007c\uFFFDd"
    val r = Seq(s).toDF("t")
      .select(
        Encoding.controlChars(col("t")).as("c"),
        Encoding.replacementChars(col("t")).as("r"))
      .head()
    assert(r.getInt(0) == 2 && r.getInt(1) == 1)
  }
}
