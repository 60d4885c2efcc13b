package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, TextAnalysis}

/** Winnowing fingerprints (Schleimer et al. 2003): the O(n) deque kernel
  * against a declarative window-min re-derivation, the substring-sharing
  * guarantee, short-document degradation, and the cross-corpus containment
  * operator's boundary semantics.
  */
class WinnowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 8
  private val W = 4

  /** Declarative spelling the kernel must match bit-for-bit: shingle-hash
    * array -> min over each window of W -> sorted distinct. (Window-min
    * VALUES are tie-rule independent, so this pins the kernel exactly.)
    */
  private def declarative(text: org.apache.spark.sql.Column, k: Int, w: Int) = {
    // POSITIONAL shingle hashes (Dedup.charShingles dedups — unusable here:
    // winnowing windows are over the position sequence)
    val raw = graft.ops.Hof.bound(TextAnalysis.normalize(text)) { t =>
      transform(
        filter(
          transform(
            sequence(lit(0), greatest(length(t) - k, lit(0))),
            i => t.substr(i + 1, lit(k))),
          s => length(s) === k),
        s => xxhash64(s))
    }
    val m = size(raw)
    val mins = when(m <= 0, array().cast("array<bigint>"))
      .when(m <= w, array(array_min(raw)))
      .otherwise(
        transform(sequence(lit(0), m - w), i =>
          array_min(slice(raw, i + 1, lit(w)))))
    array_sort(array_distinct(mins))
  }

  test("kernel matches the declarative window-min chain on varied text") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog and keeps on running",
      "aaaaaaaaaaaaaaaaaaaaaaaa", // degenerate: all-equal shingles
      "abc def ghi jkl mno pqr stu vwx yz0 123 456 789",
      "Short doc.",
      "x" * 7, // shorter than k after normalization -> no shingles
      "", // empty
      "Punct!!! and   MIXED case NORMALIZATION check, 42 numbers 42 42."
    ).toDF("text")
    val r = docs.select(
      TextAnalysis.winnowFingerprints(col("text"), K, W).as("fast"),
      declarative(col("text"), K, W).as("slow"))
    r.collect().foreach { row =>
      assert(row.getSeq[Long](0) === row.getSeq[Long](1))
    }
  }

  test("kernel matches declarative on random strings (fuzz)") {
    val rnd = new scala.util.Random(20260814L)
    val alphabet = "abcd " // tiny alphabet -> many repeated shingles/ties
    val docs = (1 to 60).map { _ =>
      val n = rnd.nextInt(120)
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }.toDF("text")
    val r = docs.select(
      TextAnalysis.winnowFingerprints(col("text"), 3, 5).as("fast"),
      declarative(col("text"), 3, 5).as("slow"))
    r.collect().foreach { row =>
      assert(row.getSeq[Long](0) === row.getSeq[Long](1))
    }
  }

  test("guarantee: sharing a substring of k+w-1 chars shares a fingerprint") {
    // the shared run must survive normalization intact: lowercase alnum
    val shared = "zqvkrmxwtpl" // k + w - 1 = 11 chars
    val a = s"first document body before $shared and after tail"
    val b = s"totally different second text $shared unrelated remainder"
    val r = Seq(a, b).toDF("text")
      .select(TextAnalysis.winnowFingerprints(col("text"), K, W).as("fp"))
      .collect()
    val fa = r(0).getSeq[Long](0).toSet
    val fb = r(1).getSeq[Long](0).toSet
    assert(fa.intersect(fb).nonEmpty)
  }

  test("short documents degrade to the single global minimum") {
    val r = Seq("tiny text").toDF("text")
      .select(
        TextAnalysis.winnowFingerprints(col("text"), K, 100).as("fp"),
        TextAnalysis.minShingleHash(col("text"), K).as("minh"))
      .collect()(0)
    assert(r.getSeq[Long](0) === Seq(r.getLong(1)))
  }

  test("winnowContamination containment boundaries") {
    val corpus = Seq(
      (1L, "the stolen paragraph appears verbatim in the eval suite today"),
      (2L, "completely unrelated corpus content nothing shared at all here"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val eval_ = Seq(
      (10L, "prefix words the stolen paragraph appears verbatim in the eval suite today suffix"),
      (11L, "another evaluation question entirely")).toDF("doc_id", "text")
    val out = Dedup
      .winnowContamination(corpus, eval_, "text", "doc_id", K, W, 0.5)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1's normalized text is a substring of eval 10 -> every corpus
    // fingerprint window also occurs there... containment must be 1.0
    assert(out(1L).getDouble(3) === 1.0)
    assert(out(1L).getBoolean(4))
    // doc 2 shares no >=11-char substring; containment low, not flagged
    assert(out(2L).getDouble(3) < 0.5)
    assert(!out(2L).getBoolean(4))
    assert(!out.contains(3L)) // null text never emitted
  }

  test("empty eval set yields zero containment, empty corpus yields no rows") {
    val corpus = Seq((1L, "some corpus document text here")).toDF("doc_id", "text")
    val none = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val r = Dedup.winnowContamination(corpus, none, "text", "doc_id", K, W, 0.5)
      .collect()
    assert(r.length === 1 && r(0).getLong(2) === 0L && r(0).getDouble(3) === 0.0)
    assert(Dedup.winnowContamination(none, corpus, "text", "doc_id").count() === 0L)
  }

  test("constraint pass / fail / empty") {
    val corpus = Seq(
      (1L, "the stolen paragraph appears verbatim in the eval suite today"),
      (2L, "completely unrelated corpus content nothing shared at all here")
    ).toDF("doc_id", "text")
    val eval_ = Seq(
      (10L, "context the stolen paragraph appears verbatim in the eval suite today end")
    ).toDF("doc_id", "text")
    val req = graft.requirements.BetweenRequirement.fromDataFrames(
      corpus, eval_, "corpus", "eval")
    req.addMaxSubstringContaminationFractionConstraint(
      "text", "text", maxFraction = 0.6)
    req.addMaxSubstringContaminationFractionConstraint(
      "text", "text", maxFraction = 0.1, name = Some("tight"))
    val results = req.test(spark)
    assert(results.length === 2)
    assert(results(0).outcome)
    assert(!results(1).outcome)
    assert(results(1).failureMessage.exists(_.contains("containment")))
  }

  test("deletionVariants: exact depth-1 set; empty and single-char inputs") {
    val r = Seq("abc", "a", "").toDF("t")
      .select(Dedup.deletionVariants(col("t"), 1))
      .collect().map(_.getSeq[String](0).toSet)
    assert(r(0) === Set("abc", "bc", "ac", "ab"))
    assert(r(1) === Set("a", ""))
    assert(r(2) === Set(""))
  }

  test("fuzzyPairsLevenshtein: recall 1 vs brute force (fuzz, d=1 and d=2)") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcde"
    val base = (1 to 25).map(_ =>
      (1 to (3 + rnd.nextInt(6))).map(_ => alphabet(rnd.nextInt(5))).mkString)
    val rows = base.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = rows.toDF("id", "text")
    for (d <- Seq(1, 2)) {
      val got = Dedup.fuzzyPairsLevenshtein(df, "text", "id", maxDist = d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val brute = (for {
        (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
        dist = levenshteinRef(ta, tb) if dist <= d
      } yield (ia, ib, dist.toLong)).toSet
      assert(got === brute, s"d=$d: ${got.diff(brute)} extra, ${brute.diff(got)} missing")
    }
    graft.core.Blocks.releaseAll()
  }

  /** Textbook DP Levenshtein for the oracle side of the fuzz test. */
  private def levenshteinRef(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0)
      dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(
          math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("winnow_hashes is callable from SQL via the extension registry") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT winnow_hashes(normalize_text('the quick brown fox jumps high'), 8, 4) AS fp")
      .collect()(0).getSeq[Long](0)
    val viaCol = Seq("the quick brown fox jumps high").toDF("t")
      .select(TextAnalysis.winnowFingerprints(col("t"), 8, 4))
      .collect()(0).getSeq[Long](0)
    assert(viaSql === viaCol)
  }
}
