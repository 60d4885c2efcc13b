package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bpe

/** BPE vocabulary induction vs the reference algorithm by hand: the
  * classic low/lower/newest/widest corpus, greedy non-overlapping merge
  * application, and deterministic tie-breaking.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("applyMerge is greedy left-to-right and non-overlapping") {
    val df = Seq(
      (Seq("a", "a", "a"), 1L),          // aaa + (a,a) → [aa, a]
      (Seq("a", "a", "a", "a"), 1L),     // aaaa → [aa, aa]
      (Seq("b", "a", "a", "b"), 1L),     // baab → [b, aa, b]
      (Seq("a", "b"), 1L),               // untouched pair order matters
      (Seq("x"), 1L)                     // single symbol survives
    ).toDF("symbols", "weight")
    val out = Bpe.applyMerge(df, "a", "a")
      .select("symbols").as[Seq[String]].collect().toSet
    assert(out === Set(
      Seq("aa", "a"), Seq("aa", "aa"), Seq("b", "aa", "b"),
      Seq("a", "b"), Seq("x")))
  }

  test("train reproduces the textbook merge sequence") {
    // Sennrich et al.'s example vocabulary with weights:
    // low·5 lower·2 newest·6 widest·3
    val corpus = (
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
      ).mkString(" ")
    val df = Seq(corpus).toDF("text")
    val (merges, vocab) = Bpe.train(df, "text", nMerges = 4)
    // hand-derived: (e,s)=9 → (es,t)=9 → (est ends; next best) (l,o)=7 →
    // (lo,w)=7
    assert(merges === Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    // after 4 merges: newest = [n,e,w,est], low = [low]
    val syms = vocab.select("symbols").as[Seq[String]].collect().toSet
    assert(syms.contains(Seq("low")))
    assert(syms.contains(Seq("n", "e", "w", "est")))
    assert(syms.contains(Seq("w", "i", "d", "est")))
    assert(syms.contains(Seq("low", "e", "r")))
  }

  test("encode applies trained merges in order, pieces in word order") {
    val corpus = (
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
      ).mkString(" ")
    val (merges, _) = Bpe.train(Seq(corpus).toDF("text"), "text", nMerges = 4)
    val docs = Seq((1L, "lowest newest"), (2L, "low low")).toDF("doc_id", "text")
    val out = Bpe.encode(docs, "text", "doc_id", merges)
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[String](1), r.getInt(2))))
      .toMap
    // lowest = lo+w → low, e+s → es → est; newest = n e w est
    assert(out(1L) === ((Seq("low", "est", "n", "e", "w", "est"), 6)))
    assert(out(2L) === ((Seq("low", "low"), 2)))
  }

  test("minPairCount stops training; ties break lexicographically") {
    val df = Seq("ab cd ab cd").toDF("text") // (a,b)=2, (c,d)=2 tie
    val (merges, _) = Bpe.train(df, "text", nMerges = 10, minPairCount = 2)
    assert(merges.head === (("a", "b")), "lexicographic tie-break")
    assert(merges === Seq(("a", "b"), ("c", "d")),
      "stops when every remaining pair is below minPairCount")
  }
}
