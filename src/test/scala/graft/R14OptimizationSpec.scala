package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{CumSum, Dedup, Stats}

/** Equality pins for the r14 optimization-round internals: every rewrite
  * claims bit-identical results — these tests force BOTH code paths on the
  * same data and compare.
  */
class R14OptimizationSpec extends AnyFunSuite {
  import TestSpark._

  /** Run `body` with the session broadcast threshold shrunk so
    * `Dedup.pairBroadcastCap` reads ~0 — the big-candidate regime
    * (staged signature-prefilter verification) triggers on unit-test-sized
    * candidate sets.
    */
  private def withTinyBroadcastCap[T](body: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "1")
    try body
    finally spark.conf.set(key, old)
  }

  private def nearDupCorpus = {
    import spark.implicits._
    // clusters of near-identical docs (shared long base text, one char
    // varies) plus unique chaff — several true pairs, many candidates
    (0 until 60).map { i =>
      val cluster = i % 12
      val body =
        if (cluster < 4)
          s"the quick brown fox jumps over the lazy dog repeatedly $cluster " * 4
        else
          s"unique document body number $i with its own words " +
            s"${i * 7} ${i * 13} ${i * 29}"
      (i.toLong, body + s" tail$i")
    }.toDF("doc_id", "text")
  }

  test("minhashNearDups: staged big-candidate verification ≡ broadcast path") {
    val docs = nearDupCorpus
    def run() = Dedup
      .minhashNearDups(docs, "text", "doc_id", threshold = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9)))
      .toSet
    val small = run()               // normal cap → single-pass broadcast verify
    graft.core.Blocks.releaseAll()
    val staged = withTinyBroadcastCap(run()) // cap ~0 → staged sig-then-shingle
    graft.core.Blocks.releaseAll()
    assert(small.nonEmpty, "fixture should produce at least one near-dup pair")
    assert(staged == small)
  }

  test("crossNearDups: staged big-candidate verification ≡ broadcast path") {
    val docs = nearDupCorpus
    val a = docs.where(col("doc_id") % 2 === 0)
    val b = docs.where(col("doc_id") % 2 === 1)
    def run() = Dedup
      .crossNearDups(a, b, "text", "doc_id", threshold = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9)))
      .toSet
    val small = run()
    graft.core.Blocks.releaseAll()
    val staged = withTinyBroadcastCap(run())
    graft.core.Blocks.releaseAll()
    assert(small.nonEmpty)
    assert(staged == small)
  }

  test("withRunningSumsNext ≡ withRunningSums + withNextValue, span exact") {
    import spark.implicits._
    val counts = (1 to 500)
      .map(i => (i.toLong * 3, (i % 7 + 1).toLong, (i % 3).toLong))
      .toDF("dj_v", "c1", "c2")
    val (runA, totalsA) = CumSum.withRunningSums(
      counts, "dj_v", Seq("c1", "c2"), Seq("r1", "r2"), numBuckets = 16)
    val unfused = CumSum.withNextValue(runA, "dj_v", "nxt", numBuckets = 16)
      .select("dj_v", "r1", "r2", "nxt")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val rn = CumSum.withRunningSumsNext(
      counts, "dj_v", Seq("c1", "c2"), Seq("r1", "r2"), "nxt", numBuckets = 16)
    val fused = rn.frame.select("dj_v", "r1", "r2", "nxt")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(rn.totals == totalsA)
    assert(fused == unfused)
    assert(rn.minOrder.contains(3L) && rn.maxOrder.contains(1500L))
    // empty input keeps schema + empty bounds
    val e = CumSum.withRunningSumsNext(
      counts.where(lit(false)), "dj_v", Seq("c1"), Seq("r1"), "nxt")
    assert(e.frame.count() == 0 && e.minOrder.isEmpty && e.maxOrder.isEmpty)
  }

  test("correlationMatrix: long path ≡ decimal fallback at the 3e9 boundary") {
    import spark.implicits._
    // same correlation structure at two magnitudes: small (long path) and
    // shifted past the 3e9 scaled bound (decimal fallback) — r must match
    // to the double ulp because both are exact-integer power sums and the
    // correlation is shift-invariant
    val base = (1 to 200).map { i =>
      val x = i.toDouble
      val y = 2.0 * i + (i % 5)
      (x, y)
    }
    val small = base.toDF("x", "y")
    val shifted = base.map { case (x, y) => (x + 4.0e9, y) }.toDF("x", "y")
    def r(df: org.apache.spark.sql.DataFrame) = Stats
      .correlationMatrix(df, Seq(("x", 1L), ("y", 1L)))
      .collect().head.getDouble(3)
    val rSmall = r(small)     // max|x| = 200 → long path
    val rShift = r(shifted)   // max|x| = 4e9 > 3e9 → decimal path
    assert(math.abs(rSmall - rShift) < 1e-12,
      s"long path $rSmall vs decimal path $rShift")
  }
}
