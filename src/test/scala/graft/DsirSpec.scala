package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Dsir

/** DSIR importance resampling: weight direction, determinism, flavor
  * parity of shape, and Gumbel-top-k selection invariants.
  */
class DsirSpec extends AnyFunSuite {
  import TestSpark._

  private def corpus = {
    import spark.implicits._
    // target-like docs talk about alpha/beta; off-target docs about zulu
    val docs = (0 until 30).map { i =>
      val text =
        if (i % 3 == 0) s"alpha beta alpha gamma beta alpha doc $i"
        else s"zulu yankee xray whiskey victor uniform doc $i"
      (i.toLong, text)
    } ++ Seq((100L, null.asInstanceOf[String]), (101L, "   "))
    docs.toDF("doc_id", "text")
  }

  test("importance weights separate on-target from off-target documents") {
    val raw = corpus
    val target = raw.where(col("doc_id") % 3 === 0 && col("doc_id") < 50)
    for (md5Flavor <- Seq(false, true)) {
      val w = Dsir
        .importanceWeights(raw, target, "text", "doc_id",
          nBuckets = 256, md5Flavor = md5Flavor)
        .collect()
        .map(r => r.getLong(0) -> r.getDecimal(2).doubleValue())
        .toMap
      // text-free docs carry no features and are absent
      assert(!w.contains(100L) && !w.contains(101L))
      val onTarget = (0 until 30).filter(_ % 3 == 0).map(i => w(i.toLong))
      val offTarget = (0 until 30).filter(_ % 3 != 0).map(i => w(i.toLong))
      assert(onTarget.min > offTarget.max,
        s"md5Flavor=$md5Flavor: every on-target weight should exceed every " +
          s"off-target weight, got min(on)=${onTarget.min} max(off)=${offTarget.max}")
    }
  }

  test("log-ratio table covers the full bucket spine with smoothed terms") {
    val raw = corpus
    val target = raw.where(col("doc_id") % 3 === 0)
    val lr = Dsir.logRatioTable(target, raw, "text", "doc_id",
      nBuckets = 64, md5Flavor = false)
    val rows = lr.collect()
    assert(rows.length == 64)
    assert(rows.map(_.getLong(0)).toSet == (0L until 64L).toSet)
    // buckets empty on both sides still carry their (identical-smoothing)
    // term — finite, not NULL
    assert(rows.forall(!_.isNullAt(1)))
  }

  test("resample is deterministic in the seed and ranks 1..k") {
    val raw = corpus
    val target = raw.where(col("doc_id") % 3 === 0)
    def run(seed: String) = Dsir
      .resample(raw, target, "text", "doc_id", k = 10, seed = seed,
        nBuckets = 256)
      .select("doc_id", "rank")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .sortBy(_._2)
    val a = run("s1")
    val b = run("s1")
    val c = run("s2")
    assert(a.toSeq == b.toSeq)
    assert(a.map(_._2).toSeq == (1 to 10))
    // a different seed reorders the selection (overwhelmingly likely)
    assert(a.toSeq != c.toSeq)
    // selection is biased toward the target: most of the top-10 on-target
    val onTargetSelected = a.count { case (id, _) => id % 3 == 0 }
    assert(onTargetSelected >= 6, s"expected >=6 on-target picks, got $onTargetSelected")
  }

  test("hashUniform lies strictly inside (0,1) on the 52-bit lattice") {
    import spark.implicits._
    val u = (0 until 1000).map(_.toLong).toDF("id")
      .select(Dsir.hashUniform(col("id"), "t").as("u"))
      .collect().map(_.getDouble(0))
    assert(u.forall(x => x > 0.0 && x < 1.0))
    // sanity: roughly uniform (mean within 0.05 of 0.5 at n=1000)
    assert(math.abs(u.sum / u.length - 0.5) < 0.05)
  }

  test("hashedNgramKl: zero on identical corpora, grows with drift, gated by the constraint") {
    import spark.implicits._
    val a = (0 until 60).map(i => (i.toLong, s"alpha beta gamma delta common text $i"))
      .toDF("doc_id", "text")
    val b = (0 until 60).map(i => (i.toLong, s"zulu yankee xray whiskey other words $i"))
      .toDF("doc_id", "text")
    val same = Dsir.hashedNgramKl(a, a, "text", nBuckets = 256)
    val far = Dsir.hashedNgramKl(a, b, "text", nBuckets = 256)
    assert(math.abs(same) < 1e-9, s"self-KL should be ~0, got $same")
    assert(far > 0.5, s"disjoint-vocabulary KL should be large, got $far")

    import graft.requirements.BetweenRequirement
    val ok = BetweenRequirement.fromDataFrames(a, a, "old", "new")
    ok.addMaxHashedNgramKlConstraint("text", "text", maxKl = 0.05, nBuckets = 256)
    assert(ok.test(spark).head.outcome)
    val bad = BetweenRequirement.fromDataFrames(a, b, "old", "new")
    bad.addMaxHashedNgramKlConstraint("text", "text", maxKl = 0.05, nBuckets = 256)
    val res = bad.test(spark).head
    assert(!res.outcome)
    assert(res.failureMessage.exists(_.contains("drift")))
  }
}
