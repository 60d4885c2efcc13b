package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{DataRef, FrameSource}
import graft.constraints.KolmogorovSmirnov2Sample
import graft.ops.Stats

/** CDF / KS tests pinned to the reference's hand-computed oracles
  * (`tests/integration/test_stats.py:27-35`).
  */
class StatsSpec extends AnyFunSuite {
  import TestSpark._

  // cross_cdf_table1 = [1,1,3,2], cross_cdf_table2 = [3,5,4,5,8]
  private lazy val cdf1 = intDf("cross_cdf_table1", Seq(1, 1, 3, 2).map(Integer.valueOf))
  private lazy val cdf2 = intDf("cross_cdf_table2", Seq(3, 5, 4, 5, 8).map(Integer.valueOf))
  private def r1 = DataRef(FrameSource(cdf1, "cross_cdf_table1"), Some(Seq("col_int")))
  private def r2 = DataRef(FrameSource(cdf2, "cross_cdf_table2"), Some(Seq("col_int")))

  test("cross-CDF matches the reference's hand-computed table") {
    val rows = Stats
      .crossCdf(spark, r1, r2, "value", "cdf")
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
      .toSeq
    val expected = Seq(
      (1, 2.0 / 4, 0.0),
      (2, 3.0 / 4, 0.0),
      (3, 1.0, 1.0 / 5),
      (4, 1.0, 2.0 / 5),
      (5, 1.0, 4.0 / 5),
      (8, 1.0, 1.0))
    assert(rows.length == expected.length)
    rows.zip(expected).foreach { case ((v, c1, c2), (ev, ec1, ec2)) =>
      assert(v == ev)
      assert(math.abs(c1 - ec1) < 1e-12)
      assert(math.abs(c2 - ec2) < 1e-12)
    }
  }

  test("KS D statistic: max |cdf1 - cdf2| = 0.8 on the pinned tables") {
    // max over the pinned cross-CDF table: |1 - 1/5| = 0.8 at value 3
    val d = Stats.ks2Sample(spark, r1, r2)
    assert(math.abs(d - 0.8) < 1e-12)
  }

  test("KS D = 0 for identical samples and constraint accepts") {
    val d = Stats.ks2Sample(spark, r1, r1)
    assert(d == 0.0)
    assert(KolmogorovSmirnov2Sample(r1, r1).test(spark).outcome)
  }

  test("KS acceptance threshold formula (reference stats.py:56-75)") {
    // c(0.05) = sqrt(-ln(0.025 + 1e-10)/2) ≈ 1.3581
    assert(Stats.ksCheckAcceptance(0.01, 1000, 1000, 0.05))
    assert(!Stats.ksCheckAcceptance(0.10, 1000, 1000, 0.05))
  }

  test("KS approximate p-value (Fachinetti 2009)") {
    assert(Stats.ksApproxPValue(0.5, 10, 10).isEmpty) // below 35 samples
    val p = Stats.ksApproxPValue(0.05, 1000, 2000).get
    // 2*exp(-(0.05*sqrt(1000))^2) = 2*exp(-2.5)
    assert(math.abs(p - 2.0 * math.exp(-2.5)) < 1e-12)
    assert(Stats.ksApproxPValue(1.0, 10000, 10000).get >= 0.0)
  }

  test("distinguishable distributions are rejected") {
    val a = intDf("a", (1 to 200).map(Integer.valueOf))
    val b = intDf("b", (101 to 300).map(Integer.valueOf))
    val ra = DataRef(FrameSource(a, "a"), Some(Seq("col_int")))
    val rb = DataRef(FrameSource(b, "b"), Some(Seq("col_int")))
    assert(!KolmogorovSmirnov2Sample(ra, rb).test(spark).outcome)
  }
}
