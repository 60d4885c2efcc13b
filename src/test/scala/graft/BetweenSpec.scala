package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.requirements.BetweenRequirement

/** Between-requirement truth tables over the mix-table fixtures — the
  * two-source paths of numeric/date/varchar/uniques constraints.
  */
class BetweenSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val mix1 = mixDf(
    (1 to 19).map(i => (Integer.valueOf(i), "q" * i, f"2016-01-$i%02d")))
  private lazy val mix2 = mixDf(
    (2 to 19).map(i => (Integer.valueOf(i), "q" * i, f"2016-01-$i%02d")))

  private def req = BetweenRequirement.fromDataFrames(mix1, mix2, "mix1", "mix2")

  test("between numeric min/max/mean/percentile") {
    val r = req
    r.addNumericMinConstraint("col_int", "col_int")       // 1 < 2 → fail
    r.addNumericMaxConstraint("col_int", "col_int")       // 19 <= 19 → pass
    r.addNumericMeanConstraint("col_int", "col_int", maxAbsoluteDeviation = 0.5) // 10 vs 10.5
    r.addNumericPercentileConstraint(
      "col_int", "col_int", percentage = 100.0, maxAbsoluteDeviation = Some(0.0))
    val out = r.test(spark).map(_.outcome)
    assert(out == Seq(false, true, true, true))
  }

  test("between date min/max with directionality") {
    val r = req
    r.addDateMinConstraint("col_date", "col_date", useLowerBoundReference = true)  // 01-01 < 01-02 → fail
    r.addDateMinConstraint("col_date", "col_date", useLowerBoundReference = false) // 01-01 <= 01-02 → pass
    r.addDateMaxConstraint("col_date", "col_date", useUpperBoundReference = true)  // 01-19 <= 01-19 → pass
    val out = r.test(spark).map(_.outcome)
    assert(out == Seq(false, true, true))
  }

  test("between varchar lengths") {
    val r = req
    r.addVarcharMinLengthConstraint("col_varchar", "col_varchar") // 1 >= 2 → fail
    r.addVarcharMaxLengthConstraint("col_varchar", "col_varchar") // 19 <= 19 → pass
    val out = r.test(spark).map(_.outcome)
    assert(out == Seq(false, true))
  }

  test("between uniques equality / subset / superset and max null fraction") {
    val r = req
    r.addUniquesEqualityConstraint(Seq("col_int"), Seq("col_int")) // {1..19} vs {2..19} → fail
    r.addUniquesSupersetConstraint(Seq("col_int"), Seq("col_int")) // superset → pass
    r.addUniquesSubsetConstraint(
      Seq("col_int"), Seq("col_int"), maxRelativeViolations = 1.0 / 19) // one excess row
    r.addMaxNullFractionConstraint("col_varchar", "col_varchar")   // 0 <= 0 → pass
    val out = r.test(spark).map(_.outcome)
    assert(out == Seq(false, true, true, true))
  }

  test("between n_uniques gain/loss") {
    val r = req
    r.addNUniquesEqualityConstraint(Seq("col_int"), Seq("col_int")) // 19 vs 18 → fail
    r.addNUniquesMaxGainConstraint(
      Seq("col_int"), Seq("col_int"), constantMaxRelativeGain = Some(1.0 / 18))
    r.addNUniquesMaxLossConstraint(
      Seq("col_int"), Seq("col_int"), constantMaxRelativeLoss = Some(0.0)) // gain → pass
    val out = r.test(spark).map(_.outcome)
    assert(out == Seq(false, true, true))
  }
}
