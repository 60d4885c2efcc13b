package graft.constraints

import org.apache.spark.sql.SparkSession

import graft.core.{DataRef, TestResult}
import graft.ops.Stats

/** Two-sample Kolmogorov–Smirnov test (reference `constraints/stats.py:13-142`).
  *
  * Retrieves the D statistic in-engine (cross-CDF plan, `ops.Stats`) plus the
  * two sample sizes; acceptance per `D <= c(α)·√((n+m)/nm)` and the
  * approximate p-value (Fachinetti 2009) computed client-side on scalars.
  */
final case class KolmogorovSmirnov2Sample(
    ref: DataRef,
    ref2Required: DataRef,
    significanceLevel: Double = 0.05,
    override val nameOverride: Option[String] = None)
    extends Constraint {
  override protected def ref2Option: Option[DataRef] = Some(ref2Required)
  override def test(spark: SparkSession): TestResult = withPlans {
    // D and both non-null sample sizes come from the one fused cross-CDF
    // pass (the separate row-count jobs of round 1 are folded in)
    val (d, n, m) = Stats.ks2SampleWithCounts(spark, ref, ref2Required)
    if (math.min(n, m) < 35)
      System.err.println(
        "Warning: approximate p-value is not accurate enough below 35 samples.")
    val accepted = Stats.ksCheckAcceptance(d, n, m, significanceLevel)
    if (accepted) TestResult.success(description)
    else {
      // exact finite-sample p-value (the reference's scipy path); the
      // Fachinetti approximation remains as Stats.ksApproxPValue
      val p = Stats.ksExactPValue(d, n, m)
      TestResult.failure(
        description,
        s"Null hypothesis (samples originate from the same distribution) between " +
          s"${ref.describe} and ${ref2Required.describe} cannot be accepted. " +
          s"Significance level: $significanceLevel, D statistic: $d" +
          p.map(v => s", approximate p-value: $v").getOrElse("") + ".")
    }
  }
}
