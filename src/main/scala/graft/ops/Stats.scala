package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.DataRef

/** Empirical-CDF machinery and the two-sample Kolmogorov–Smirnov statistic
  * (reference `db_access.py:1164-1315`, `constraints/stats.py:25-75`).
  *
  * Scale-aware plan: the reference computes `cume_dist()` over every raw row
  * (a global sort of the full table). We instead aggregate to distinct values
  * first (`groupBy(value).count` — shuffled with map-side combine) and build
  * the CDF as `cumsum(count)/total` over the *distinct values only*. The
  * ordered window runs over |distinct| rows, not |rows| — at 100 TB the
  * difference between an impossible global sort and a trivial one.
  */
object Stats {

  /** One row per distinct value with its empirical CDF
    * (reference `_cdf_selection`, `db_access.py:1164-1191`: cume_dist then
    * max per value — identical to cumulative count / total).
    */
  def cdfSelection(
      spark: SparkSession,
      ref: DataRef,
      valueLabel: String,
      cdfLabel: String): DataFrame = {
    val counts = ref
      .selection(spark)
      .select(col(ref.column).as(valueLabel))
      .groupBy(valueLabel)
      .agg(count(lit(1)).as("dj_cnt"))
      .cache() // feeds boundary estimation, bucketing, and the total
    // distributed prefix sum over the distinct values (no single-partition
    // window; see CumSum) + broadcast scalar total
    val running = CumSum.withRunningSum(counts, valueLabel, "dj_cnt", "dj_running")
    val total   = counts.agg(sum(col("dj_cnt")).as("dj_total"))
    running
      .crossJoin(broadcast(total))
      .select(
        col(valueLabel),
        (col("dj_running").cast("double") / col("dj_total")).as(cdfLabel))
  }

  /** Align two empirical CDFs on the value axis
    * (reference `_cross_cdf_selection`, `db_access.py:1194-1280`):
    * full outer join on value, coalesced value, then forward-fill each CDF.
    * Spark's `last(_, ignoreNulls = true)` running window replaces the
    * reference's two-step count-group + first_value trick in one pass.
    * Leading NULLs (values seen only in the other sample before this sample's
    * first value) coalesce to 0.
    */
  def crossCdf(
      spark: SparkSession,
      ref1: DataRef,
      ref2: DataRef,
      valueLabel: String,
      cdfLabel: String): DataFrame = {
    val cdf1 = cdfSelection(spark, ref1, valueLabel, cdfLabel + "1")
      .withColumnRenamed(valueLabel, valueLabel + "_1")
    val cdf2 = cdfSelection(spark, ref2, valueLabel, cdfLabel + "2")
      .withColumnRenamed(valueLabel, valueLabel + "_2")
    val joined = cdf1.join(
      cdf2,
      col(valueLabel + "_1") === col(valueLabel + "_2"),
      "full_outer")
    val aligned = joined
      .select(
        coalesce(col(valueLabel + "_1"), col(valueLabel + "_2")).as(valueLabel),
        col(cdfLabel + "1"),
        col(cdfLabel + "2"))
      .cache() // feeds boundary estimation, per-bucket carries, and the fill
    // distributed forward fill along the value axis (see CumSum), leading
    // NULLs (values seen only in the other sample first) → 0
    CumSum
      .withForwardFill(aligned, valueLabel, Seq(cdfLabel + "1", cdfLabel + "2"))
      .select(
        col(valueLabel),
        coalesce(col(cdfLabel + "1"), lit(0.0)).as(cdfLabel + "1"),
        coalesce(col(cdfLabel + "2"), lit(0.0)).as(cdfLabel + "2"))
  }

  /** Two-sample KS D statistic: max |cdf1 - cdf2|
    * (reference `get_ks_2sample`, `db_access.py:1283-1315`).
    */
  def ks2Sample(spark: SparkSession, ref1: DataRef, ref2: DataRef): Double = {
    val cross = crossCdf(spark, ref1, ref2, "val", "cdf")
    val row   = cross.agg(max(abs(col("cdf1") - col("cdf2")))).head()
    if (row.isNullAt(0))
      throw new IllegalArgumentException("Could not compute d statistic.")
    row.getDouble(0)
  }

  /** Acceptance check at significance level alpha
    * (reference `constraints/stats.py:56-75`):
    * D <= c(alpha) * sqrt((n+m)/(n*m)), c(a) = sqrt(-ln(a/2 + 1e-10)/2).
    */
  def ksCheckAcceptance(
      dStatistic: Double,
      nSamples: Long,
      mSamples: Long,
      acceptedLevel: Double): Boolean = {
    val c = math.sqrt(-math.log(acceptedLevel / 2.0 + 1e-10) * 0.5)
    val threshold =
      c * math.sqrt((nSamples + mSamples).toDouble / (nSamples.toDouble * mSamples))
    dStatistic <= threshold
  }

  /** Approximate p-value (Fachinetti 2009; reference
    * `constraints/stats.py:25-54` sans the scipy upgrade): 2·exp(−(D·√min(n,m))²),
    * clamped to [0,1]; None below 35 samples (approximation inaccurate).
    */
  def ksApproxPValue(d: Double, nSamples: Long, mSamples: Long): Option[Double] = {
    val samples = math.min(nSamples, mSamples)
    if (samples < 35) None
    else {
      val dAlpha = d * math.sqrt(samples.toDouble)
      val p      = 2.0 * math.exp(-(dAlpha * dAlpha))
      Some(math.max(0.0, math.min(1.0, p)))
    }
  }
}
