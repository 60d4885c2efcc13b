package graft.constraints

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{DataRef, TestResult}
import graft.ops.Ops

/** Per group, the aggregated values must form the integer range
  * [start, start+max) (reference `constraints/groupby.py:12-58`).
  *
  * Scale note: membership of each group's value-set in its expected range is
  * decided IN the engine (sorted collect_list vs `sequence`), so only the
  * incomplete-group count and a bounded sample leave the executors — the
  * reference pulls every group's array client-side.
  */
final case class AggregateNumericRangeEquality(
    ref: DataRef,
    aggregationColumn: String,
    startValue: Int = 0,
    tolerance: Double = 0.0,
    outputLimit: Int = 100,
    override val nameOverride: Option[String] = None)
    extends Constraint {
  override def test(spark: SparkSession): TestResult = withPlans {
    val agg       = Ops.columnArrayAgg(spark, ref, aggregationColumn)
    val groupCols = ref.columnsOrEmpty
    // missing-from-range per reference: set(range(start, max(values)+start)) - set(values).
    // Guard the empty-range case: Spark's sequence(a, b) DESCENDS when b < a
    // instead of yielding an empty array.
    val elemType = agg.schema(aggregationColumn).dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    val endCol = array_max(col(aggregationColumn)) + lit(startValue) - lit(1)
    val checked = agg
      .withColumn(
        "dj_expected",
        when(endCol >= lit(startValue), sequence(lit(startValue).cast(elemType), endCol.cast(elemType)))
          .otherwise(array().cast(org.apache.spark.sql.types.ArrayType(elemType))))
      .withColumn("dj_missing", array_except(col("dj_expected"), col(aggregationColumn)))
    val nGroups = checked.count()
    if (nGroups == 0) return TestResult.success(description)
    val failed = checked.where(size(col("dj_missing")) > 0)
    val nFailed = failed.count()
    if (nFailed.toDouble / nGroups <= tolerance) TestResult.success(description)
    else {
      val sample = failed
        .select((groupCols.map(col) :+ col("dj_missing")): _*)
        .limit(outputLimit)
        .collect()
        .toSeq
        .map(_.toString)
      TestResult.failure(
        description,
        s"${ref.describe} has unfulfilled continuity requirement for (key, missing " +
          s"values): ${formatting.limited(sample, outputLimit)}. $conditionString")
    }
  }
}
