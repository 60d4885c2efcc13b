package graft.constraints

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.core.DataRef
import graft.ops.Events

/** Beyond-reference constraint family: event-time quality bounds built on
  * the as-of join / sessionization operators (`ops.Events`), declared
  * through the same requirement DSL as every reference constraint.
  */

/** Bound the longest gap-delimited session: per `keyColumns` entity,
  * events closer than `gapSeconds` chain into one session, and no session
  * may span more than the target number of seconds. Catches clock skew,
  * replayed logs, and bot-like never-idle entities — one shuffle, two
  * stacked per-key windows ([[Events.sessionize]]).
  */
final case class MaxSessionDurationSeconds(
    ref: DataRef,
    keyColumn: String,
    tsColumn: String,
    gapSeconds: Double,
    refValue: Option[Double] = None,
    ref2: Option[DataRef] = None,
    override val nameOverride: Option[String] = None)
    extends ValueConstraint[Double] {
  require(gapSeconds > 0, s"gapSeconds must be positive: $gapSeconds")

  private def seconds(c: org.apache.spark.sql.Column) = c.cast("double")

  override protected def retrieve(spark: SparkSession, r: DataRef): Double = {
    val sel = r.selection(spark).where(col(tsColumn).isNotNull)
    val isTs = sel.schema(tsColumn).dataType match {
      case TimestampType | TimestampNTZType => true
      case _                                => false
    }
    // timestamp columns: gap compares against an INTERVAL; numeric event
    // times (epoch seconds) compare directly
    val gap =
      if (isTs) expr(s"INTERVAL ${gapSeconds.toLong} SECONDS")
      else lit(gapSeconds)
    val sessions = Events.sessionize(sel, keyColumn, tsColumn, gap)
      .groupBy(col(keyColumn), col("session_id"))
      .agg(
        min(col(tsColumn)).as("session_start"),
        max(col(tsColumn)).as("session_end"))
    val dur =
      if (isTs)
        seconds(col("session_end")) - seconds(col("session_start"))
      else col("session_end") - col("session_start")
    val head = sessions.agg(max(dur).cast("double")).head()
    if (head.isNullAt(0)) 0.0 else head.getDouble(0)
  }

  override protected def compare(factual: Double, target: Double): (Boolean, Option[String]) =
    (factual <= target,
      Some(s"the longest ${gapSeconds}s-gap session in ${ref.describe} " +
        s"spans ${factual}s while only $targetPrefix${target}s were allowed."))
}

/** Between-table coverage budget: the fraction of FIRST-table rows whose
  * (numeric) coordinate falls inside at least one second-table interval
  * must reach the target — "every event happened during a deployment
  * window / sensor uptime span". Planned as the bucketed equi-rewrite in
  * [[graft.ops.RangeJoin.coverageFraction]], never a nested-loop range
  * join.
  */
final case class MinPointCoverageFraction(
    ref: DataRef,
    ref2Required: DataRef,
    pointColumn: String,
    startColumn: String,
    endColumn: String,
    keyColumns: Seq[String],
    inclusiveEnd: Boolean,
    refValue: Option[Double],
    override val nameOverride: Option[String] = None)
    extends Constraint {
  require(
    refValue.exists(v => v >= 0 && v <= 1),
    s"min_point_coverage_fraction must lie within [0, 1] but is $refValue.")

  override protected def ref2Option: Option[DataRef] = Some(ref2Required)

  override def test(spark: SparkSession): graft.core.TestResult = withPlans {
    val factual = graft.ops.RangeJoin.coverageFraction(
      ref.selection(spark), ref2Required.selection(spark),
      pointColumn, startColumn, endColumn,
      keys = keyColumns, inclusiveEnd = inclusiveEnd)
    val target = refValue.get
    if (factual >= target) graft.core.TestResult.success(description)
    else
      graft.core.TestResult.failure(
        description,
        s"only $factual of ${ref.describe} rows fall inside a " +
          s"${ref2Required.describe} interval while at least $target must.")
  }
}

/** Between-table event freshness budget: every row of the FIRST table
  * should be preceded (per key, backward as-of) by a row of the second
  * table at most `toleranceSeconds` earlier — e.g. "every trade has a
  * quote at most 5 s old", "every event follows a heartbeat". The
  * fraction of first-table rows whose as-of match is missing or older
  * than the tolerance must stay ≤ the target. One shuffle, the
  * [[Events.asofJoin]] union-tag sweep — no range join.
  */
final case class MaxStaleAsofFraction(
    ref: DataRef,
    ref2Required: DataRef,
    keyColumns: Seq[String],
    tsColumn: String,
    tsColumn2: String,
    toleranceSeconds: Double,
    refValue: Option[Double],
    override val nameOverride: Option[String] = None)
    extends Constraint {
  require(
    refValue.exists(v => v >= 0 && v <= 1),
    s"max_stale_asof_fraction must lie within [0, 1] but is $refValue.")
  require(toleranceSeconds >= 0, s"tolerance must be non-negative: $toleranceSeconds")

  override protected def ref2Option: Option[DataRef] = Some(ref2Required)

  override def test(spark: SparkSession): graft.core.TestResult = withPlans {
    val probes = ref.selection(spark)
    val carriers = ref2Required.selection(spark)
      .withColumnRenamed(tsColumn2, "dj_carrier_ts")
    val joined = Events.asofJoin(
      probes, carriers, keyColumns, tsColumn, "dj_carrier_ts",
      payloadCols = Seq.empty,
      withinTolerance = Some((l, r) =>
        l.cast("double") - r.cast("double") <= lit(toleranceSeconds)))
    // one pass: total and fresh counts together
    val row = joined
      .agg(
        count(lit(1)).as("n"),
        count(col("asof_dj_carrier_ts")).as("fresh"))
      .head()
    val total = row.getLong(0)
    val factual =
      if (total == 0L) 0.0 else (total - row.getLong(1)).toDouble / total
    val target = refValue.get
    if (factual <= target) graft.core.TestResult.success(description)
    else
      graft.core.TestResult.failure(
        description,
        s"$factual of ${ref.describe} rows have no ${ref2Required.describe} " +
          s"row within ${toleranceSeconds}s before them while only $target " +
          "were allowed to.")
  }
}
