package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval join — the other time/range primitive (next
  * to the as-of join in [[Events]]) that Spark's built-in joins don't
  * express scalably: `SELECT * FROM points p JOIN intervals i ON p.x >=
  * i.start AND p.x < i.end` plans as a BroadcastNestedLoopJoin (when one
  * side is small) or a cartesian product — O(|P|·|I|) comparisons at 100 TB.
  *
  * This is the standard range-bucketing rewrite instead (the shape of the
  * Databricks "range join optimization" and Flink's interval join, on open
  * DataFrame machinery): pick a bucket width `w`, map every point to the
  * single coarse bucket `floor(x/w)`, explode every interval to the bucket
  * range `[floor(start/w), floor(end/w)]`, EQUI-join on (keys..., bucket)
  * — hash-partitioned, AQE-skew-splittable, map-side-prunable — and keep
  * the residual range predicate as a post-join filter. Each qualifying
  * pair is produced exactly once (the point's bucket always lies inside
  * its matching interval's bucket range), so no distinct is needed.
  *
  * Bucket width governs the explode factor (interval length / w buckets
  * per interval) vs. join selectivity (wide buckets put unrelated rows in
  * the same hash cell). `rangeJoin` derives it COUNT-FIRST from the
  * interval-length distribution: one small aggregate computes avg and max
  * length, then `w = max(avgLen, maxLen/64)` — typical intervals explode
  * to ~2 buckets and even the single widest to ≤ ~65, bounding the
  * exploded row count at ~2-3× |I| for non-degenerate distributions
  * without any per-row cap that could drop matches.
  */
object RangeJoin {

  /** Derive the bucket width from the interval-length distribution (one
    * count-first aggregate over `intervals`): `max(avg, max/64)`, floored
    * at 1e-9 so zero-length/empty inputs stay valid.
    */
  def autoBucketWidth(
      intervals: DataFrame,
      startCol: String,
      endCol: String): Double = {
    val len = col(endCol).cast("double") - col(startCol).cast("double")
    val row = intervals
      .where(col(startCol).isNotNull && col(endCol).isNotNull && len >= 0)
      .agg(avg(len).as("avg_len"), max(len).as("max_len"))
      .head()
    if (row.isNullAt(0)) 1.0
    else math.max(1e-9, math.max(row.getDouble(0), row.getDouble(1) / 64.0))
  }

  /** Inner point-in-interval join: every (point, interval) pair with
    * `start <= x < end` (`<= end` when `inclusiveEnd`), optionally also
    * equi-matched on `keys` (columns present in BOTH inputs). Coordinates
    * must be numeric — cast dates/timestamps to days/epoch seconds first.
    * Non-key column names must be disjoint between the two inputs (the
    * output carries all of them). NULL coordinates never match, as in a
    * plain join predicate.
    *
    * `bucketWidth` defaults to [[autoBucketWidth]]'s count-first estimate.
    */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      keys: Seq[String] = Nil,
      bucketWidth: Option[Double] = None,
      inclusiveEnd: Boolean = false): DataFrame = {
    val w = bucketWidth.getOrElse(autoBucketWidth(intervals, startCol, endCol))
    require(w > 0, s"bucket width must be positive: $w")
    def bucketOf(c: Column): Column = floor(c.cast("double") / w).cast("long")
    val pts = points
      .where(col(pointCol).isNotNull)
      .withColumn("dj_bucket", bucketOf(col(pointCol)))
    val ivs = intervals
      .where(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) <= col(endCol))
      .withColumn(
        "dj_bucket",
        explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    val residual =
      if (inclusiveEnd)
        col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol)
      else
        col(pointCol) >= col(startCol) && col(pointCol) < col(endCol)
    pts
      .join(ivs, keys :+ "dj_bucket", "inner")
      .where(residual)
      .drop("dj_bucket")
  }

  /** Fraction of points covered by at least one interval (the declarative
    * "every event falls inside a deployment window / sensor uptime span"
    * check): bucketed LEFT SEMI join + one count pair — match multiplicity
    * never inflates the numerator, and nothing wider than (point, bucket)
    * shuffles.
    */
  def coverageFraction(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      keys: Seq[String] = Nil,
      bucketWidth: Option[Double] = None,
      inclusiveEnd: Boolean = false): Double = {
    val total = points.where(col(pointCol).isNotNull).count()
    if (total == 0L) return 1.0
    val w = bucketWidth.getOrElse(autoBucketWidth(intervals, startCol, endCol))
    require(w > 0, s"bucket width must be positive: $w")
    def bucketOf(c: Column): Column = floor(c.cast("double") / w).cast("long")
    val pts = points
      .where(col(pointCol).isNotNull)
      .withColumn("dj_bucket", bucketOf(col(pointCol)))
      .alias("p")
    val ivs = intervals
      .where(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) <= col(endCol))
      .withColumn(
        "dj_bucket",
        explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
      .select((keys :+ "dj_bucket").map(col) :+
        col(startCol).as("dj_start") :+ col(endCol).as("dj_end"): _*)
      .alias("i")
    val p = col(s"p.$pointCol")
    val residual =
      if (inclusiveEnd) p >= col("i.dj_start") && p <= col("i.dj_end")
      else p >= col("i.dj_start") && p < col("i.dj_end")
    val cond = (keys.map(k => col(s"p.$k") <=> col(s"i.$k")) :+
      (col("p.dj_bucket") === col("i.dj_bucket")) :+ residual)
      .reduce(_ && _)
    // LEFT SEMI with the residual inside the join condition: each point row
    // survives at most once regardless of how many intervals cover it
    val covered = pts.join(ivs, cond, "left_semi").count()
    covered.toDouble / total
  }
}
