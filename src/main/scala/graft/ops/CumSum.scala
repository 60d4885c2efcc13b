package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, NumericType, TimestampType}

/** Distributed prefix sum over an ordered key — the scalable replacement for
  * `Window.orderBy(key)` with no partitioning, which moves ALL rows to a
  * single partition (Spark warns `WindowExec: No Partition Defined`).
  *
  * Classic two-phase plan:
  *   1. estimate `numBuckets` range boundaries with one `approx_percentile`
  *      pass (scan + tiny aggregate);
  *   2. assign each row a bucket; per-bucket running sums use a window
  *      PARTITIONED by bucket (parallel, no global sort);
  *   3. per-bucket totals (numBuckets rows) come back to the driver, whose
  *      exclusive prefix sums are broadcast back as bucket offsets;
  *   4. running = offset(bucket) + local running.
  *
  * The result is EXACT (bucket boundaries only affect load balance, not
  * values). Cost: two scans + one shuffle on bucket, vs. the single-partition
  * sort that does not scale past one executor's memory.
  */
object CumSum {

  /** A double-valued, order-preserving proxy of `orderCol` for boundary
    * estimation and bucket assignment. Numerics cast directly; DATE maps to
    * days-since-epoch (ANSI mode forbids a direct date→double cast);
    * TIMESTAMP casts to epoch seconds.
    */
  private def orderProxy(df: DataFrame, orderCol: String): Column =
    df.schema(orderCol).dataType match {
      case DateType      => datediff(col(orderCol), to_date(lit("1970-01-01"))).cast("double")
      case TimestampType => col(orderCol).cast("double")
      case _: NumericType => col(orderCol).cast("double")
      case other =>
        // a silent cast would EITHER throw mid-job (ANSI: "abc") OR, worse,
        // bucket numerically while the window orders lexically ("10" < "2"),
        // silently corrupting every running sum — reject up front instead
        throw new IllegalArgumentException(
          s"CumSum order column '$orderCol' has unsupported type " +
            s"${other.simpleString}: only numeric, date, and timestamp " +
            "columns order consistently between bucket assignment and the " +
            "per-bucket windows")
    }

  /** Add `rankCol` = global 1-based rank of rows ordered by `orderCol`
    * (ties receive distinct consecutive ranks — in arbitrary order unless
    * `tieCols` pins them; the same contract as `row_number` over an
    * unpartitioned window, without the single-partition sort: per-bucket
    * `row_number` + driver-side bucket offsets, exactly the
    * `withRunningSum` scheme with a constant weight). `tieCols` only ever
    * reorder WITHIN a bucket — equal order keys land in one bucket by
    * construction — so a (orderCol, tieCols) total order makes the rank
    * fully deterministic.
    */
  def withGlobalRank(
      df: DataFrame,
      orderCol: String,
      rankCol: String,
      numBuckets: Int = 256,
      tieCols: Seq[String] = Nil): DataFrame = {
    val tmp = "dj_one"
    withRunningSums(
      df.withColumn(tmp, lit(1L)), orderCol, Seq(tmp), Seq(rankCol),
      numBuckets, tieCols)._1
      .drop(tmp)
  }

  /** Add `runningCol` = cumulative sum of `valueCol` over rows ordered by
    * `orderCol` ascending. The within-bucket frame is ROWS-based, so rows
    * with EQUAL order keys receive distinct partial sums in arbitrary order
    * — callers wanting one row per key (every caller in this repo) must
    * pre-aggregate by the order column first; with distinct keys the result
    * is fully deterministic.
    */
  def withRunningSum(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      runningCol: String,
      numBuckets: Int = 256): DataFrame =
    withRunningSums(df, orderCol, Seq(valueCol), Seq(runningCol), numBuckets)._1

  /** Running sums of SEVERAL value columns in one bucket pass, plus each
    * column's grand total (free: the boundary-estimation aggregate computes
    * them in the same job). The per-bucket local windows share one window
    * spec, so Spark executes a single `WindowExec`; the per-bucket totals of
    * all columns come back in one tiny collect.
    *
    * This is the fused kernel behind the cross-CDF/KS plan: two samples'
    * counts cumulate in one pass instead of two `withRunningSum` invocations
    * plus separate total jobs.
    */
  def withRunningSums(
      df: DataFrame,
      orderCol: String,
      valueCols: Seq[String],
      runningCols: Seq[String],
      numBuckets: Int = 256,
      tieCols: Seq[String] = Nil): (DataFrame, Seq[Long]) = {
    require(valueCols.length == runningCols.length && valueCols.nonEmpty)
    estimateBoundaries(df, orderCol, valueCols, numBuckets) match {
      case None =>
        // empty input: zero rows, but with the SAME running-column types
        // the non-empty path produces (sum's result type per value column)
        // — an empty partition must not flip the output schema to double
        val sumTypes = df.select(valueCols.map(c => sum(col(c))): _*).schema
        val empty = runningCols.zip(sumTypes)
          .foldLeft(df) { case (acc, (c, f)) =>
            acc.withColumn(c, lit(null).cast(f.dataType))
          }
          .where(lit(false))
        (empty, valueCols.map(_ => 0L))
      case Some((boundaries, grandTotals)) =>
        (withRunningSumsAt(df, orderCol, valueCols, runningCols, boundaries,
          tieCols), grandTotals)
    }
  }

  /** Phase 1 of [[withRunningSums]] alone: ONE job computing the
    * approximate range boundaries of `orderCol` plus each value column's
    * grand total. `None` on empty input. Exposed so related selections
    * over the same data can REUSE (a transform of) the boundaries —
    * accuracy only shapes load balance, results stay exact — and so
    * callers get grand totals without a separate count job.
    */
  def estimateBoundaries(
      df: DataFrame,
      orderCol: String,
      valueCols: Seq[String],
      numBuckets: Int = 256): Option[(Seq[Double], Seq[Long])] = {
    val key = orderProxy(df, orderCol)
    val probs = (1 until numBuckets).map(_.toDouble / numBuckets)
    // count(*) distinguishes "input empty" from "every order key NULL"
    // (percentile_approx returns NULL for both); coalesce guards the grand
    // totals against all-NULL value columns (sum() → NULL, not 0). Value
    // columns must be integral — totals are read back as Long.
    // Sketch accuracy 1000: boundaries only shape load balance.
    val aggs = percentile_approx(key, array(probs.map(lit): _*), lit(1000)) +:
      count(lit(1)) +:
      valueCols.map(c => coalesce(sum(col(c)), lit(0L)))
    val head = df.agg(aggs.head, aggs.tail: _*).head()
    if (head.getLong(1) == 0L) None
    else {
      val grandTotals =
        valueCols.indices.map(i => head.getAs[Number](i + 2).longValue())
      // all order keys NULL → no boundaries; everything lands in bucket 0
      // and the single-bucket window still produces correct running sums
      // (rows are KEPT, consistent with the mixed case where NULL keys
      // fill bucket 0)
      val boundaries =
        if (head.isNullAt(0)) Seq.empty[Double]
        else head.getSeq[Double](0).distinct.sorted
      Some((boundaries, grandTotals))
    }
  }

  /** Phases 2–4 of [[withRunningSums]] with CALLER-SUPPLIED boundaries
    * (sorted doubles in `orderCol`'s proxy space — any values are correct,
    * they only shape load balance). For NON-EMPTY `df`; an empty input
    * yields an empty frame whose running columns follow sum's type but
    * callers wanting the exact empty-schema contract should go through
    * [[withRunningSums]].
    */
  def withRunningSumsAt(
      df: DataFrame,
      orderCol: String,
      valueCols: Seq[String],
      runningCols: Seq[String],
      boundaries: Seq[Double],
      tieCols: Seq[String] = Nil): DataFrame = {
    require(valueCols.length == runningCols.length && valueCols.nonEmpty)
    val key = orderProxy(df, orderCol)
    // 2. bucket assignment: number of boundaries strictly below the key.
    //    Codegen'd binary search over the boundary literals; identical keys
    //    land in identical buckets by construction.
    // NULL order keys land in bucket 0 (they sort first inside the bucket's
    // window), exactly as the pre-BucketIndex HOF assignment behaved
    val bucketed = df.withColumn(
      "dj_bucket",
      graft.functions.BucketIndex.bucketIndex(
        coalesce(key, lit(Double.NegativeInfinity)), boundaries))
    // 3. per-bucket local running sums (parallel windows, one WindowExec);
    //    tieCols refine the within-bucket order only — equal order keys
    //    share a bucket, so the refinement is globally consistent
    val wLocal = Window
      .partitionBy("dj_bucket")
      .orderBy(col(orderCol) +: tieCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = valueCols.zip(runningCols).foldLeft(bucketed) {
      case (acc, (v, r)) => acc.withColumn(r, sum(col(v)).over(wLocal))
    }
    // 4. exclusive bucket offsets for all columns via one tiny collect
    val totalAggs =
      valueCols.map(c => coalesce(sum(col(c)), lit(0L)).as(s"dj_total_$c"))
    val totalsMap: Map[Int, Seq[Long]] = bucketed
      .groupBy("dj_bucket")
      .agg(totalAggs.head, totalAggs.tail: _*)
      .collect()
      .map(r =>
        r.getInt(0) ->
          valueCols.indices.map(i => r.getAs[Number](i + 1).longValue()))
      .toMap
    val maxBucket = if (totalsMap.isEmpty) 0 else totalsMap.keys.max
    val out = valueCols.indices.foldLeft(local) { (acc, vi) =>
      val r = runningCols(vi)
      val offsets = (0 to maxBucket).scanLeft(0L) { (s, b) =>
        s + totalsMap.get(b).map(_(vi)).getOrElse(0L)
      }.dropRight(1)
      val offsetArr = array(offsets.map(lit): _*)
      acc.withColumn(r, element_at(offsetArr, col("dj_bucket") + 1) + col(r))
    }
    out.drop("dj_bucket")
  }

  /** [[withRunningSums]] fused with [[withNextValue]]: one bucket scheme
    * serves both the running sums AND each row's successor order key
    * (`nextCol`). The separate `withNextValue` pass re-estimated the same
    * boundaries and re-collected per-bucket minima — two extra jobs per
    * statistic that this fusion folds into the existing totals collect
    * (min(orderCol) rides along); the per-bucket `lead` shares the window
    * partitioning/ordering of the running sums, so no extra shuffle or
    * sort (r14, optimization guide §2.4). Values are identical to the
    * unfused pair by construction: the successor of a row is
    * boundary-independent. Caller contract as [[withNextValue]]: DISTINCT
    * order keys.
    */
  /** [[withRunningSumsNext]]'s result: the running frame, each value
    * column's grand total, and the EXACT global min/max of the order
    * column (free from the same per-bucket collect — callers that need a
    * span guard save a dedicated min/max job).
    */
  final case class RunningNext(
      frame: DataFrame,
      totals: Seq[Long],
      minOrder: Option[Any],
      maxOrder: Option[Any])

  def withRunningSumsNext(
      df: DataFrame,
      orderCol: String,
      valueCols: Seq[String],
      runningCols: Seq[String],
      nextCol: String,
      numBuckets: Int = 256): RunningNext = {
    require(valueCols.length == runningCols.length && valueCols.nonEmpty)
    val dt = df.schema(orderCol).dataType
    val key = orderProxy(df, orderCol)
    val probs = (1 until numBuckets).map(_.toDouble / numBuckets)
    val aggs = percentile_approx(key, array(probs.map(lit): _*), lit(1000)) +:
      count(lit(1)) +:
      valueCols.map(c => coalesce(sum(col(c)), lit(0L)))
    val head = df.agg(aggs.head, aggs.tail: _*).head()
    if (head.getLong(1) == 0L) {
      // same column ORDER as the non-empty path (original cols, running
      // cols, nextCol last) — a positional consumer or a union of the two
      // shapes must not see the branches disagree (r15, advisor note)
      val sumTypes = df.select(valueCols.map(c => sum(col(c))): _*).schema
      val empty = runningCols.zip(sumTypes)
        .foldLeft(df) { case (acc, (c, f)) =>
          acc.withColumn(c, lit(null).cast(f.dataType))
        }
        .withColumn(nextCol, lit(null).cast(dt))
        .where(lit(false))
      return RunningNext(empty, valueCols.map(_ => 0L), None, None)
    }
    val grandTotals =
      valueCols.indices.map(i => head.getAs[Number](i + 2).longValue())
    val boundaries =
      if (head.isNullAt(0)) Seq.empty[Double]
      else head.getSeq[Double](0).distinct.sorted
    val bucketed = df.withColumn(
      "dj_bucket",
      graft.functions.BucketIndex.bucketIndex(
        coalesce(key, lit(Double.NegativeInfinity)), boundaries))
    val wSum = Window
      .partitionBy("dj_bucket")
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLead = Window.partitionBy("dj_bucket").orderBy(col(orderCol))
    val local = valueCols.zip(runningCols)
      .foldLeft(bucketed) { case (acc, (v, r)) =>
        acc.withColumn(r, sum(col(v)).over(wSum))
      }
      .withColumn(nextCol, lead(col(orderCol), 1).over(wLead))
    // ONE tiny collect: per-bucket value totals, the bucket's min order
    // key (the successor carried into the previous bucket's last row),
    // and its max (the exact global span for callers' headroom guards)
    val totalAggs =
      valueCols.map(c => coalesce(sum(col(c)), lit(0L)).as(s"dj_total_$c")) ++
        Seq(min(col(orderCol)).as("dj_min_o"), max(col(orderCol)).as("dj_max_o"))
    val perBucket = bucketed
      .groupBy("dj_bucket")
      .agg(totalAggs.head, totalAggs.tail: _*)
      .collect()
    val totalsMap: Map[Int, Seq[Long]] = perBucket
      .map(r =>
        r.getInt(0) ->
          valueCols.indices.map(i => r.getAs[Number](i + 1).longValue()))
      .toMap
    val minima: Map[Int, Any] = perBucket
      .collect {
        case r if !r.isNullAt(valueCols.length + 1) =>
          r.getInt(0) -> r.get(valueCols.length + 1)
      }
      .toMap
    def cmpMax(a: Any, b: Any): Any =
      if (a.asInstanceOf[Comparable[Any]].compareTo(b) >= 0) a else b
    val maxima = perBucket
      .collect {
        case r if !r.isNullAt(valueCols.length + 2) =>
          r.get(valueCols.length + 2)
      }
    val maxBucket = boundaries.size
    // carry(b) = min order key over buckets > b (withNextValue's suffix scan)
    def cmpMin(a: Any, b: Any): Any =
      if (a.asInstanceOf[Comparable[Any]].compareTo(b) <= 0) a else b
    val carries: Seq[Option[Any]] = (0 to maxBucket)
      .map(minima.get)
      .scanRight(Option.empty[Any]) { (v, acc) =>
        (v, acc) match {
          case (Some(x), Some(y)) => Some(cmpMin(x, y))
          case (x, y)             => x.orElse(y)
        }
      }
      .drop(1)
    val carryArr = array(carries.map(v => lit(v.orNull).cast(dt)): _*)
    val out = valueCols.indices.foldLeft(
      local.withColumn(
        nextCol,
        coalesce(col(nextCol), element_at(carryArr, col("dj_bucket") + 1)))) {
      (acc, vi) =>
        val r = runningCols(vi)
        val offsets = (0 to maxBucket).scanLeft(0L) { (s, b) =>
          s + totalsMap.get(b).map(_(vi)).getOrElse(0L)
        }.dropRight(1)
        val offsetArr = array(offsets.map(lit): _*)
        acc.withColumn(r, element_at(offsetArr, col("dj_bucket") + 1) + col(r))
    }
    RunningNext(
      out.drop("dj_bucket"),
      grandTotals,
      minima.values.reduceOption(cmpMin),
      maxima.reduceOption(cmpMax))
  }

  /** Running max of `valueCol` over rows ordered by `orderCol` (ties broken
    * by `tieCols`, which only ever reorder WITHIN a bucket — equal order
    * keys land in one bucket by construction) — the distributed version of
    * `max(v).over(Window.orderBy(o, ties...))`. Same bucket scheme as
    * `withRunningSum`: per-bucket local running max, then each bucket
    * inherits the max of all earlier buckets via a driver-side prefix over
    * the ≤`numBuckets` per-bucket maxima (collected values are Comparable —
    * Double/Long/Date/Timestamp — so the prefix needs no type dispatch).
    * NULL `valueCol` rows are transparent (max ignores them); NULL order
    * keys land in bucket 0 and sort first, same contract as the other
    * kernels here.
    */
  def withRunningMax(
      df: DataFrame,
      orderCol: String,
      tieCols: Seq[String],
      valueCol: String,
      outCol: String,
      numBuckets: Int = 256): DataFrame = {
    val dt = df.schema(valueCol).dataType
    val key = orderProxy(df, orderCol)
    val probs = (1 until numBuckets).map(_.toDouble / numBuckets)
    val head = df
      .agg(percentile_approx(key, array(probs.map(lit): _*), lit(1000)), count(lit(1)))
      .head()
    if (head.getLong(1) == 0L)
      return df.withColumn(outCol, lit(null).cast(dt)).where(lit(false))
    val boundaries =
      if (head.isNullAt(0)) Seq.empty[Double]
      else head.getSeq[Double](0).distinct.sorted
    val bucketed = df.withColumn(
      "dj_bucket",
      graft.functions.BucketIndex.bucketIndex(
        coalesce(key, lit(Double.NegativeInfinity)), boundaries))
    val wLocal = Window
      .partitionBy("dj_bucket")
      .orderBy(col(orderCol) +: tieCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn(outCol, max(col(valueCol)).over(wLocal))
    // exclusive prefix max of the per-bucket maxima (tiny collect, no
    // global window): carry(b) = max value in any bucket < b
    val maxima: Map[Int, Any] = bucketed
      .groupBy("dj_bucket")
      .agg(max(col(valueCol)))
      .collect()
      .collect { case r if !r.isNullAt(1) => r.getInt(0) -> r.get(1) }
      .toMap
    // bucket indices span 0..boundaries.size regardless of which buckets
    // happen to hold non-null values — size the carry array to ALL of them
    val maxBucket = boundaries.size
    def cmpMax(a: Any, b: Any): Any =
      if (a.asInstanceOf[Comparable[Any]].compareTo(b) >= 0) a else b
    val carries: Seq[Option[Any]] = (0 to maxBucket)
      .map(maxima.get)
      .scanLeft(Option.empty[Any]) { (acc, v) =>
        (acc, v) match {
          case (Some(x), Some(y)) => Some(cmpMax(x, y))
          case (x, y)             => y.orElse(x)
        }
      }
      .dropRight(1)
    val carryArr = array(carries.map(v => lit(v.orNull).cast(dt)): _*)
    local
      .withColumn(
        outCol,
        greatest(col(outCol), element_at(carryArr, col("dj_bucket") + 1)))
      .drop("dj_bucket")
  }

  /** Add `outCol` = the NEXT row's `orderCol` value in ascending
    * `orderCol` order — the distributed version of
    * `lead(o).over(Window.orderBy(o))`, for callers with DISTINCT order
    * keys (every caller here pre-aggregates by the order column; with
    * duplicate keys the within-tie successor would be arbitrary). Same
    * bucket scheme as `withRunningSum`: per-bucket `lead`, then each
    * bucket's LAST row takes the minimum order key of any LATER non-empty
    * bucket (a tiny per-bucket-min collect + driver-side suffix scan). The
    * global maximum's successor is NULL. NULL order keys land in bucket 0
    * and sort first, same contract as the other kernels here.
    */
  def withNextValue(
      df: DataFrame,
      orderCol: String,
      outCol: String,
      numBuckets: Int = 256): DataFrame = {
    val dt  = df.schema(orderCol).dataType
    val key = orderProxy(df, orderCol)
    val probs = (1 until numBuckets).map(_.toDouble / numBuckets)
    val head = df
      .agg(percentile_approx(key, array(probs.map(lit): _*), lit(1000)), count(lit(1)))
      .head()
    if (head.getLong(1) == 0L)
      return df.withColumn(outCol, lit(null).cast(dt)).where(lit(false))
    val boundaries =
      if (head.isNullAt(0)) Seq.empty[Double]
      else head.getSeq[Double](0).distinct.sorted
    val bucketed = df.withColumn(
      "dj_bucket",
      graft.functions.BucketIndex.bucketIndex(
        coalesce(key, lit(Double.NegativeInfinity)), boundaries))
    val wLocal = Window.partitionBy("dj_bucket").orderBy(col(orderCol))
    // carry(b) = min order key over buckets > b — the successor of each
    // bucket's last row; suffix scan over the ≤numBuckets per-bucket minima
    val minima: Map[Int, Any] = bucketed
      .groupBy("dj_bucket")
      .agg(min(col(orderCol)))
      .collect()
      .collect { case r if !r.isNullAt(1) => r.getInt(0) -> r.get(1) }
      .toMap
    val maxBucket = boundaries.size
    def cmpMin(a: Any, b: Any): Any =
      if (a.asInstanceOf[Comparable[Any]].compareTo(b) <= 0) a else b
    val carries: Seq[Option[Any]] = (0 to maxBucket)
      .map(minima.get)
      .scanRight(Option.empty[Any]) { (v, acc) =>
        (v, acc) match {
          case (Some(x), Some(y)) => Some(cmpMin(x, y))
          case (x, y)             => x.orElse(y)
        }
      }
      .drop(1)
    val carryArr = array(carries.map(v => lit(v.orNull).cast(dt)): _*)
    bucketed
      .withColumn(
        outCol,
        coalesce(
          lead(col(orderCol), 1).over(wLocal),
          element_at(carryArr, col("dj_bucket") + 1)))
      .drop("dj_bucket")
  }

  /** Forward-fill `fillCols` over rows ordered by `orderCol` — the
    * distributed version of `last(c, ignoreNulls).over(Window.orderBy(o))`.
    * Same bucket scheme as `withRunningSum`: local fill inside each bucket's
    * window, then each bucket inherits the last non-null value of all
    * earlier buckets (a per-bucket carry computed with one tiny collect).
    */
  def withForwardFill(
      df: DataFrame,
      orderCol: String,
      fillCols: Seq[String],
      numBuckets: Int = 256): DataFrame = {
    val key   = orderProxy(df, orderCol)
    val probs = (1 until numBuckets).map(_.toDouble / numBuckets)
    val boundariesRow = df
      .agg(percentile_approx(key, array(probs.map(lit): _*), lit(1000)), count(lit(1)))
      .head()
    if (boundariesRow.getLong(1) == 0L) return df
    // all-NULL order keys → single bucket 0 (same contract as withRunningSums)
    val boundaries =
      if (boundariesRow.isNullAt(0)) Seq.empty[Double]
      else boundariesRow.getSeq[Double](0).distinct.sorted
    val bucketed = df.withColumn(
      "dj_bucket",
      graft.functions.BucketIndex.bucketIndex(
        coalesce(key, lit(Double.NegativeInfinity)), boundaries))
    val wLocal = Window
      .partitionBy("dj_bucket")
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // last non-null value per bucket per column: max over (order, value)
    // structs restricted to non-null values
    val lastAggs = fillCols.map(c =>
      max(when(col(c).isNotNull, struct(key.as("o"), col(c).as("v"))))
        .as(s"dj_last_$c"))
    val perBucketLast = bucketed
      .groupBy("dj_bucket")
      .agg(lastAggs.head, lastAggs.tail: _*)
      .collect()
      .map(r => r.getInt(0) -> fillCols.map { c =>
        val s = r.getAs[org.apache.spark.sql.Row](s"dj_last_$c")
        if (s == null) None else Some(s.getAs[Any]("v"))
      })
      .toMap
    val maxBucket = if (perBucketLast.isEmpty) 0 else perBucketLast.keys.max
    // carry(b) = last non-null from any earlier bucket
    val carries: Map[String, Seq[Option[Any]]] = fillCols.zipWithIndex.map { case (c, i) =>
      val perBucket = (0 to maxBucket).map(b => perBucketLast.get(b).flatMap(_(i)))
      c -> perBucket.scanLeft(Option.empty[Any])((acc, v) => v.orElse(acc)).dropRight(1)
    }.toMap
    fillCols.foldLeft(bucketed) { (acc, c) =>
      val dt = df.schema(c).dataType
      val carryArr = array(carries(c).map(v => lit(v.orNull).cast(dt)): _*)
      acc.withColumn(
        c,
        coalesce(
          last(col(c), ignoreNulls = true).over(wLocal),
          element_at(carryArr, col("dj_bucket") + 1)))
    }.drop("dj_bucket")
  }
}
