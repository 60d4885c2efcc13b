package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two table snapshots (the "did
  * this week's data change shape" checks an ML data pipeline runs next to
  * the KS test in [[Stats]]): Population Stability Index over explicit
  * buckets and the chi-square homogeneity statistic over categories.
  *
  * Both reduce each side to a bucket/category count table (one partial-agg
  * shuffle apiece, rows bounded by bucket/category count), join the two
  * tiny tables, and fold per-bucket terms with the
  * decimal-cast-before-sum trick ([[Corpus.bigramCrossEntropy]]
  * precedent), so the result is independent of partial-aggregation
  * arrival order and bit-reproducible cross-engine.
  */
object Drift {

  /** PSI between `a` and `b` over `nBuckets` equi-width buckets of
    * [lo, hi) (out-of-range clamps to the edge buckets, as in
    * [[Stats.histogram]]): Σ (pᵢ − qᵢ)·ln(pᵢ/qᵢ). Every bucket takes the
    * standard additive smoothing — count + 0.5 against total + 0.5·nB —
    * so the index is finite for disjoint supports; the smoothing is part
    * of the definition here and the oracle's, and the sum runs over ALL
    * `nBuckets` buckets: a bucket empty on BOTH sides still contributes
    * its (small, nonzero when n_a ≠ n_b) smoothed term, so the generated
    * bucket spine below is load-bearing, not cosmetic. Output one row:
    * (n_a, n_b, psi). Rule of thumb: < 0.1 stable, > 0.25 shifted.
    */
  def psi(
      a: DataFrame,
      b: DataFrame,
      valueCol: String,
      lo: Double,
      hi: Double,
      nBuckets: Int): DataFrame =
    psiFromHistograms(
      Stats.histogram(a, valueCol, lo, hi, nBuckets),
      Stats.histogram(b, valueCol, lo, hi, nBuckets),
      nBuckets)

  /** [[psi]] over two ALREADY-BUCKETED (bucket, cnt) histogram tables —
    * the monitoring entry point for bucket tables that exist without raw
    * rows: a streaming-state snapshot
    * ([[graft.streaming.StreamingChecks.streamingHistogram]]'s
    * complete-mode output) against a reference histogram, at ≤ nBuckets
    * rows per side. Totals are the histogram sums (the histogram clamps
    * out-of-range values rather than dropping them, so Σcnt equals the
    * raw non-null count and the result is IDENTICAL to [[psi]] on the
    * underlying rows — spec-pinned). Same smoothing, same full-spine sum,
    * same decimal-folded bit-reproducible arithmetic.
    */
  def psiFromHistograms(
      histA: DataFrame,
      histB: DataFrame,
      nBuckets: Int): DataFrame = {
    val ha = histA.select(col("bucket"), col("cnt").as("dj_ca"))
    val hb = histB.select(col("bucket"), col("cnt").as("dj_cb"))
    // loud bounds check: a bucket id outside [0, nBuckets) would fall off
    // the range spine below — counted in the totals but missing from the
    // terms, silently UNDERSTATING the PSI (the overflow-drop class). The
    // inputs are ≤ nBuckets-row frames, so the check is a tiny aggregate.
    Seq(("histA", ha), ("histB", hb)).foreach { case (side, h) =>
      val bad = h.where(col("bucket") < 0 || col("bucket") >= nBuckets)
        .head(1)
      require(bad.isEmpty,
        s"psiFromHistograms: $side has bucket id ${bad.head.get(0)} outside " +
          s"[0, $nBuckets) — rebucket the histogram or pass the matching nBuckets")
    }
    val na = ha.agg(coalesce(sum("dj_ca"), lit(0L))).head().getLong(0).toDouble
    val nb = hb.agg(coalesce(sum("dj_cb"), lit(0L))).head().getLong(0).toDouble
    // full bucket spine: nBuckets rows, broadcast-joined against the two
    // (≤ nBuckets-row) histograms
    val spine = histA.sparkSession.range(nBuckets).select(col("id").as("bucket"))
    val joined = spine
      .join(ha, Seq("bucket"), "left")
      .join(hb, Seq("bucket"), "left")
      .select(
        coalesce(col("dj_ca"), lit(0L)).as("dj_ca"),
        coalesce(col("dj_cb"), lit(0L)).as("dj_cb"))
    val p = (col("dj_ca") + 0.5) / (na + 0.5 * nBuckets)
    val q = (col("dj_cb") + 0.5) / (nb + 0.5 * nBuckets)
    joined
      .select(((p - q) * log(p / q)).cast("decimal(28,12)").as("dj_term"))
      .agg(
        lit(na.toLong).as("n_a"),
        lit(nb.toLong).as("n_b"),
        sum(col("dj_term")).cast("double").as("psi"))
  }

  /** 1-D Wasserstein-1 distance (earth mover's distance) between the two
    * snapshots' empirical distributions of `valueCol` — the drift number
    * with UNITS (unlike PSI/KS it reads in the column's own scale: "the
    * price distribution moved $2.10 on average"), and the standard
    * histogram-free alternative to PSI's arbitrary bucketing.
    *
    * W₁ = ∫|F₁(x) − F₂(x)| dx, computed EXACTLY on the scaled-integer
    * axis e = round(x·scale):
    * W₁ = Σᵢ |r₁(vᵢ)·m − r₂(vᵢ)·n| · (vᵢ₊₁ − vᵢ) / (n·m·scale)
    * over sorted distinct values vᵢ with integer running counts r — an
    * integer sum (decimal-exact, partitioning-independent) divided once
    * in a fixed double shape. Headroom: n·m·maxGap ≲ 10³⁸.
    *
    * Plan: one union-tag shuffle to the distinct-value frame, bucketed
    * prefix sums ([[Stats.crossRunningCounts]]), then the cross-bucket
    * successor kernel ([[CumSum.withNextValue]]) — no unpartitioned
    * window, no join. Out: one row (n_a, n_b, w1), NULL when either
    * sample is empty (the distance to an empty distribution is
    * undefined).
    */
  /** Loud decimal-headroom guard for the W1 area sum (the cvm2Sample
    * posture): each term |d|·gap is ≤ n·m·span on the scaled axis, and
    * past 10³⁸ a non-ANSI decimal overflow goes NULL and `sum()` silently
    * DROPS the term, understating W1. Sizes and the value span are known
    * before the aggregate runs (one tiny min/max over the already-
    * checkpointed distinct-value frame), so fail at the boundary instead.
    */
  private[graft] def requireW1Headroom(
      running: DataFrame, n: Long, m: Long, what: String): Unit = {
    if (n == 0L || m == 0L) return
    val row = running.agg(min(col("dj_v")), max(col("dj_v"))).head()
    requireW1SpanHeadroom(row.getLong(0), row.getLong(1), n, m, what)
  }

  /** [[requireW1Headroom]] on a span already known to the driver (the
    * fused [[Stats.crossRunningCountsNext]] collects the exact min/max for
    * free) — same check, no dedicated min/max job.
    */
  private[graft] def requireW1SpanHeadroom(
      lo: Long, hi: Long, n: Long, m: Long, what: String): Unit = {
    if (n == 0L || m == 0L) return
    val span = (BigInt(hi) - BigInt(lo)).max(BigInt(1))
    require(BigInt(n) * BigInt(m) * span <= BigInt(10).pow(38),
      s"$what decimal headroom exceeded at n=$n, m=$m, scaled span=$span " +
        "(n*m*span > 1e38): a silent decimal overflow would understate the " +
        "W1 area — subsample either side or reduce `scale`")
  }

  def wasserstein1(
      a: DataFrame,
      b: DataFrame,
      valueCol: String,
      scale: Long = 1L): DataFrame = {
    // fused kernel: running counts + successor + exact span in one bucket
    // pass — the unfused spelling paid three extra jobs (successor
    // boundaries, successor minima, headroom min/max) per call (r14)
    val (stepped, n, m, span) =
      Stats.crossRunningCountsNext(a, b, valueCol, scale)
    val spark = a.sparkSession
    if (n == 0L || m == 0L)
      return spark.range(1).select(
        lit(n).as("n_a"), lit(m).as("n_b"),
        lit(null).cast("double").as("w1"))
    span.foreach { case (lo, hi) =>
      requireW1SpanHeadroom(lo, hi, n, m, "wasserstein1")
    }
    val d = col("dj_run1").cast("decimal(19,0)") * lit(m).cast("decimal(19,0)") -
      col("dj_run2").cast("decimal(19,0)") * lit(n).cast("decimal(19,0)")
    // the global maximum has no successor → gap 0 (F₁ = F₂ = 1 beyond it)
    val gap = coalesce(col("dj_next") - col("dj_v"), lit(0L)).cast("decimal(19,0)")
    // fixed left-associated double denominator the oracle spells
    // identically: (n·m)·scale
    val denom = n.toDouble * m.toDouble * scale.toDouble
    stepped
      .agg(sum(abs(d) * gap).as("dj_area"))
      .select(
        lit(n).as("n_a"),
        lit(m).as("n_b"),
        (col("dj_area").cast("double") / lit(denom)).as("w1"))
  }

  /** Per-percentile drift report — WHERE in the distribution the shift
    * happened (W₁ says "prices moved $2.10 on average"; this says "the
    * median moved $1 but p99 moved $40"). For each integer percent p,
    * both snapshots' discrete percentiles (`quantile_disc` semantics —
    * values FROM the data, the [[Stats.groupPercentiles]] convention:
    * smallest value whose cumulative count reaches ⌈p%·n⌉ via the
    * integer cross-product comparison) and their difference, all from
    * the ONE shared distinct-value frame ([[Stats.crossRunningCounts]]
    * — no second scan for the second snapshot). Out: one row per
    * percent (percent, q_a, q_b, shift), values in the scaled-integer
    * axis divided back by `scale` as doubles. Empty when either
    * snapshot is empty.
    */
  def quantileShift(
      a: DataFrame,
      b: DataFrame,
      valueCol: String,
      percents: Seq[Int],
      scale: Long = 1L): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be integers in [1,100]: $percents")
    val (running, n, m) = Stats.crossRunningCounts(a, b, valueCol, scale)
    val spark = a.sparkSession
    if (n == 0L || m == 0L)
      return spark.range(0).select(
        lit(0).as("percent"),
        lit(null).cast("double").as("q_a"),
        lit(null).cast("double").as("q_b"),
        lit(null).cast("double").as("shift"))
    val aggs = percents.flatMap { p =>
      Seq(
        min(when(col("dj_run1") * 100 >= lit(n) * p, col("dj_v")))
          .as(s"dj_qa_$p"),
        min(when(col("dj_run2") * 100 >= lit(m) * p, col("dj_v")))
          .as(s"dj_qb_$p"))
    }
    // ONE aggregate over the (checkpointed) running frame; the
    // per-percent pivot is a driver-side constant — a union of selects
    // would re-run the windows once per percent
    val row = running.agg(aggs.head, aggs.tail: _*).head()
    val out = percents.map { p =>
      val qa = row.getAs[Long](s"dj_qa_$p")
      val qb = row.getAs[Long](s"dj_qb_$p")
      org.apache.spark.sql.Row(
        p, qa.toDouble / scale.toDouble, qb.toDouble / scale.toDouble,
        (qb - qa).toDouble / scale.toDouble)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "percent", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField(
          "q_a", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField(
          "q_b", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField(
          "shift", org.apache.spark.sql.types.DoubleType))))
  }

  /** Per-group Wasserstein-1 — by HOW MUCH each key segment drifted, in
    * the column's own units (the [[Stats.ksByGroup]] companion: D says a
    * segment moved, this prices the move). Same exact integer area sum
    * as [[wasserstein1]], but the running counts, totals, AND the
    * successor value all ride per-key windows over ONE per-key sort —
    * no bucket scheme needed, keys distribute across the cluster. NULL
    * values/keys excluded. Out: one row per key
    * (keyCol, n_a, n_b, w1); w1 NULL when the key is absent from either
    * snapshot.
    */
  def wassersteinByGroup(
      a: DataFrame,
      b: DataFrame,
      valueCol: String,
      keyCol: String,
      scale: Long = 1L): DataFrame = {
    require(scale >= 1L, s"scale must be >= 1: $scale")
    def side(df: DataFrame, first: Boolean) = df
      .where(col(valueCol).isNotNull && col(keyCol).isNotNull)
      .select(
        col(keyCol).as("dj_k"),
        round(col(valueCol) * scale).cast("long").as("dj_v"),
        lit(if (first) 1L else 0L).as("dj_w1"),
        lit(if (first) 0L else 1L).as("dj_w2"))
    val counts = side(a, first = true)
      .unionAll(side(b, first = false))
      .groupBy("dj_k", "dj_v")
      .agg(sum(col("dj_w1")).as("dj_cnt1"), sum(col("dj_w2")).as("dj_cnt2"))
    val wRun = Window.partitionBy(col("dj_k")).orderBy(col("dj_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("dj_k"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wLead = Window.partitionBy(col("dj_k")).orderBy(col("dj_v"))
    val ranked = counts
      .withColumn("dj_r1", sum(col("dj_cnt1")).over(wRun))
      .withColumn("dj_r2", sum(col("dj_cnt2")).over(wRun))
      .withColumn("dj_n", sum(col("dj_cnt1")).over(wAll))
      .withColumn("dj_m", sum(col("dj_cnt2")).over(wAll))
      .withColumn("dj_next", lead(col("dj_v"), 1).over(wLead))
    val d = col("dj_r1").cast("decimal(19,0)") * col("dj_m").cast("decimal(19,0)") -
      col("dj_r2").cast("decimal(19,0)") * col("dj_n").cast("decimal(19,0)")
    val gap = coalesce(col("dj_next") - col("dj_v"), lit(0L)).cast("decimal(19,0)")
    ranked
      .groupBy(col("dj_k"))
      .agg(
        max(col("dj_n")).as("dj_na"),
        max(col("dj_m")).as("dj_nb"),
        sum(abs(d) * gap).as("dj_area"))
      .select(
        col("dj_k").as(keyCol),
        col("dj_na").as("n_a"),
        col("dj_nb").as("n_b"),
        when(col("dj_na") > 0 && col("dj_nb") > 0,
          col("dj_area").cast("double") /
            (col("dj_na").cast("double") * col("dj_nb").cast("double")
              * lit(scale.toDouble)))
          .as("w1"))
  }

  /** Mutual information (nats) between two CATEGORICAL columns — the
    * feature-leakage / redundancy check an ML pipeline runs next to the
    * drift family: MI(X;Y) = Σ p(x,y)·ln(p(x,y)/(p(x)·p(y))) is 0 iff
    * the columns are independent and min(H(X), H(Y)) when one determines
    * the other (the soft sibling of the exact functional-dependency
    * check). NULL is a real category ("<null>", as in [[chiSquareDrift]]).
    *
    * Plan: ONE base-table aggregate to the joint (x, y, count) table;
    * marginals and totals re-aggregate the joint (cells ≤ k_x·k_y rows —
    * never the base table again); per-cell terms
    * c_xy·ln((c_xy·N)/(c_x·c_y)) in a fixed double shape, decimal-cast
    * before the sum ([[psi]] posture), divided by N once at the end.
    * Out: EXACTLY one row (n, n_x_categories, n_y_categories, mi_nats,
    * h_x, h_y, u_sym) — on an empty input n = 0, the category counts are
    * 0, the entropies 0.0, and mi_nats/u_sym are NULL (matching a SQL
    * aggregate's one-NULL-row shape, so .head() callers never throw).
    */
  def mutualInformation(
      df: DataFrame,
      xCol: String,
      yCol: String): DataFrame = {
    def cat(c: String) = coalesce(col(c).cast("string"), lit("<null>"))
    // the joint table feeds marginals, totals, entropies AND the MI sum —
    // checkpoint it so the base table scans once
    val joint = graft.core.Blocks.checkpoint(
      df
        .select(cat(xCol).as("dj_x"), cat(yCol).as("dj_y"))
        .groupBy("dj_x", "dj_y")
        .agg(count(lit(1)).as("dj_cxy")))
    val mx = joint.groupBy("dj_x").agg(sum(col("dj_cxy")).as("dj_cx"))
    val my = joint.groupBy("dj_y").agg(sum(col("dj_cxy")).as("dj_cy"))
    val totals = joint.agg(
      sum(col("dj_cxy")).as("dj_n"),
      countDistinct(col("dj_x")).as("dj_kx"),
      countDistinct(col("dj_y")).as("dj_ky"))
    // marginal entropies (nats) with the same decimal-cast term posture —
    // H(X), H(Y) normalize MI into the symmetric uncertainty
    // u_sym = 2·MI/(H(X)+H(Y)) ∈ [0,1] (NULL when both entropies are 0,
    // i.e. both columns constant)
    def entropy(marginal: DataFrame, cntCol: String, out: String) = {
      val p = col(cntCol).cast("double") / col("dj_n").cast("double")
      marginal.crossJoin(broadcast(totals))
        .select((-p * log(p)).cast("decimal(28,18)").as("dj_e"))
        .agg(coalesce(sum(col("dj_e")), lit(0).cast("decimal(28,18)"))
          .cast("double").as(out))
    }
    val hx = entropy(mx, "dj_cx", "dj_hx")
    val hy = entropy(my, "dj_cy", "dj_hy")
    val term = (col("dj_cxy").cast("double") *
      log((col("dj_cxy").cast("double") * col("dj_n").cast("double")) /
        (col("dj_cx").cast("double") * col("dj_cy").cast("double"))))
      .cast("decimal(28,12)")
    // the term sum is a GLOBAL aggregate (no grouping keys): an empty
    // input must still yield the promised single row — a groupBy over the
    // empty joint frame would yield ZERO rows and break .head() callers
    // and empty-table oracle parity (one NULL row in SQL aggregates).
    // totals always has exactly one row, so it anchors the assembly.
    val termSum = joint
      .join(mx, Seq("dj_x"))
      .join(my, Seq("dj_y"))
      .crossJoin(broadcast(totals.select("dj_n")))
      .agg(sum(term).as("dj_t"))
    val mi = (col("dj_t").cast("double") / col("dj_n").cast("double"))
    totals
      .crossJoin(broadcast(termSum))
      .crossJoin(broadcast(hx))
      .crossJoin(broadcast(hy))
      .select(
        coalesce(col("dj_n"), lit(0L)).as("n"),
        col("dj_kx").cast("int").as("n_x_categories"),
        col("dj_ky").cast("int").as("n_y_categories"),
        mi.as("mi_nats"),
        col("dj_hx").as("h_x"),
        col("dj_hy").as("h_y"),
        when(col("dj_hx") + col("dj_hy") > 0.0,
          lit(2.0) * mi / (col("dj_hx") + col("dj_hy"))).as("u_sym"))
  }

  /** Chi-square homogeneity statistic for a CATEGORICAL column across the
    * two snapshots: Σ over the 2×k contingency cells of (O − E)²/E with
    * E = rowTotal·colTotal/grand. Output one row:
    * (n_a, n_b, n_categories, chi2); degrees of freedom = k − 1. NULL
    * categories are a real category ("<null>"). Use
    * [[chiSquarePValue]] driver-side for the significance level.
    */
  /** One-call snapshot drift report — the API a monitoring job runs per
    * snapshot pair: every shared column gets a row with its applicable
    * drift statistics. Numeric columns report the EXACT two-sample KS D
    * and Wasserstein-1 from ONE fused pass (both statistics read the same
    * [[graft.ops.Stats.crossRunningCounts]] distinct-value frame — the D
    * max and the W1 area integral come out of a single aggregate);
    * categorical (string/boolean) columns report the chi-square
    * homogeneity statistic ([[chiSquareDrift]]) and the category count.
    * Column lists default to the shared schema split by dtype; other
    * dtypes are skipped. Out: one row per column
    * (column, kind, n_a, n_b, ks_d, w1, chi2, n_categories) with NULLs
    * for the non-applicable metrics; a numeric column empty on either
    * side reports NULL statistics, a categorical column empty on BOTH
    * sides yields no row.
    *
    * Scale posture: one pass per column (k columns → k passes — drift
    * statistics need per-column value distributions, there is no shared
    * shuffle to fuse them into), each pass the bucketed-prefix-sum plan
    * with no unpartitioned window.
    */
  def driftReport(
      a: DataFrame,
      b: DataFrame,
      numericCols: Seq[String] = Nil,
      categoricalCols: Seq[String] = Nil,
      scale: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.types.{BooleanType, NumericType, StringType}
    val sharedNames = b.schema.fieldNames.toSet
    val shared = a.schema.fields.filter(f => sharedNames.contains(f.name))
    val nums =
      if (numericCols.nonEmpty) numericCols
      else shared.collect {
        case f if f.dataType.isInstanceOf[NumericType] => f.name
      }.toSeq
    val cats =
      if (categoricalCols.nonEmpty) categoricalCols
      else shared.collect {
        case f if f.dataType == StringType || f.dataType == BooleanType => f.name
      }.toSeq
    require(nums.nonEmpty || cats.nonEmpty, "no shared columns to report on")
    def nullD = lit(null).cast("double")
    val numRows = nums.map { c =>
      // fused kernel (see wasserstein1): successor + span ride the running-
      // sums pass — 3 fewer jobs per numeric column
      val (stepped, n, m, span) = Stats.crossRunningCountsNext(a, b, c, scale)
      if (n == 0L || m == 0L)
        a.sparkSession.range(1).select(
          lit(c).as("column"), lit("numeric").as("kind"),
          lit(n).as("n_a"), lit(m).as("n_b"),
          nullD.as("ks_d"), nullD.as("w1"),
          nullD.as("chi2"), lit(null).cast("int").as("n_categories"))
      else {
        span.foreach { case (lo, hi) =>
          requireW1SpanHeadroom(lo, hi, n, m, s"driftReport($c)")
        }
        val d =
          col("dj_run1").cast("decimal(19,0)") * lit(m).cast("decimal(19,0)") -
            col("dj_run2").cast("decimal(19,0)") * lit(n).cast("decimal(19,0)")
        val gap = coalesce(col("dj_next") - col("dj_v"), lit(0L)).cast("decimal(19,0)")
        // fixed left-associated double shapes the oracle spells identically
        val denomD = n.toDouble * m.toDouble
        val denomW = n.toDouble * m.toDouble * scale.toDouble
        stepped
          .agg(max(abs(d)).as("dj_dmax"), sum(abs(d) * gap).as("dj_area"))
          .select(
            lit(c).as("column"), lit("numeric").as("kind"),
            lit(n).as("n_a"), lit(m).as("n_b"),
            (col("dj_dmax").cast("double") / lit(denomD)).as("ks_d"),
            (col("dj_area").cast("double") / lit(denomW)).as("w1"),
            nullD.as("chi2"), lit(null).cast("int").as("n_categories"))
      }
    }
    val catRows = cats.map { c =>
      chiSquareDrift(a, b, c).select(
        lit(c).as("column"), lit("categorical").as("kind"),
        col("n_a"), col("n_b"),
        nullD.as("ks_d"), nullD.as("w1"),
        col("chi2"), col("n_categories"))
    }
    (numRows ++ catRows).reduce(_ unionAll _)
  }

  def chiSquareDrift(
      a: DataFrame,
      b: DataFrame,
      valueCol: String): DataFrame = {
    def cats(df: DataFrame, cntName: String) = df
      .select(coalesce(col(valueCol).cast("string"), lit("<null>")).as("dj_cat"))
      .groupBy("dj_cat")
      .agg(count(lit(1)).as(cntName))
    val ca = cats(a, "dj_ca")
    val cb = cats(b, "dj_cb")
    val joined = ca.join(cb, Seq("dj_cat"), "full_outer")
      .select(
        coalesce(col("dj_ca"), lit(0L)).as("dj_ca"),
        coalesce(col("dj_cb"), lit(0L)).as("dj_cb"))
    val na = col("dj_na").cast("double")
    val nb = col("dj_nb").cast("double")
    val grand = na + nb
    val catTotal = (col("dj_ca") + col("dj_cb")).cast("double")
    def cell(obs: Column, rowTotal: Column): Column = {
      val e = rowTotal * catTotal / grand
      // E = 0 (an empty snapshot's row) has no defined cell contribution —
      // standard chi-square practice excludes zero-expectation cells, and
      // under ANSI SQL the division would otherwise throw; the
      // ChiSquareDrift constraint additionally treats a whole empty
      // snapshot as vacuous
      when(e > 0, (obs - e) * (obs - e) / e)
        .otherwise(lit(0.0))
        .cast("decimal(28,12)")
    }
    val totals = joined.agg(
      sum(col("dj_ca")).as("dj_na"),
      sum(col("dj_cb")).as("dj_nb"),
      count(lit(1)).as("dj_k"))
    joined
      .crossJoin(broadcast(totals))
      .select(
        col("dj_na"), col("dj_nb"), col("dj_k"),
        (cell(col("dj_ca").cast("double"), na) +
          cell(col("dj_cb").cast("double"), nb)).as("dj_term"))
      .groupBy(col("dj_na"), col("dj_nb"), col("dj_k"))
      .agg(sum(col("dj_term")).cast("double").as("chi2"))
      .select(
        col("dj_na").as("n_a"),
        col("dj_nb").as("n_b"),
        col("dj_k").cast("int").as("n_categories"),
        col("chi2"))
  }

  /** Upper-tail chi-square p-value (survival function) via the regularized
    * incomplete gamma function — series expansion for x < s+1, continued
    * fraction otherwise (the standard numerical split). Driver-side scalar
    * math on the collected statistic, same posture as
    * [[Kolmogorov]].
    */
  def chiSquarePValue(chi2: Double, dof: Int): Double = {
    require(dof >= 1, s"dof must be positive: $dof")
    if (chi2 <= 0.0) return 1.0
    val s = dof / 2.0
    val x = chi2 / 2.0
    val logGammaS = logGamma(s)
    val p =
      if (x < s + 1.0) {
        // lower series: P(s,x) = x^s e^-x Σ x^n / Γ(s+n+1)
        var term = 1.0 / s
        var sum = term
        var n = 1
        while (n < 500 && math.abs(term) > math.abs(sum) * 1e-15) {
          term *= x / (s + n)
          sum += term
          n += 1
        }
        1.0 - sum * math.exp(-x + s * math.log(x) - logGammaS)
      } else {
        // continued fraction for Q(s,x) (Lentz's method)
        var b = x + 1.0 - s
        var c = 1.0 / 1e-300
        var d = 1.0 / b
        var h = d
        var i = 1
        var break_ = false
        while (i < 500 && !break_) {
          val an = -i * (i - s)
          b += 2.0
          d = an * d + b
          if (math.abs(d) < 1e-300) d = 1e-300
          c = b + an / c
          if (math.abs(c) < 1e-300) c = 1e-300
          d = 1.0 / d
          val del = d * c
          h *= del
          if (math.abs(del - 1.0) < 1e-15) break_ = true
          i += 1
        }
        math.exp(-x + s * math.log(x) - logGammaS) * h
      }
    math.min(1.0, math.max(0.0, p))
  }

  /** Lanczos log-gamma (g=7, 9 coefficients — the standard public
    * approximation, ~15 significant digits).
    */
  private def logGamma(x0: Double): Double = {
    val g = 7.0
    val coef = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x0 < 0.5) {
      // reflection
      math.log(math.Pi / math.sin(math.Pi * x0)) - logGamma(1.0 - x0)
    } else {
      val x = x0 - 1.0
      var a = coef(0)
      val t = x + g + 0.5
      var i = 1
      while (i < 9) { a += coef(i) / (x + i); i += 1 }
      0.5 * math.log(2.0 * math.Pi) + (x + 0.5) * math.log(t) - t + math.log(a)
    }
  }
}
