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

  test("empty sample: D = 1 against a non-empty sample, no division blowup") {
    val df = intDf("ks_empty_t", (1 to 50).map(Integer.valueOf))
    val full  = DataRef(FrameSource(df, "ks_empty_t"), Some(Seq("col_int")))
    val empty = full.copy(condition = Some(graft.core.Condition.raw("col_int > 999")))
    val (d, n, m) = Stats.ks2SampleWithCounts(spark, full, empty)
    assert(d == 1.0, s"expected D=1 vs empty sample, got $d")
    assert(n == 50L && m == 0L)
  }

  test("null-valued rows count toward sample sizes and ride bucket 0 (NULLS FIRST)") {
    // reference stats.py:90-91 sizes the samples with get_row_count =
    // COUNT(*), nulls INCLUDED; its cume_dist NULL placement is
    // dialect-dependent — this engine deterministically sorts them first
    val df = mixDf(Seq(
      (Integer.valueOf(1), "x", null), (Integer.valueOf(2), "x", null),
      (null, "x", null), (Integer.valueOf(3), "x", null)))
    val r = DataRef(FrameSource(df, "ks_null_t"), Some(Seq("col_int")))
    val (d, n, m) = Stats.ks2SampleWithCounts(spark, r, r)
    assert(d == 0.0)
    assert(n == 4L && m == 4L) // COUNT(*) parity: the NULL row counts
    // the NULL value is a point on the CDF axis with weight 1/4
    val cross = Stats.crossCdf(spark, r, r, "v", "cdf")
      .orderBy(org.apache.spark.sql.functions.col("cdf1"))
      .collect()
    assert(cross.length == 4)
    assert(cross.head.isNullAt(0) && cross.head.getDouble(1) == 0.25)
  }

  test("CumSum: NULL order keys land in bucket 0 and keep their weight") {
    import org.apache.spark.sql.functions._
    val counts = mixDf(Seq(
      (Integer.valueOf(5), "x", null),
      (null, "x", null),
      (Integer.valueOf(7), "x", null)))
      .select(col("col_int").as("v"), lit(1L).as("cnt"))
    val rows = graft.ops.CumSum
      .withRunningSum(counts, "v", "cnt", "run")
      .orderBy(col("run"))
      .collect()
    assert(rows.length == 3)
    // the NULL key sorts first (bucket 0) and still contributes to the sums
    assert(rows.head.isNullAt(0) && rows.head.getLong(2) == 1L)
    assert(rows.last.getLong(2) == 3L, "grand running sum must include the NULL row")
  }

  test("CumSum: ALL-NULL order keys keep every row in a single bucket 0") {
    import org.apache.spark.sql.functions._
    val counts = mixDf(Seq(
      (null, "x", null), (null, "y", null), (null, "z", null)))
      .select(col("col_int").as("v"), lit(1L).as("cnt"))
    val (out, totals) = graft.ops.CumSum
      .withRunningSums(counts, "v", Seq("cnt"), Seq("run"))
    val rows = out.orderBy(col("run")).collect()
    assert(rows.length == 3, "all-NULL order keys must not drop rows")
    assert(rows.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L))
    assert(totals == Seq(3L))
  }

  test("CumSum: all-NULL value column yields zero totals, no NPE") {
    import org.apache.spark.sql.functions._
    val counts = mixDf(Seq(
      (Integer.valueOf(1), "x", null), (Integer.valueOf(2), "y", null)))
      .select(col("col_int").as("v"), lit(null).cast("long").as("cnt"))
    val (out, totals) = graft.ops.CumSum
      .withRunningSums(counts, "v", Seq("cnt"), Seq("run"))
    assert(totals == Seq(0L), "sum of all-NULL column must coalesce to 0")
    assert(out.count() == 2L)
  }

  test("CumSum: forward fill keeps all rows when every order key is NULL") {
    import org.apache.spark.sql.functions._
    val df = mixDf(Seq(
      (null, "x", null), (null, null, null), (null, "z", null)))
      .select(col("col_int").as("v"), col("col_varchar").as("s"))
    val out = graft.ops.CumSum.withForwardFill(df, "v", Seq("s"))
    assert(out.count() == 3, "all-NULL order keys must not drop rows")
    // single bucket: the null s is filled from some earlier non-null value
    assert(out.where(col("s").isNull).count() <= 1)
  }

  test("exact Kolmogorov sf: closed form at n=1 and classical critical values") {
    import graft.ops.Kolmogorov
    // n = 1: P(D_1 < d) = 2d - 1 on [1/2, 1] exactly
    assert(math.abs(Kolmogorov.cdf(1, 0.6) - 0.2) < 1e-15)
    assert(math.abs(Kolmogorov.cdf(1, 0.75) - 0.5) < 1e-15)
    // classical two-sided critical values (Miller 1956 tables) sit at
    // alpha = 0.05 by construction — an implementation-independent pin
    assert(math.abs(Kolmogorov.sf(5, 0.56328) - 0.05) < 1e-3)
    assert(math.abs(Kolmogorov.sf(10, 0.40925) - 0.05) < 1e-3)
    assert(math.abs(Kolmogorov.sf(20, 0.29408) - 0.05) < 1e-3)
  }

  test("exact Kolmogorov sf: pinned Durbin-matrix values (MTW 2003)") {
    import graft.ops.Kolmogorov
    // independently computed with a separate implementation of the same
    // published algorithm (agreement ~1e-12; scipy's kstwo matches MTW to
    // ~1e-13 inside this range)
    val pins = Seq(
      (1000L, 0.05, 0.013012071309977613),
      (500L, 0.1, 8.342293067842288e-05),
      (35L, 0.2, 0.10552685381764704),
      (100L, 0.1, 0.2526927570063894),
      (10L, 0.5, 0.007777409999999763),
      (2000L, 0.02, 0.3953133720031049),
      (40L, 0.3, 0.0010904155041437935))
    pins.foreach { case (n, d, expected) =>
      val got = Kolmogorov.sf(n, d)
      assert(math.abs(got - expected) < 1e-5, s"sf($n, $d) = $got, expected $expected")
    }
  }

  test("exact p-value wiring: effective sample size, <35 cutoff, large-n fallback") {
    import graft.ops.Kolmogorov
    // round(n*m/(n+m)) effective size, as the reference's scipy path
    val p = Stats.ksExactPValue(0.05, 2000L, 2000L) // en = 1000
    assert(math.abs(p.get - 0.013012071309977613) < 1e-5)
    assert(Stats.ksExactPValue(0.5, 30L, 10000L).isEmpty) // min side < 35
    // huge n*d falls back to the corrected asymptotic — sane and monotone
    val big1 = Kolmogorov.sf(2000000L, 0.001)
    val big2 = Kolmogorov.sf(2000000L, 0.002)
    assert(big1 > big2 && big1 <= 1.0 && big2 >= 0.0)
    // deep right tail underflows to 0, not garbage
    assert(Kolmogorov.sf(100000L, 0.5) == 0.0)
    // huge n with tiny d (k small) must not overflow the Durbin Int path
    val hugeN = Kolmogorov.sf(2000000000L, 4e-7)
    assert(hugeN >= 0.0 && hugeN <= 1.0)
    assert(hugeN > 0.99, s"d≈0 at huge n should be far left tail: $hugeN")
  }

  test("distinguishable distributions are rejected") {
    val a = intDf("a", (1 to 200).map(Integer.valueOf))
    val b = intDf("b", (101 to 300).map(Integer.valueOf))
    val ra = DataRef(FrameSource(a, "a"), Some(Seq("col_int")))
    val rb = DataRef(FrameSource(b, "b"), Some(Seq("col_int")))
    assert(!KolmogorovSmirnov2Sample(ra, rb).test(spark).outcome)
  }

  test("histogram: clamped edges, empty buckets absent, exact counts") {
    import spark.implicits._
    val df = Seq(0.5, 1.0, 1.9, 5.0, 9.9, 10.0, 42.0).toDF("v")
    // [1,10) in 9 buckets of width 1; 0.5 clamps into bucket 0, 10.0 and
    // 42.0 clamp into bucket 8
    val out = graft.ops.Stats.histogram(df, "v", 1.0, 10.0, 9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(0L -> 3L, 4L -> 1L, 8L -> 3L))
  }

  test("pearsonExact: perfect, inverse, and hand-computed correlation") {
    import spark.implicits._
    // the sqrt·sqrt denominator can land one ulp past the numerator, so
    // |r| may exceed 1 by ~2^-52 — deterministic, but not exactly 1.0
    val perfect = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0)).toDF("x", "y")
    assert(math.abs(graft.ops.Stats.pearsonExact(perfect, "x", "y")
      .head().getDouble(1) - 1.0) < 1e-12)
    val inverse = Seq((1.0, 3.0), (2.0, 2.0), (3.0, 1.0)).toDF("x", "y")
    assert(math.abs(graft.ops.Stats.pearsonExact(inverse, "x", "y")
      .head().getDouble(1) + 1.0) < 1e-12)
    // x=(1,2,3), y=(1,2,4): r = 0.9819805060619659 (hand-derived:
    // (3·17−6·7)/( √(3·14−36) · √(3·21−49) ) = 9/(√6·√14))
    val mixed = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 4.0)).toDF("x", "y")
    val r = graft.ops.Stats.pearsonExact(mixed, "x", "y").head().getDouble(1)
    assert(math.abs(r - 9.0 / (math.sqrt(6.0) * math.sqrt(14.0))) < 1e-15)
    // fixed-point scaling: same data in cents gives the identical r
    val cents = Seq((0.01, 1.0), (0.02, 2.0), (0.03, 4.0)).toDF("x", "y")
    val rc = graft.ops.Stats.pearsonExact(cents, "x", "y", scaleX = 100L)
      .head().getDouble(1)
    assert(rc === r)
  }

  test("groupPercentiles: discrete quantiles per group, duplicates honored") {
    import spark.implicits._
    val df = (
      (1 to 10).map(i => ("a", i.toDouble)) ++    // p50 of 1..10 → 5
        Seq(("b", 7.0), ("b", 7.0), ("b", 7.0), ("b", 100.0)) // dup-heavy
      ).toDF("g", "v")
    val out = graft.ops.Stats.groupPercentiles(df, "g", "v", Seq(50, 90, 100))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out("a") === ((5.0, 9.0, 10.0)))
    assert(out("b") === ((7.0, 100.0, 100.0)))
  }

  test("groupPercentiles plan: every window carries a partitionSpec") {
    import spark.implicits._
    val df = (1 to 100).map(i => (s"g${i % 5}", i.toDouble)).toDF("g", "v")
    val plan = graft.ops.Stats.groupPercentiles(df, "g", "v", Seq(50))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window [") ||
      !plan.contains("windowspecdefinition()"), "unpartitioned window")
    // both window aggregates share one sort: exactly one Window exchange
    assert("partitionSpec".r.findAllIn(plan).isEmpty ||
      !plan.contains("SinglePartition"), s"global funnel in:\n$plan")
  }

  test("momentsExact: hand-computed grouped moments, degenerate groups NULL") {
    import spark.implicits._
    val df = (Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 5.0)) ++
      Seq(("b", 7.0)) ++                       // n = 1 → NULL skew/kurt
      Seq(("c", 2.0), ("c", 2.0)))             // zero variance → NULL
      .toDF("g", "v")
    val got = Stats.momentsExact(df, "v", groupCols = Seq("g"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          Option(r.get(5)).map(_.asInstanceOf[Double]))))
      .toMap
    // group a: 1..5 → mean 3, m2 = 2, m3 = 0 → skew 0; m4 = 34/5 = 6.8 →
    // kurtosis 6.8/4 − 3 = −1.3
    val (n, mean, v, sk, ku) = got("a")
    assert(n == 5L && mean == 3.0 && v == 2.0)
    assert(sk.contains(0.0))
    assert(ku.exists(k => math.abs(k - (-1.3)) < 1e-12))
    assert(got("b")._1 == 1L && got("b")._4.isEmpty && got("b")._5.isEmpty)
    assert(got("c")._3 == 0.0 && got("c")._4.isEmpty)
  }

  test("momentsExact: scale handles fractional values; global row; skew sign") {
    import spark.implicits._
    // right-skewed: long upper tail
    val df = Seq(1.25, 1.25, 1.25, 1.50, 9.75).toDF("v")
    val r = Stats.momentsExact(df, "v", scale = 100L).head()
    assert(r.getLong(0) == 5L)
    assert(math.abs(r.getDouble(1) - 3.0) < 1e-12) // mean = 15.0/5
    assert(r.getDouble(3) > 1.0, "long upper tail → strongly positive skewness")
    // partitioning independence: identical result at different parallelism
    val r2 = Stats.momentsExact(df.repartition(7), "v", scale = 100L).head()
    assert(r2 == r)
  }

  test("CumSum.withNextValue: sorted successor across bucket boundaries") {
    import spark.implicits._
    // few buckets force cross-bucket carries; values deliberately unsorted
    val vals = Seq(50L, 10L, 90L, 30L, 70L, 20L, 80L, 40L, 60L, 100L)
    val out = graft.ops.CumSum
      .withNextValue(vals.toDF("v").repartition(5), "v", "nxt", numBuckets = 3)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    val sorted = vals.sorted
    sorted.zip(sorted.tail).foreach { case (v, n) =>
      assert(out(v).contains(n), s"next($v) = ${out(v)}, want $n")
    }
    assert(out(sorted.last).isEmpty, "global max has no successor")
  }

  test("CumSum.withNextValue: empty input yields empty output with the column") {
    import spark.implicits._
    val out = graft.ops.CumSum
      .withNextValue(Seq.empty[Long].toDF("v"), "v", "nxt")
    assert(out.columns.contains("nxt") && out.count() === 0L)
  }

  test("cvm2Sample: hand-computed value, zero on identical, null on empty") {
    import spark.implicits._
    val a = Seq(1.0, 2.0).toDF("v")
    val b = Seq(3.0, 4.0).toDF("v")
    // pooled values 1..4; F1 = .5,1,1,1; F2 = 0,0,.5,1
    // T = nm/(n+m)² · Σ cnt·(F1−F2)² = (4/16)·(.25 + 1 + .25 + 0) = 0.375
    val r = Stats.cvm2Sample(a, b, "v").head()
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L)
    assert(math.abs(r.getDouble(2) - 0.375) < 1e-12)
    // symmetric in the samples
    val rSwap = Stats.cvm2Sample(b, a, "v").head()
    assert(math.abs(rSwap.getDouble(2) - 0.375) < 1e-12)
    assert(Stats.cvm2Sample(a, a, "v").head().getDouble(2) === 0.0)
    val empty = Seq.empty[Double].toDF("v")
    assert(Stats.cvm2Sample(a, empty, "v").head().isNullAt(2))
  }

  test("ksByGroup: per-key D matches the global KS on single-key slices") {
    import spark.implicits._
    // key g1: disjoint supports → D = 1; key g2: identical → D = 0;
    // key g3: present only on side a → NULL statistic
    val a = (Seq(("g1", 1.0), ("g1", 2.0)) ++
      Seq(("g2", 5.0), ("g2", 6.0)) ++ Seq(("g3", 9.0))).toDF("k", "v")
    val b = (Seq(("g1", 3.0), ("g1", 4.0)) ++
      Seq(("g2", 5.0), ("g2", 6.0))).toDF("k", "v")
    val got = Stats.ksByGroup(a, b, "v", "k")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(got("g1") === ((2L, 2L, Some(1.0))))
    assert(got("g2") === ((2L, 2L, Some(0.0))))
    assert(got("g3") === ((1L, 0L, None)))
    // a shifted key agrees with the whole-table two-sample D on its slice
    val a2 = (1 to 40).map(i => ("s", i.toDouble)).toDF("k", "v")
    val b2 = (1 to 40).map(i => ("s", i + 10.0)).toDF("k", "v")
    val dGrouped = Stats.ksByGroup(a2, b2, "v", "k").head().getDouble(3)
    // D of uniform[1,40] vs uniform[11,50] = 10/40
    assert(math.abs(dGrouped - 0.25) < 1e-12)
  }

  test("correlationMatrix: matches pearsonExact per pair; degenerate pairs NULL") {
    import spark.implicits._
    val df = Seq(
      (1.0, 2.0, 5.0), (2.0, 4.0, 5.0), (3.0, 6.0, 5.0), (4.0, 7.0, 5.0))
      .toDF("x", "y", "z")
    val got = Stats
      .correlationMatrix(df, Seq(("x", 10L), ("y", 10L), ("z", 10L)))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(got.size === 3)
    val single = Stats.pearsonExact(df, "x", "y", 10L, 10L).head().getDouble(1)
    assert(got(("x", "y"))._2.contains(single))
    // constant column → zero variance → NULL r, n still reported
    assert(got(("x", "z")) === ((4L, None)))
    // pairwise-complete: nulls in one column shrink only its pairs
    val withNull = Seq(
      (Some(1.0), Some(2.0), Some(1.0)), (Some(2.0), None, Some(2.0)),
      (Some(3.0), Some(5.0), Some(2.0)), (Some(4.0), Some(9.0), Some(5.0)))
      .toDF("x", "y", "z")
    val g2 = Stats
      .correlationMatrix(withNull, Seq(("x", 1L), ("y", 1L), ("z", 1L)))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(g2(("x", "y")) === 3L && g2(("x", "z")) === 4L && g2(("y", "z")) === 3L)
  }

  test("aucExact: hand-computed separations, midrank ties, null on one-class") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // perfect separation
    val perfect = Seq((3.0, true), (4.0, true), (1.0, false), (2.0, false))
      .toDF("s", "y")
    val rp = Stats.aucExact(perfect, "s", col("y")).head()
    assert(rp.getLong(0) === 2L && rp.getLong(1) === 2L)
    assert(rp.getDouble(2) === 1.0)
    // identical distributions → exactly 0.5 (midranks make this exact)
    val coin = Seq((1.0, true), (2.0, true), (3.0, true),
      (1.0, false), (2.0, false), (3.0, false)).toDF("s", "y")
    assert(Stats.aucExact(coin, "s", col("y")).head().getDouble(2) === 0.5)
    // mixed: pos {2,3} vs neg {1,3} → (1 + 0 + 1 + ½)/4 = 0.625
    val mixed = Seq((2.0, true), (3.0, true), (1.0, false), (3.0, false))
      .toDF("s", "y")
    assert(Stats.aucExact(mixed, "s", col("y")).head().getDouble(2) === 0.625)
    // reversed labels complement: AUC' = 1 − AUC
    assert(Stats.aucExact(mixed, "s", !col("y")).head().getDouble(2) === 0.375)
    // one-class input → NULL statistic
    val onecls = Seq((1.0, true), (2.0, true)).toDF("s", "y")
    assert(Stats.aucExact(onecls, "s", col("y")).head().isNullAt(2))
    // partitioning independence
    val big = (1 to 200)
      .map(i => (i % 17 / 2.0, i % 3 == 0)).toDF("s", "y")
    val a1 = Stats.aucExact(big, "s", col("y"), scale = 10L).head().getDouble(2)
    val a2 = Stats.aucExact(big.repartition(7), "s", col("y"), scale = 10L)
      .head().getDouble(2)
    assert(a1 === a2)
  }

  test("MinAuc constraint: ranking gate passes/fails; one-class vacuous") {
    import spark.implicits._
    import graft.core.{DataRef, FrameSource}
    val df = Seq((10.0, "en"), (9.0, "en"), (2.0, "de"), (1.0, "fr"))
      .toDF("score", "lang")
    def req(frame: org.apache.spark.sql.DataFrame) =
      graft.requirements.WithinRequirement.fromDataFrame(frame, "t")
    val ok = req(df)
    ok.addMinAucConstraint("score", "lang", "en", minAuc = 0.99)
    assert(ok.test(spark).head.outcome)
    val shuffled = Seq((1.0, "en"), (9.0, "en"), (2.0, "de"), (10.0, "fr"))
      .toDF("score", "lang")
    val bad = req(shuffled)
    bad.addMinAucConstraint("score", "lang", "en", minAuc = 0.9)
    val res = bad.test(spark).head
    assert(!res.outcome)
    assert(res.failureMessage.exists(_.contains("AUC")))
    val onecls = Seq((1.0, "en"), (2.0, "en")).toDF("score", "lang")
    val vac = req(onecls)
    vac.addMinAucConstraint("score", "lang", "en", minAuc = 1.0)
    assert(vac.test(spark).head.outcome)
  }

  test("groupTopK: deterministic ranks, null category, salted == naive") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq.fill(3)(("a", "x")) ++ Seq.fill(2)(("a", "y")) ++
      Seq.fill(2)(("a", "z")) ++ Seq(("a", "w")) ++
      Seq.fill(2)(("b", null: String)) ++ Seq(("b", "p"))
    val df = rows.toDF("g", "v").repartition(5)
    val got = graft.ops.Profile.groupTopK(df, "g", "v", k = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSet
    // group a: x(3) then the y/z tie breaks value-ascending → y
    // group b: "<null>"(2) then p(1)
    assert(got === Set(
      ("a", "x", 3L, 1), ("a", "y", 2L, 2),
      ("b", "<null>", 2L, 1), ("b", "p", 1L, 2)))
    // salted two-phase is exact: equal to the naive single-window top-k
    // on a wider value domain, at a salt count that forces real pruning
    val wide = (1 to 500).map(i => ("g", s"v${i % 97}")).toDF("g", "v")
    val salted = graft.ops.Profile.groupTopK(wide, "g", "v", k = 5, nSalts = 8)
      .select("value", "cnt", "rank").collect().toSet
    val naive = {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      wide.groupBy(col("g"), col("v").as("value"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("g").orderBy(col("cnt").desc, col("value").asc)))
        .where(col("rank") <= 5)
        .select("value", "cnt", "rank").collect().toSet
    }
    assert(salted === naive)
  }

  test("proportionCI: Wilson interval matches the closed form; nulls excluded") {
    import spark.implicits._
    val df = Seq(
      ("a", java.lang.Boolean.TRUE), ("a", java.lang.Boolean.TRUE),
      ("a", java.lang.Boolean.FALSE), ("a", null.asInstanceOf[java.lang.Boolean]),
      ("b", java.lang.Boolean.FALSE)).toDF("g", "keep")
    val r = Stats.proportionCI(df, "keep", Seq("g"))
      .collect().map(x => x.getString(0) -> x).toMap
    val a = r("a")
    assert(a.getLong(1) === 3L) // null excluded from n
    assert(a.getLong(2) === 2L)
    assert(a.getDouble(3) === 0.666667)
    // closed-form Wilson at k=2, n=3, z=1.959963984540054
    val z = 1.959963984540054; val z2 = z * z
    val n = 3.0; val p = 2.0 / n
    val lo = (p + z2 / (2 * n) - z * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n))) / (1 + z2 / n)
    val hi = (p + z2 / (2 * n) + z * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n))) / (1 + z2 / n)
    assert(a.getDouble(4) === math.round(lo * 1e6) / 1e6)
    assert(a.getDouble(5) === math.round(hi * 1e6) / 1e6)
    // degenerate group: p̂ = 0 keeps 0 <= ci_lo <= ci_hi <= 1
    val b = r("b")
    assert(b.getDouble(4) >= 0.0 && b.getDouble(5) <= 1.0 && b.getDouble(4) <= b.getDouble(5))
  }

  test("proportionCI: zero-evidence input reports NULL, never NaN") {
    import spark.implicits._
    // empty input, no group columns: one row with n_rows = 0 — the derived
    // columns must be NULL (NaN orders above every number in Spark, so a
    // NaN ci_lo would pass a min-lower-bound comparison vacuously)
    val empty = Seq.empty[java.lang.Boolean].toDF("keep")
    val r = Stats.proportionCI(empty, "keep").collect()
    assert(r.length === 1)
    assert(r.head.getLong(0) === 0L)
    assert(r.head.isNullAt(2) && r.head.isNullAt(3) && r.head.isNullAt(4))
    // all-NULL input behaves identically
    val allNull = Seq[java.lang.Boolean](null, null).toDF("keep")
    val r2 = Stats.proportionCI(allNull, "keep").collect()
    assert(r2.head.getLong(0) === 0L && r2.head.isNullAt(3))
  }

  test("cvm2Sample: decimal-headroom guard fails loudly past ~3e7 rows/side") {
    // the guard sizes off the driver-side counts, so a tiny frame with a
    // forced failure isn't constructible — pin the predicate itself at the
    // documented boundary instead: (n·m)²·(n+m) ≤ 1e38
    def ok(n: Long, m: Long): Boolean =
      (BigInt(n) * BigInt(m)).pow(2) * BigInt(n + m) <= BigInt(10).pow(38)
    assert(ok(30000000L, 30000000L)) // 3e7 per side still fits
    assert(!ok(40000000L, 40000000L)) // 4e7 per side overflows
    assert(ok(1000000L, 1000000L))
  }

  test("trimmedMean: exact-rank tails, winsorize clamps, degenerate inputs") {
    import spark.implicits._
    // 1..10 with a wild outlier replacing 10: trim 10% of n=10 -> k=1
    // sorted: 1..9, 1000; trimmed mean = mean(2..9) = 5.5
    // winsorized: clamp 1->2 and 1000->9 -> (44 + 2 + 9)/10 = 5.5
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).toDF("v")
    val r = Stats.trimmedMean(df, "v", trimFraction = 0.1, scale = 1L).head()
    assert(r.getLong(0) === 10L && r.getLong(1) === 1L)
    assert(r.getDouble(2) === 5.5)
    assert(r.getDouble(3) === 5.5)
    assert(r.getDouble(4) === 2.0 && r.getDouble(5) === 9.0)
    // the outlier moved the raw mean to 104.5; the trimmed mean ignores it
    // trim 0: plain mean, cuts are global min/max
    val r0 = Stats.trimmedMean(df, "v", trimFraction = 0.0, scale = 1L).head()
    assert(r0.getDouble(2) === 104.5 && r0.getDouble(3) === 104.5)
    assert(r0.getDouble(4) === 1.0 && r0.getDouble(5) === 1000.0)
    // partitioning-independent (exact decimal sums)
    val rp = Stats.trimmedMean(df.repartition(5), "v", 0.1, 1L).head()
    assert(rp.getDouble(2) === 5.5 && rp.getDouble(3) === 5.5)
    // trim swallows everything / empty input: one row, NULL means
    val tiny = Seq(1.0, 2.0).toDF("v")
    val rt = Stats.trimmedMean(tiny, "v", trimFraction = 0.49, scale = 1L)
    assert(rt.count() === 1) // k=0 at n=2 -> fine; now force n-2k=0
    val re = Stats.trimmedMean(Seq.empty[Double].toDF("v"), "v").collect()
    assert(re.length === 1 && re.head.getLong(0) === 0L && re.head.isNullAt(2))
  }

  test("concentrationProfile: Gini/HHI closed forms, ties, guards") {
    import spark.implicits._
    // equal weights -> gini 0, hhi 1/g, top 1/g
    val eq = Seq(("a", 10L), ("b", 10L), ("c", 10L), ("d", 10L)).toDF("k", "w")
    val r = Stats.concentrationProfile(eq, "k", "w").head()
    assert(r.getLong(0) === 4L)
    assert(math.abs(r.getDouble(2)) < 1e-12)
    assert(r.getDouble(3) === 0.25 && r.getDouble(4) === 0.25)
    // one group owns everything: gini -> (g-1)/g, hhi -> 1
    val mono = Seq(("a", 0L), ("b", 0L), ("c", 0L), ("d", 100L)).toDF("k", "w")
    val rm = Stats.concentrationProfile(mono, "k", "w").head()
    assert(math.abs(rm.getDouble(2) - 0.75) < 1e-12)
    assert(rm.getDouble(3) === 1.0 && rm.getDouble(4) === 1.0)
    // hand case: weights 1,2,3,4 ascending -> gini = 2*(1+4+9+16)/(4*10) - 5/4 = 0.25
    val h = Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L)).toDF("k", "w")
    assert(math.abs(Stats.concentrationProfile(h, "k", "w").head().getDouble(2) - 0.25) < 1e-12)
    // weights aggregate per key before ranking
    val dup = Seq(("a", 1L), ("a", 1L), ("b", 2L)).toDF("k", "w")
    val rd = Stats.concentrationProfile(dup, "k", "w").head()
    assert(rd.getLong(0) === 2L && rd.getDouble(3) === 0.5)
    // negative weights: statistics NULL, counted loudly
    val neg = Seq(("a", -1L), ("b", 2L)).toDF("k", "w")
    val rn = Stats.concentrationProfile(neg, "k", "w").head()
    assert(rn.getLong(5) === 1L && rn.isNullAt(2) && rn.isNullAt(3))
    // empty: one row, zero groups, NULL statistics
    val re = Stats.concentrationProfile(
      Seq.empty[(String, Long)].toDF("k", "w"), "k", "w").collect()
    assert(re.length === 1 && re.head.getLong(0) === 0L && re.head.isNullAt(2))
  }

  test("concentrationProfile: fractional weights need weightScale; the gate fails loudly at scale 1") {
    import spark.implicits._
    import graft.core.{DataRef, FrameSource}
    val frac = Seq(("a", 0.1), ("b", 0.2), ("c", 0.3), ("d", 0.4)).toDF("k", "w")
    // at weightScale 1 every sub-0.5 row rounds to 0 -> stats NULL, not wrong
    val r1 = Stats.concentrationProfile(frac, "k", "w").head()
    assert(r1.getLong(0) === 4L && r1.isNullAt(2) && r1.getDouble(1) === 0.0)
    // scaled: weights 1,2,3,4 -> gini 0.25 exactly; total back in column units
    val r2 = Stats.concentrationProfile(frac, "k", "w", weightScale = 10L).head()
    assert(math.abs(r2.getDouble(2) - 0.25) < 1e-12)
    assert(math.abs(r2.getDouble(1) - 1.0) < 1e-12)
    assert(r2.getDouble(4) === 0.4)
    // the constraint: a zero-mass degenerate profile FAILS with the remedy...
    val cref = DataRef(FrameSource(frac, "conc_f"))
    val rf = graft.constraints.MaxConcentration(
      cref, "k", "w", maxGini = Some(1.0)).test(spark)
    assert(!rf.outcome)
    assert(rf.failureMessage.exists(_.contains("weightScale")))
    // ...and gates normally once the scale is given
    assert(graft.constraints.MaxConcentration(
      cref, "k", "w", maxGini = Some(0.3), weightScale = 10L).test(spark).outcome)
    assert(!graft.constraints.MaxConcentration(
      cref, "k", "w", maxGini = Some(0.2), weightScale = 10L).test(spark).outcome)
  }

  test("MinBootstrapMeanLowerBound: degenerate non-empty sample fails, empty stays vacuous") {
    import spark.implicits._
    import graft.core.{DataRef, FrameSource}
    // one row: ~37% of Poisson(1) replicate weights are 0, so far fewer
    // than the hi-rank resamples survive -> ci_lo NULL on NON-empty input
    val one = Seq((1L, 5.0)).toDF("id", "v")
    val r = graft.constraints.MinBootstrapMeanLowerBound(
      DataRef(FrameSource(one, "boot_d")), "id", "v",
      refValue = Some(0.0)).test(spark)
    assert(!r.outcome)
    assert(r.failureMessage.exists(_.contains("degenerate")))
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    assert(graft.constraints.MinBootstrapMeanLowerBound(
      DataRef(FrameSource(empty, "boot_e")), "id", "v",
      refValue = Some(0.0)).test(spark).outcome)
  }

  test("MinAnnRecall: auto paths pass a sane floor; starved index fails; empty vacuous") {
    import graft.core.{DataRef, FrameSource}
    val v = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val ref = DataRef(FrameSource(v, "ann_t"))
    // the honest corpus-size: both autos are near-exhaustive at this scale
    assert(graft.constraints.MinAnnRecall(
      ref, "vec_id", "embedding", Some(0.5), k = 3, nQueries = 20).test(spark).outcome)
    assert(graft.constraints.MinAnnRecall(
      ref, "vec_id", "embedding", Some(0.5), k = 3, nQueries = 20,
      method = "ivf").test(spark).outcome)
    // failure branch: at 2000 vectors the lsh auto is bounded (16 of 32
    // buckets per table x 3 tables) and measurably misses ~2% of true
    // neighbors — a 0.999 floor fails deterministically (fixed data,
    // fixed hashes)
    val v2 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val starved = graft.constraints.MinAnnRecall(
      DataRef(FrameSource(v2, "ann_f")), "vec_id", "embedding", Some(0.999),
      k = 10, nQueries = 200, method = "lsh").test(spark)
    assert(!starved.outcome)
    assert(starved.failureMessage.exists(_.contains("ANN recall")))
    // empty input: vacuous
    val empty = DataRef(FrameSource(
      v.where(org.apache.spark.sql.functions.lit(false)), "ann_e"))
    assert(graft.constraints.MinAnnRecall(
      empty, "vec_id", "embedding", Some(0.9)).test(spark).outcome)
    // an OVERSIZED corpusSizeHint (1e12 on ~2k rows) empties the
    // hash-stride query sample AND starves the auto index sizing — the
    // silent-vacuous hole was a PASS here; the fallback query sample must
    // instead measure the (near-zero) recall and fail LOUDLY
    val oversized = graft.constraints.MinAnnRecall(
      ref, "vec_id", "embedding", Some(0.5), k = 3, nQueries = 20,
      corpusSizeHint = Some(1000000000000L)).test(spark)
    assert(!oversized.outcome,
      "an oversized corpusSizeHint must not produce a vacuous pass")
    assert(oversized.failureMessage.exists(_.contains("ANN recall")))
  }

  test("TrimmedMeanBetween / MaxConcentration constraints: gates pass/fail") {
    import spark.implicits._
    import graft.core.{DataRef, FrameSource}
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).toDF("v")
    val ref = DataRef(FrameSource(df, "trim_t"))
    // trimmed mean 5.5 sits inside [5, 6]; the raw mean 104.5 would not
    assert(graft.constraints.TrimmedMeanBetween(
      ref, "v", 5.0, 6.0, trimFraction = 0.1, scale = 1L).test(spark).outcome)
    val bad = graft.constraints.TrimmedMeanBetween(
      ref, "v", 100.0, 200.0, trimFraction = 0.1, scale = 1L).test(spark)
    assert(!bad.outcome)
    assert(bad.failureMessage.exists(_.contains("trimmed")))

    val w = Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L)).toDF("k", "w")
    val cref = DataRef(FrameSource(w, "conc_t"))
    assert(graft.constraints.MaxConcentration(
      cref, "k", "w", maxGini = Some(0.3)).test(spark).outcome)
    assert(!graft.constraints.MaxConcentration(
      cref, "k", "w", maxGini = Some(0.2)).test(spark).outcome)
    assert(!graft.constraints.MaxConcentration(
      cref, "k", "w", maxTopShare = Some(0.3)).test(spark).outcome) // top 0.4
    // negative mass fails loudly even under a generous ceiling
    val neg = Seq(("a", -1L), ("b", 5L)).toDF("k", "w")
    val rn = graft.constraints.MaxConcentration(
      DataRef(FrameSource(neg, "conc_n")), "k", "w",
      maxGini = Some(1.0)).test(spark)
    assert(!rn.outcome)
    assert(rn.failureMessage.exists(_.contains("NEGATIVE")))
  }

  test("cohensKappa: hand-computed agreement, degenerate and empty inputs") {
    import spark.implicits._
    // n=4, agree=3 -> p_o = 0.75; marginals a:(a=3,b=1), b:(a=2,b=2) ->
    // p_e = (3*2 + 1*2)/16 = 0.5; kappa = (0.75-0.5)/(1-0.5) = 0.5
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b")).toDF("x", "y")
    val r = Stats.cohensKappa(df, "x", "y").head()
    assert(r.getLong(0) === 4L)
    assert(r.getInt(1) === 2 && r.getInt(2) === 2)
    assert(r.getDouble(3) === 0.75)
    assert(r.getDouble(4) === 0.5)
    assert(r.getDouble(5) === 0.5)
    // perfect agreement -> 1
    val perfect = Seq(("a", "a"), ("b", "b"), ("c", "c")).toDF("x", "y")
    assert(Stats.cohensKappa(perfect, "x", "y").head().getDouble(5) === 1.0)
    // both constant on the same label: p_e = 1 -> kappa NULL (no info)
    val const = Seq(("a", "a"), ("a", "a")).toDF("x", "y")
    assert(Stats.cohensKappa(const, "x", "y").head().isNullAt(5))
    // NULL is a category: null==null counts as agreement
    val withNull = Seq(("a", "a"), (null, null), ("a", "b")).toDF("x", "y")
    val rn = Stats.cohensKappa(withNull, "x", "y").head()
    assert(rn.getLong(0) === 3L && rn.getInt(1) === 2)
    // empty input: exactly one row, NULL statistic
    val empty = Seq.empty[(String, String)].toDF("x", "y")
    val re = Stats.cohensKappa(empty, "x", "y").collect()
    assert(re.length === 1 && re.head.getLong(0) === 0L && re.head.isNullAt(5))
  }

  test("MinCohensKappa constraint: agreement gate passes/fails; constant vacuous") {
    import spark.implicits._
    import graft.core.{DataRef, FrameSource}
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b")).toDF("x", "y")
    val ref = DataRef(FrameSource(df, "kappa_t"))
    val ok = graft.constraints.MinCohensKappa(ref, "x", "y", refValue = Some(0.4))
    assert(ok.test(spark).outcome)
    val bad = graft.constraints.MinCohensKappa(ref, "x", "y", refValue = Some(0.6))
    val res = bad.test(spark)
    assert(!res.outcome)
    assert(res.failureMessage.exists(_.contains("kappa")))
    val const = Seq(("a", "a")).toDF("x", "y")
    val vac = graft.constraints.MinCohensKappa(
      DataRef(FrameSource(const, "kappa_c")), "x", "y", refValue = Some(0.9))
    assert(vac.test(spark).outcome)
  }

  test("bootstrapMeanCI: brackets the mean, partitioning-independent, empty-safe") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, (i % 40).toDouble)).toDF("id", "v")
    val r = Stats.bootstrapMeanCI(df, "id", "v", nResamples = 100).head()
    assert(r.getLong(0) === 500L)
    assert(r.getInt(1) === 100)
    val (mean, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(lo <= mean && mean <= hi, s"CI [$lo, $hi] must bracket mean $mean")
    assert(hi - lo > 0, "interval must have width on a noisy sample")
    assert(hi - lo < 4.0, s"interval implausibly wide: [$lo, $hi]")
    // exact decimals + deterministic weights -> identical under repartition
    val r2 = Stats.bootstrapMeanCI(df.repartition(7), "id", "v", nResamples = 100).head()
    assert(r2.getDouble(3) === lo && r2.getDouble(4) === hi)
    // the md5 (oracle) flavor is an equally valid bootstrap: brackets the
    // mean, deterministic — only the lattice-uniform source differs
    val rm = Stats.bootstrapMeanCI(
      df, "id", "v", nResamples = 100, md5Flavor = true).head()
    assert(rm.getDouble(3) <= rm.getDouble(2) && rm.getDouble(2) <= rm.getDouble(4))
    val rm2 = Stats.bootstrapMeanCI(
      df.repartition(3), "id", "v", nResamples = 100, md5Flavor = true).head()
    assert(rm2.getDouble(3) === rm.getDouble(3) && rm2.getDouble(4) === rm.getDouble(4))
    // empty input: one row, NULLs (never NaN)
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    val re = Stats.bootstrapMeanCI(empty, "id", "v").collect()
    assert(re.length === 1 && re.head.getLong(0) === 0L && re.head.isNullAt(2)
      && re.head.isNullAt(3))
  }

  test("MinBootstrapMeanLowerBound constraint: evidence gate; empty vacuous") {
    import spark.implicits._
    import graft.core.{DataRef, FrameSource}
    val df = (1 to 400).map(i => (i.toLong, 10.0 + (i % 5))).toDF("id", "v")
    val ref = DataRef(FrameSource(df, "boot_t"))
    assert(graft.constraints.MinBootstrapMeanLowerBound(
      ref, "id", "v", refValue = Some(11.0)).test(spark).outcome)
    val res = graft.constraints.MinBootstrapMeanLowerBound(
      ref, "id", "v", refValue = Some(12.5)).test(spark)
    assert(!res.outcome)
    assert(res.failureMessage.exists(_.contains("Bootstrap")))
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    assert(graft.constraints.MinBootstrapMeanLowerBound(
      DataRef(FrameSource(empty, "boot_e")), "id", "v",
      refValue = Some(99.0)).test(spark).outcome)
  }

  test("cvm2Sample: scale lifts fractional values; partitioning-independent") {
    import spark.implicits._
    val a = Seq(0.25, 0.50, 0.75, 1.25).toDF("v")
    val b = Seq(0.50, 1.00, 1.50, 1.75).toDF("v")
    val r1 = Stats.cvm2Sample(a, b, "v", scale = 100L).head().getDouble(2)
    val r2 = Stats
      .cvm2Sample(a.repartition(7), b.repartition(3), "v", scale = 100L)
      .head().getDouble(2)
    assert(r1 === r2)
    assert(r1 > 0.0 && r1 < 1.0)
  }
}
