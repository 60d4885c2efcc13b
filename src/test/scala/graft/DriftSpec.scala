package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Drift

/** PSI and chi-square drift: zero on identical snapshots, hand-computed
  * contingency values, and p-values against the standard chi-square
  * critical points.
  */
class DriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("psi: identical distributions score 0; a shift scores > 0.25") {
    val a = (1 to 100).map(i => (i % 10) + 1.0).toDF("v")
    val same = Drift.psi(a, a, "v", 1.0, 11.0, 10).head()
    assert(same.getLong(0) === 100L && same.getLong(1) === 100L)
    assert(same.getDouble(2) === 0.0)
    val shifted = (1 to 100).map(i => (i % 10) / 2 + 6.0).toDF("v")
    val psi = Drift.psi(a, shifted, "v", 1.0, 11.0, 10).head().getDouble(2)
    assert(psi > 0.25, s"shifted psi=$psi")
  }

  test("psiFromHistograms: identical to psi on the underlying rows") {
    val a = (1 to 100).map(i => (i % 10) + 1.0).toDF("v")
    val b = (1 to 80).map(i => (i % 7) / 2 + 4.0).toDF("v")
    val direct = Drift.psi(a, b, "v", 1.0, 11.0, 10).head()
    val fromHists = Drift.psiFromHistograms(
      graft.ops.Stats.histogram(a, "v", 1.0, 11.0, 10),
      graft.ops.Stats.histogram(b, "v", 1.0, 11.0, 10), 10).head()
    assert(direct.getLong(0) === fromHists.getLong(0))
    assert(direct.getLong(1) === fromHists.getLong(1))
    assert(direct.getDouble(2) === fromHists.getDouble(2))
    // empty side: totals 0, psi finite (smoothing is part of the definition)
    val empty = graft.ops.Stats.histogram(
      Seq.empty[Double].toDF("v"), "v", 1.0, 11.0, 10)
    val re = Drift.psiFromHistograms(
      graft.ops.Stats.histogram(a, "v", 1.0, 11.0, 10), empty, 10).head()
    assert(re.getLong(1) === 0L && !re.getDouble(2).isNaN)
  }

  test("chiSquareDrift: hand-computed 2x2 contingency") {
    val a = (Seq.fill(10)("x") ++ Seq.fill(10)("y")).toDF("c")
    val b = (Seq.fill(5)("x") ++ Seq.fill(15)("y")).toDF("c")
    val r = Drift.chiSquareDrift(a, b, "c").head()
    assert(r.getLong(0) === 20L && r.getLong(1) === 20L)
    assert(r.getInt(2) === 2)
    // E(x)=7.5 both sides, E(y)=12.5: 2·(2.5²/7.5) + 2·(2.5²/12.5) = 8/3
    assert(math.abs(r.getDouble(3) - 8.0 / 3.0) < 1e-9)
    // identical snapshots: exactly 0
    val zero = Drift.chiSquareDrift(a, a, "c").head().getDouble(3)
    assert(zero === 0.0)
  }

  test("psi: buckets empty on BOTH sides still contribute their smoothed term") {
    // a=2 rows in bucket 0, b=1 row in bucket 0; buckets 1..9 empty on both
    // sides. With n_a != n_b each all-empty bucket's smoothed term
    // (0.5/(2+5) vs 0.5/(1+5)) is nonzero — the full-spine sum includes
    // all 10 of them.
    val a = Seq(1.0, 1.0).toDF("v")
    val b = Seq(1.0).toDF("v")
    val psi = Drift.psi(a, b, "v", 1.0, 11.0, 10).head().getDouble(2)
    val p0 = 2.5 / 7.0; val q0 = 1.5 / 6.0
    val pe = 0.5 / 7.0; val qe = 0.5 / 6.0
    val expected = (p0 - q0) * math.log(p0 / q0) +
      9.0 * (pe - qe) * math.log(pe / qe)
    assert(math.abs(psi - expected) < 1e-9, s"psi=$psi expected=$expected")
  }

  test("chiSquareDrift constraint: empty snapshots are vacuous, not NaN failures") {
    import graft.core.{DataRef, FrameSource}
    val a = Seq("x", "y").toDF("c")
    val empty = Seq.empty[String].toDF("c")
    def r(df: org.apache.spark.sql.DataFrame, n: String) =
      DataRef(FrameSource(df, n), Some(Seq("c")))
    // one empty side: E divides by a zero row total → guarded success
    assert(graft.constraints
      .ChiSquareDrift(r(a, "a"), r(empty, "e"), "c", 0.05).test(spark).outcome)
    assert(graft.constraints
      .ChiSquareDrift(r(empty, "e"), r(a, "a"), "c", 0.05).test(spark).outcome)
    // both empty: no contingency cells at all
    assert(graft.constraints
      .ChiSquareDrift(r(empty, "e"), r(empty, "e2"), "c", 0.05).test(spark).outcome)
    // single shared category: dof = 0, vacuous
    val onecat = Seq("x", "x").toDF("c")
    assert(graft.constraints
      .ChiSquareDrift(r(onecat, "o"), r(onecat, "o2"), "c", 0.05).test(spark).outcome)
  }

  test("chiSquareDrift: nulls are a category") {
    val a = Seq[Option[String]](Some("x"), None, None).toDF("c")
    val b = Seq[Option[String]](Some("x"), Some("x"), None).toDF("c")
    val r = Drift.chiSquareDrift(a, b, "c").head()
    assert(r.getInt(2) === 2)
    assert(r.getDouble(3) > 0.0)
  }

  test("drift constraints: PSI budget and chi-square significance") {
    import graft.requirements.BetweenRequirement
    val a = (1 to 100).map(i => ((i % 10) + 1.0, s"c${i % 3}")).toDF("v", "cat")
    val shifted = (1 to 100).map(i => ((i % 10) / 2 + 6.0, s"c${i % 3}"))
      .toDF("v", "cat")
    val okPsi = BetweenRequirement.fromDataFrames(a, a, "old", "new")
    okPsi.addMaxPsiDriftConstraint("v", 1.0, 11.0, 10, maxPsi = 0.1)
    assert(okPsi.test(spark).head.outcome)
    val badPsi = BetweenRequirement.fromDataFrames(a, shifted, "old", "new")
    badPsi.addMaxPsiDriftConstraint("v", 1.0, 11.0, 10, maxPsi = 0.25)
    val res = badPsi.test(spark).head
    assert(!res.outcome)
    assert(res.failureMessage.exists(_.contains("drift")))
    // chi-square: identical categories pass; a hard category flip fails
    val okChi = BetweenRequirement.fromDataFrames(a, a, "old", "new")
    okChi.addChiSquareDriftConstraint("cat")
    assert(okChi.test(spark).head.outcome)
    val flipped = (1 to 100).map(i => (1.0, if (i <= 95) "c0" else "c1"))
      .toDF("v", "cat")
    val badChi = BetweenRequirement.fromDataFrames(a, flipped, "old", "new")
    badChi.addChiSquareDriftConstraint("cat")
    assert(!badChi.test(spark).head.outcome)
  }

  test("chiSquarePValue matches the standard critical points") {
    assert(math.abs(Drift.chiSquarePValue(3.841, 1) - 0.05) < 2e-4)
    assert(math.abs(Drift.chiSquarePValue(6.635, 1) - 0.01) < 2e-4)
    assert(math.abs(Drift.chiSquarePValue(5.991, 2) - 0.05) < 2e-4)
    assert(math.abs(Drift.chiSquarePValue(18.307, 10) - 0.05) < 2e-4)
    assert(Drift.chiSquarePValue(0.0, 5) === 1.0)
    assert(Drift.chiSquarePValue(1000.0, 1) < 1e-100)
    // monotone in the statistic
    assert(Drift.chiSquarePValue(2.0, 3) > Drift.chiSquarePValue(3.0, 3))
  }

  test("wasserstein1: hand-computed transport, shift equivariance, null on empty") {
    val a = Seq(0.0, 0.0).toDF("v")
    val b = Seq(1.0, 1.0).toDF("v")
    val r = Drift.wasserstein1(a, b, "v").head()
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 1.0)
    // optimal transport of {0,1} → {0,3}: move 1→3, mean displacement 1
    val mixed = Drift
      .wasserstein1(Seq(0.0, 1.0).toDF("v"), Seq(0.0, 3.0).toDF("v"), "v")
      .head().getDouble(2)
    assert(mixed === 1.0)
    // a constant shift of the whole sample IS the distance (PSI can't say
    // this — its value depends on the bucket grid)
    val base = (1 to 50).map(_.toDouble).toDF("v")
    val shifted = (1 to 50).map(_ + 7.25).toDF("v")
    val w = Drift.wasserstein1(base, shifted, "v", scale = 100L).head().getDouble(2)
    assert(math.abs(w - 7.25) < 1e-9, s"shift distance $w")
    assert(Drift.wasserstein1(base, base, "v").head().getDouble(2) === 0.0)
    assert(Drift
      .wasserstein1(base, Seq.empty[Double].toDF("v"), "v").head().isNullAt(2))
  }

  test("wasserstein1: decimal-headroom guard trips loudly before a silent overflow") {
    // the guard reads (n, m, scaled span); past n*m*span > 1e38 the area
    // sum would overflow decimal(38,0) to NULL and sum() would DROP terms
    val running = Seq(0L, 4000000000000000000L).toDF("dj_v")
    val e = intercept[IllegalArgumentException] {
      Drift.requireW1Headroom(running, 10000000000L, 10000000000L, "w1test")
    }
    assert(e.getMessage.contains("headroom"))
    Drift.requireW1Headroom(running, 1000L, 1000L, "w1test") // fits: no throw
    // end-to-end small inputs stay untouched by the guard
    assert(Drift.wasserstein1(
      Seq(0.0, 1.0).toDF("v"), Seq(2.0).toDF("v"), "v").head().getDouble(2) === 1.5)
  }

  test("wasserstein1: partitioning-independent; unequal sizes") {
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val b = Seq(2.0, 4.0, 4.0, 6.0, 8.0, 10.0).toDF("v")
    val r1 = Drift.wasserstein1(a, b, "v").head().getDouble(2)
    val r2 = Drift
      .wasserstein1(a.repartition(5), b.repartition(4), "v").head().getDouble(2)
    assert(r1 === r2)
    // CDF areas: |F1−F2| piecewise over [1,10]
    assert(r1 > 0.0)
  }

  test("mutualInformation: 0 for independence, ln 2 for determination, nulls as category") {
    // 2×2 uniform independent
    val ind = (for { x <- Seq("a", "b"); y <- Seq("p", "q"); _ <- 1 to 5 }
      yield (x, y)).toDF("x", "y")
    val ri = Drift.mutualInformation(ind, "x", "y").head()
    assert(ri.getLong(0) === 20L)
    assert(ri.getInt(1) === 2 && ri.getInt(2) === 2)
    assert(math.abs(ri.getDouble(3)) < 1e-12)
    // y determined by x, uniform binary → MI = H = ln 2
    val det = (1 to 40).map(i => (s"c${i % 2}", s"d${i % 2}")).toDF("x", "y")
    val rd = Drift.mutualInformation(det, "x", "y").head()
    assert(math.abs(rd.getDouble(3) - math.log(2.0)) < 1e-12)
    // NULL is a category: x null for half the rows, y tracks nullness
    val withNulls = (1 to 20)
      .map(i => (if (i % 2 == 0) "v" else null, s"w${i % 2}"))
      .toDF("x", "y")
    val rn = Drift.mutualInformation(withNulls, "x", "y").head()
    assert(rn.getInt(1) === 2)
    assert(math.abs(rn.getDouble(3) - math.log(2.0)) < 1e-12)
  }

  test("mutualInformation: empty input yields exactly one NULL-statistic row") {
    val empty = Seq.empty[(String, String)].toDF("x", "y")
    val rows = Drift.mutualInformation(empty, "x", "y").collect()
    assert(rows.length === 1) // .head() callers must not throw
    val r = rows.head
    assert(r.getLong(0) === 0L)
    assert(r.getInt(1) === 0 && r.getInt(2) === 0)
    assert(r.isNullAt(3)) // mi_nats
    assert(r.getDouble(4) === 0.0 && r.getDouble(5) === 0.0) // h_x, h_y
    assert(r.isNullAt(6)) // u_sym
  }

  test("driftReport: one row per column, agrees with the individual ops") {
    val a = Seq((1.0, "x"), (2.0, "x"), (3.0, "y"), (4.0, "y"))
      .toDF("v", "c")
    val b = Seq((2.0, "x"), (4.0, "y"), (6.0, "y"), (8.0, "y"))
      .toDF("v", "c")
    // auto column selection from the shared schema
    val rows = Drift.driftReport(a, b, scale = 1L)
      .collect().map(r => (r.getString(0), r)).toMap
    assert(rows.size === 2)
    val num = rows("v")
    assert(num.getString(1) === "numeric")
    assert(num.getLong(2) === 4L && num.getLong(3) === 4L)
    // KS D and W1 must equal the standalone operators' values
    val w1 = Drift.wasserstein1(a, b, "v", scale = 1L).head().getDouble(2)
    assert(num.getDouble(5) === w1)
    assert(num.getDouble(4) > 0 && num.getDouble(4) <= 1)
    assert(num.isNullAt(6) && num.isNullAt(7))
    val cat = rows("c")
    assert(cat.getString(1) === "categorical")
    val chi2 = Drift.chiSquareDrift(a, b, "c").head().getDouble(3)
    assert(cat.getDouble(6) === chi2)
    assert(cat.getInt(7) === 2)
    assert(cat.isNullAt(4) && cat.isNullAt(5))
    // a numeric column empty on one side reports NULL statistics
    val empty = Seq.empty[(Double, String)].toDF("v", "c")
    val er = Drift.driftReport(a, empty, numericCols = Seq("v"),
      categoricalCols = Seq("c"), scale = 1L).collect()
    val ev = er.find(_.getString(0) == "v").get
    assert(ev.isNullAt(4) && ev.isNullAt(5))
  }

  test("quantileShift: discrete ranks per side, shift in real units") {
    import org.apache.spark.sql.functions.lit
    val a = (1 to 100).map(_.toDouble).toDF("v")
    val b = (1 to 100).map(_ + 10.0).toDF("v")
    val got = Drift.quantileShift(a, b, "v", Seq(25, 50, 99))
      .collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // quantile_disc on 1..100: p25 → 25, p50 → 50, p99 → 99
    assert(got(25) === ((25.0, 35.0, 10.0)))
    assert(got(50) === ((50.0, 60.0, 10.0)))
    assert(got(99) === ((99.0, 109.0, 10.0)))
    // scale path: cents stay exact
    val sa = Seq(1.25, 2.50).toDF("v")
    val sb = Seq(2.25, 3.50).toDF("v")
    val s50 = Drift.quantileShift(sa, sb, "v", Seq(50), scale = 100L).head()
    assert(s50.getDouble(1) === 1.25 && s50.getDouble(2) === 2.25)
    assert(s50.getDouble(3) === 1.0)
    // empty side → empty report
    assert(Drift
      .quantileShift(a, spark.emptyDataFrame.select(lit(1.0).as("v"))
        .where(lit(false)), "v", Seq(50)).count() === 0L)
  }

  test("wassersteinByGroup: per-key W1 matches the global W1 on single-key slices") {
    import org.apache.spark.sql.functions.col
    val a = (Seq(("g1", 0.0), ("g1", 0.0)) ++ Seq(("g2", 5.0)) ++
      Seq(("g3", 1.0))).toDF("k", "v")
    val b = (Seq(("g1", 1.0), ("g1", 1.0)) ++ Seq(("g2", 9.0))).toDF("k", "v")
    val got = Drift.wassersteinByGroup(a, b, "v", "k")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(got("g1") === ((2L, 2L, Some(1.0))))
    assert(got("g2") === ((1L, 1L, Some(4.0))))
    assert(got("g3") === ((1L, 0L, None)))
    // agrees with the whole-table operator on a single-key slice
    val base = (1 to 30).map(_.toDouble).map(("s", _)).toDF("k", "v")
    val shifted = (1 to 30).map(_ + 2.5).map(("s", _)).toDF("k", "v")
    val grouped = Drift
      .wassersteinByGroup(base, shifted, "v", "k", scale = 10L)
      .head().getDouble(3)
    val global = Drift
      .wasserstein1(base.select(col("v")), shifted.select(col("v")), "v",
        scale = 10L)
      .head().getDouble(2)
    assert(grouped === global)
  }

  test("mutualInformation: entropies and symmetric uncertainty") {
    // y determined by x, uniform binary: MI = H(X) = H(Y) = ln 2 → u_sym 1
    val det = (1 to 40).map(i => (s"c${i % 2}", s"d${i % 2}")).toDF("x", "y")
    val rd = Drift.mutualInformation(det, "x", "y").head()
    assert(math.abs(rd.getDouble(4) - math.log(2.0)) < 1e-12)
    assert(math.abs(rd.getDouble(5) - math.log(2.0)) < 1e-12)
    assert(math.abs(rd.getDouble(6) - 1.0) < 1e-12)
    // independent: u_sym 0
    val ind = (for { x <- Seq("a", "b"); y <- Seq("p", "q"); _ <- 1 to 5 }
      yield (x, y)).toDF("x", "y")
    val ri = Drift.mutualInformation(ind, "x", "y").head()
    assert(math.abs(ri.getDouble(6)) < 1e-12)
    // both columns constant: entropies 0 → u_sym NULL
    val const = (1 to 10).map(_ => ("k", "w")).toDF("x", "y")
    assert(Drift.mutualInformation(const, "x", "y").head().isNullAt(6))
  }

  test("EDF statistics fuzz parity: W1, CvM, AUC vs in-memory brute force") {
    import graft.ops.Stats
    import org.apache.spark.sql.functions.col
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      // small integer domain forces heavy ties — the hard case
      val xs = Seq.fill(30 + rnd.nextInt(50))(rnd.nextInt(20).toDouble)
      val ys = Seq.fill(30 + rnd.nextInt(50))(rnd.nextInt(20).toDouble)
      val (a, b) = (xs.toDF("v"), ys.toDF("v"))
      val n = xs.size.toDouble
      val m = ys.size.toDouble

      // reference W1: integrate |F1 − F2| over the sorted union axis
      val union = (xs ++ ys).distinct.sorted
      val refW1 = union.zip(union.tail).map { case (v, nx) =>
        val f1 = xs.count(_ <= v) / n
        val f2 = ys.count(_ <= v) / m
        math.abs(f1 - f2) * (nx - v)
      }.sum
      val gotW1 = Drift.wasserstein1(a, b, "v").head().getDouble(2)
      assert(math.abs(gotW1 - refW1) < 1e-9, s"seed $seed W1 $gotW1 vs $refW1")

      // reference CvM: nm/(n+m)² · Σ over pooled points (F1 − F2)²
      val refCvm = (xs ++ ys).map { z =>
        val d = xs.count(_ <= z) / n - ys.count(_ <= z) / m
        d * d
      }.sum * (n * m) / math.pow(n + m, 2)
      val gotCvm = Stats.cvm2Sample(a, b, "v").head().getDouble(2)
      assert(math.abs(gotCvm - refCvm) < 1e-9, s"seed $seed CvM $gotCvm vs $refCvm")

      // reference AUC: pairwise wins + half-ties
      val labeled = xs.map((_, true)) ++ ys.map((_, false))
      val refAuc = (for { x <- xs; y <- ys } yield
        if (x > y) 1.0 else if (x == y) 0.5 else 0.0).sum / (n * m)
      val gotAuc = Stats
        .aucExact(labeled.toDF("s", "y"), "s", col("y"))
        .head().getDouble(2)
      assert(math.abs(gotAuc - refAuc) < 1e-12, s"seed $seed AUC $gotAuc vs $refAuc")
      graft.core.Blocks.releaseAll()
    }
  }

  test("drift constraints: W1 budget, CvM vacuous-on-empty, MI budget") {
    import graft.core.{DataRef, FrameSource}
    import graft.requirements.{BetweenRequirement, WithinRequirement}
    val base = (1 to 50).map(_.toDouble).toDF("v")
    val shifted = (1 to 50).map(_ + 3.0).toDF("v")
    val okW = BetweenRequirement.fromDataFrames(base, shifted, "old", "new")
    okW.addMaxWassersteinDriftConstraint("v", maxW1 = 3.5)
    assert(okW.test(spark).head.outcome)
    val badW = BetweenRequirement.fromDataFrames(base, shifted, "old", "new")
    badW.addMaxWassersteinDriftConstraint("v", maxW1 = 2.9)
    val res = badW.test(spark).head
    assert(!res.outcome)
    assert(res.failureMessage.exists(_.contains("Wasserstein")))
    // CvM: small-drift pass, and an empty side is vacuous
    val okC = BetweenRequirement.fromDataFrames(base, shifted, "old", "new")
    okC.addMaxCvmDriftConstraint("v", maxCvm = 1.0)
    assert(okC.test(spark).head.outcome)
    val empty = Seq.empty[Double].toDF("v")
    val vac = BetweenRequirement.fromDataFrames(base, empty, "old", "new")
    vac.addMaxCvmDriftConstraint("v", maxCvm = 0.0)
    assert(vac.test(spark).head.outcome)
    // MI: the determined pair fails a tight budget, independence passes
    val det = (1 to 40).map(i => (s"c${i % 2}", s"d${i % 2}")).toDF("x", "y")
    val badM = WithinRequirement.fromDataFrame(det, "t")
    badM.addMaxMutualInformationConstraint("x", "y", maxMi = 0.1)
    val mres = badM.test(spark).head
    assert(!mres.outcome)
    assert(mres.failureMessage.exists(_.contains("mutual information")))
    val ind = (for { x <- Seq("a", "b"); y <- Seq("p", "q"); _ <- 1 to 5 }
      yield (x, y)).toDF("x", "y")
    val okM = WithinRequirement.fromDataFrame(ind, "t")
    okM.addMaxMutualInformationConstraint("x", "y", maxMi = 1e-9)
    assert(okM.test(spark).head.outcome)
  }
}
