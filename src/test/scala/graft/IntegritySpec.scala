package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Integrity
import graft.requirements.{BetweenRequirement, WithinRequirement}

/** FK-orphan, monotonicity, and outlier operators + their declarable
  * constraints: hand-built truth tables including the NULL-exemption,
  * tie-ordering, and exact-boundary cases.
  */
class IntegritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("orphans: NULL child keys exempt, distinct parents, anti semantics") {
    val child = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, java.lang.Long.valueOf(10L)),
        Row(2L, java.lang.Long.valueOf(11L)),
        Row(3L, java.lang.Long.valueOf(99L)),  // orphan
        Row(4L, java.lang.Long.valueOf(99L)),  // same orphan key
        Row(5L, null.asInstanceOf[java.lang.Long]))), // exempt
      StructType(Seq(
        StructField("id", LongType), StructField("fk", LongType))))
    val parent = Seq(10L, 10L, 11L).toDF("pk") // duplicate parents fine
    val o = Integrity.orphans(child, parent, Seq("fk"), Seq("pk"))
      .select("id").as[Long].collect().toSet
    assert(o === Set(3L, 4L))
    val stats = Integrity
      .orphanStats(child, parent, Seq("fk"), Seq("pk")).head()
    assert(stats.getLong(0) === 4L, "null-key row not counted as checked")
    assert(stats.getLong(1) === 2L)
    assert(stats.getLong(2) === 1L)
  }

  test("referential-integrity constraint pass/fail") {
    val child = Seq(10L, 11L, 99L, 98L).toDF("fk")
    val parent = Seq(10L, 11L).toDF("pk")
    val ok = BetweenRequirement.fromDataFrames(child, parent, "c", "p")
    ok.addReferentialIntegrityConstraint(Seq("fk"), Seq("pk"), maxOrphanFraction = 0.5)
    assert(ok.test(spark).head.outcome)
    val bad = BetweenRequirement.fromDataFrames(child, parent, "c", "p")
    bad.addReferentialIntegrityConstraint(Seq("fk"), Seq("pk"))
    val res = bad.test(spark).head
    assert(!res.outcome)
    assert(res.failureMessage.exists(_.contains("reference no")))
  }

  test("malformed-JSON budget: truncated docs counted, nested schema parses") {
    import graft.ops.SemiStructured
    val df = Seq(
      """{"k": 1, "tags": ["a", "b"]}""",
      """{"k": 2, "tags": []}""",
      """{"k": 3, "tags": ["c"]""", // truncated — Jackson would accept it
      """not json at all"""
    ).toDF("doc")
    assert(SemiStructured.malformedFraction(df, "doc", "k INT, tags ARRAY<STRING>") === 0.5)
    val parsed = SemiStructured
      .withParsedJson(df, "doc", "k INT, tags ARRAY<STRING>")
      .where($"json_ok")
      .select($"parsed.k", $"parsed.tags")
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    assert(parsed === Map(1 -> Seq("a", "b"), 2 -> Seq()))

    val ok = WithinRequirement.fromDataFrame(df, "feed")
    ok.addMaxMalformedJsonFractionConstraint("doc", "k INT", maxFraction = 0.5)
    assert(ok.test(spark).head.outcome)
    val bad = WithinRequirement.fromDataFrame(df, "feed")
    bad.addMaxMalformedJsonFractionConstraint("doc", "k INT", maxFraction = 0.25)
    val res = bad.test(spark).head
    assert(!res.outcome)
    assert(res.failureMessage.exists(_.contains("fail to parse")))
  }

  test("key-overlap constraint: exact-key contamination budget") {
    val train = Seq("u1", "u2", "u3", "u4").toDF("url")
    val eval_ = Seq("u3", "u9").toDF("url")
    val ok = BetweenRequirement.fromDataFrames(train, eval_, "train", "eval")
    ok.addMaxKeyOverlapFractionConstraint(Seq("url"), Seq("url"), maxFraction = 0.25)
    assert(ok.test(spark).head.outcome) // 1 of 4
    val bad = BetweenRequirement.fromDataFrames(train, eval_, "train", "eval")
    bad.addMaxKeyOverlapFractionConstraint(Seq("url"), Seq("url"), maxFraction = 0.0)
    val res = bad.test(spark).head
    assert(!res.outcome)
    assert(res.failureMessage.exists(_.contains("contamination")))
  }

  test("monotonicity: ties never violate, strict flags plateaus") {
    val df = Seq(
      // key a: 1,2,2,3 by order — loose: 0 violations, strict: 1 (the tie)
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 2.0), ("a", 4L, 3.0),
      // key b: goes backwards once
      ("b", 1L, 5.0), ("b", 2L, 4.0), ("b", 3L, 6.0)
    ).toDF("k", "o", "v")
    val loose = Integrity.monotonicityViolations(df, "k", "o", "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(loose("a") === ((3L, 0L)))
    assert(loose("b") === ((2L, 1L)))
    val strict = Integrity
      .monotonicityViolations(df, "k", "o", "v", strict = true)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(strict("a") === 1L)

    val ok = WithinRequirement.fromDataFrame(df, "events")
    ok.addMonotonicityConstraint("k", "o", "v", maxViolationFraction = 0.2)
    assert(ok.test(spark).head.outcome) // 1 of 5 pairs
    val bad = WithinRequirement.fromDataFrame(df, "events")
    bad.addMonotonicityConstraint("k", "o", "v")
    assert(!bad.test(spark).head.outcome)
  }

  test("zOutliers: exact boundary — k·σ exactly is NOT an outlier") {
    // values 0,0,10,10 → μ=5, σ=5; with k=1 the boundary |x−μ|=σ holds
    // exactly for every row → zero outliers (strict >)
    val df = Seq(0L, 0L, 10L, 10L).toDF("x")
    val n = Integrity.zOutliers(df, "x", k = 1)
      .where($"is_outlier").count()
    assert(n === 0L)
    // one far point: 0,0,0,0,100 → clearly outlying at k=1
    val df2 = Seq(0L, 0L, 0L, 0L, 100L).toDF("x")
    val out = Integrity.zOutliers(df2, "x", k = 1)
      .where($"is_outlier").select("x").as[Long].collect().toSeq
    assert(out === Seq(100L))

    val ok = WithinRequirement.fromDataFrame(df2, "t")
    ok.addMaxOutlierFractionConstraint("x", maxFraction = 0.2, k = 1)
    assert(ok.test(spark).head.outcome)
    val bad = WithinRequirement.fromDataFrame(df2, "t")
    bad.addMaxOutlierFractionConstraint("x", maxFraction = 0.1, k = 1)
    assert(!bad.test(spark).head.outcome)
  }

  test("madOutliers: hand-computed medians, threshold quantization, masking immunity") {
    // [1..9, 1000]: median 5.5 (M2=11), devs |2v-11| = [9,7,5,3,1,1,3,5,7,1989],
    // median(dev) 5 (D2=10) -> MAD 2.5. k=3.5: only the 1000 flags.
    val df = (Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 1000L)).toDF("x")
    val out35 = Integrity.madOutliers(df, "x", k = 3.5)
      .where($"is_outlier").select("x").as[Long].collect().toSeq
    assert(out35 === Seq(1000L))
    // k=1: K=14826, rhs=148260; dev=9 (v=1) -> 180000 flags, dev=7 doesn't
    val out1 = Integrity.madOutliers(df, "x", k = 1.0)
      .where($"is_outlier").select("x").as[Long].collect().toSeq.sorted
    assert(out1 === Seq(1L, 1000L))
    // masking immunity: the same data defeats z-scores at k=1.5 (the
    // outlier inflates sigma) but not the MAD flavor
    val z = Integrity.zOutliers(df, "x", k = 3)
      .where($"is_outlier").select("x").as[Long].collect().toSeq
    val m = Integrity.madOutliers(df, "x", k = 3.0)
      .where($"is_outlier").select("x").as[Long].collect().toSeq
    assert(m === Seq(1000L))
    graft.core.Blocks.releaseAll()
  }

  test("madOutliers: MAD=0 degeneracy flags any deviation; nulls drop") {
    val df = Seq(Some(5L), Some(5L), Some(5L), Some(5L), Some(9L), None)
      .toDF("x")
    val out = Integrity.madOutliers(df, "x", k = 3.5)
      .collect().map(r => Option(r.get(0)) -> r.getBoolean(1)).toMap
    assert(out(Some(5L)) === false)
    assert(out(Some(9L)) === true)
    assert(!out.contains(None)) // null rows filtered
    // empty input: no rows, no crash
    assert(Integrity.madOutliers(
      Seq.empty[Long].toDF("x"), "x").count() === 0L)
    graft.core.Blocks.releaseAll()
  }

  test("MaxRobustOutlierFraction pass / fail") {
    val df = (Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 1000L)).toDF("x")
    val ok = WithinRequirement.fromDataFrame(df, "t")
    ok.addMaxRobustOutlierFractionConstraint("x", maxFraction = 0.15)
    assert(ok.test(spark).head.outcome)
    val bad = WithinRequirement.fromDataFrame(df, "t")
    bad.addMaxRobustOutlierFractionConstraint("x", maxFraction = 0.05)
    val r = bad.test(spark).head
    assert(!r.outcome)
    assert(r.failureMessage.exists(_.contains("robust sigmas")))
  }

  test("benfordProfile: exact digit shares, exclusions, zero-count spine") {
    // counts by first digit: 1 -> 3 (1, 12, 150), 2 -> 1, 9 -> 2;
    // excluded: null, 0.5, -0.3 (|v| < 1); negatives count by |v|
    val df = Seq[java.lang.Double](1.0, 12.0, 150.0, 2.5, 9.0, -90.0,
      0.5, -0.3, null).toDF("v")
    val rows = graft.ops.Integrity.benfordProfile(df, "v")
      .orderBy("digit").collect()
    assert(rows.length === 9)
    val byDigit = rows.map(r => r.getInt(0) -> r).toMap
    assert(byDigit(1).getLong(1) === 3L)
    assert(byDigit(2).getLong(1) === 1L)
    assert(byDigit(9).getLong(1) === 2L)
    assert(byDigit(3).getLong(1) === 0L) // spine keeps zero-count digits
    assert(byDigit(1).getDouble(2) === 0.5) // 3 of 6 eligible
    assert(rows.forall(_.getLong(4) === 3L)) // null + two sub-1 magnitudes
    // expectations are the hardcoded literals, summing to ~1
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-12)
    // empty eligible set: shares NULL, spine intact
    val none = Seq[java.lang.Double](0.1, null).toDF("v")
    val re = graft.ops.Integrity.benfordProfile(none, "v").collect()
    assert(re.length === 9 && re.forall(_.isNullAt(2)))
  }

  test("benfordProfile: |v| >= 1e38 and NaN are excluded, accounting stays exhaustive") {
    // pre-fix these rows overflowed the decimal(38,0) render to NULL and
    // vanished from BOTH n_digit and n_excluded (and DuckDB's HUGEINT
    // oracle errors near 1.7e38); now they land in n_excluded
    val df = Seq[java.lang.Double](1.0, 25.0, 1e300, -3e38, 1e38, 0.5,
      Double.NaN, null).toDF("v")
    val rows = graft.ops.Integrity.benfordProfile(df, "v").collect()
    assert(rows.map(_.getLong(1)).sum === 2L) // only 1.0 and 25.0 count
    assert(rows.forall(_.getLong(4) === 6L)) // 1e300, -3e38, 1e38, 0.5, NaN, null
    // boundary stays IN: the largest double below 1e38
    val edge = Seq(math.nextDown(1e38)).toDF("v")
    val er = graft.ops.Integrity.benfordProfile(edge, "v").collect()
    assert(er.map(_.getLong(1)).sum === 1L && er.forall(_.getLong(4) === 0L))
  }

  test("MaxBenfordDeviation: conforming passes, fabricated fails, empty vacuous") {
    // geometric values conform closely; constant-leading-digit data fails
    val conforming = (1 to 2000)
      .map(i => math.pow(10.0, (i * 0.618033988749895) % 3.0))
      .toDF("v")
    val ok = WithinRequirement.fromDataFrame(conforming, "benford_ok")
    ok.addMaxBenfordDeviationConstraint("v", maxMad = 0.02)
    assert(ok.test(spark).head.outcome)
    val fabricated = (1 to 500).map(i => 500.0 + i % 10).toDF("v")
    val bad = WithinRequirement.fromDataFrame(fabricated, "benford_bad")
    bad.addMaxBenfordDeviationConstraint("v", maxMad = 0.02)
    val r = bad.test(spark).head
    assert(!r.outcome)
    assert(r.failureMessage.exists(_.contains("Benford")))
    val empty = Seq.empty[Double].toDF("v")
    val vac = WithinRequirement.fromDataFrame(empty, "benford_e")
    vac.addMaxBenfordDeviationConstraint("v", maxMad = 0.0)
    assert(vac.test(spark).head.outcome)
  }
}
