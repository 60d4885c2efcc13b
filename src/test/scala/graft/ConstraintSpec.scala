package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Condition, DataRef, FrameSource}
import graft.constraints._
import graft.requirements.{BetweenRequirement, WithinRequirement}

/** Truth-table tests mirroring the reference's integration-test style
  * (`tests/integration/test_integration.py:69-...`): each case asserts the
  * constraint's boolean outcome flips exactly where expected.
  */
class ConstraintSpec extends AnyFunSuite {
  import TestSpark._

  // int_table1: 1..19 (reference conftest.py:114-120)
  private lazy val int1  = intDf("int_table1", (1 to 19).map(Integer.valueOf))
  private lazy val int2  = intDf("int_table2", (2 to 19).map(Integer.valueOf))
  private def ref1 = DataRef(FrameSource(int1, "int_table1"), Some(Seq("col_int")))
  private def ref2 = DataRef(FrameSource(int2, "int_table2"), Some(Seq("col_int")))
  private def r1NoCols = DataRef(FrameSource(int1, "int_table1"))
  private def r2NoCols = DataRef(FrameSource(int2, "int_table2"))

  // --- nrows ---------------------------------------------------------------
  test("NRowsEquality holds at the exact count and fails off-by-one") {
    assert(NRowsEquality(r1NoCols, refValue = Some(19L)).test(spark).outcome)
    assert(!NRowsEquality(r1NoCols, refValue = Some(18L)).test(spark).outcome)
    assert(NRowsEquality(r1NoCols, ref2 = Some(r1NoCols)).test(spark).outcome)
    assert(!NRowsEquality(r1NoCols, ref2 = Some(r2NoCols)).test(spark).outcome)
  }

  test("NRowsMin / NRowsMax bound the count") {
    assert(NRowsMin(r1NoCols, refValue = Some(19L)).test(spark).outcome)
    assert(NRowsMin(r1NoCols, refValue = Some(1L)).test(spark).outcome)
    assert(!NRowsMin(r1NoCols, refValue = Some(20L)).test(spark).outcome)
    assert(NRowsMax(r1NoCols, refValue = Some(19L)).test(spark).outcome)
    assert(!NRowsMax(r1NoCols, refValue = Some(18L)).test(spark).outcome)
  }

  test("NRows conditions restrict the selection") {
    val cond = Condition.raw("col_int > 10")
    assert(
      NRowsEquality(r1NoCols.copy(condition = Some(cond)), refValue = Some(9L))
        .test(spark).outcome)
  }

  test("NRows gain/loss tolerances (between)") {
    // int1 has 19 rows, int2 has 18: gain (19-18)/18 ≈ 0.0556 relative to int2
    assert(NRowsMaxGain(r1NoCols, r2NoCols, _ => 0.06).test(spark).outcome)
    assert(!NRowsMaxGain(r1NoCols, r2NoCols, _ => 0.05).test(spark).outcome)
    assert(NRowsMinGain(r1NoCols, r2NoCols, _ => 0.05).test(spark).outcome)
    assert(!NRowsMinGain(r1NoCols, r2NoCols, _ => 0.06).test(spark).outcome)
    // loss direction: int2 relative to int1: (19-18)/19 ≈ 0.0526
    assert(NRowsMaxLoss(r2NoCols, r1NoCols, _ => 0.06).test(spark).outcome)
    assert(!NRowsMaxLoss(r2NoCols, r1NoCols, _ => 0.05).test(spark).outcome)
  }

  test("between-condition rendering has the reference's branch structure (base.py:225-246)") {
    // chosen so every filtered pairing still has unequal row counts (the
    // message only renders on failure): 19|18 → >0 keeps 19|18, >2 keeps 17|17
    val cond1 = Condition.raw("col_int > 0")
    val cond2 = Condition.raw("col_int > 2")
    def msgOf(r1: DataRef, r2: DataRef): String =
      NRowsEquality(r1, ref2 = Some(r2)).test(spark).failureMessage.getOrElse("")
    val base1 = r1NoCols // 19 rows
    val base2 = r2NoCols // 18 rows — always unequal, so messages render
    assert(msgOf(base1.copy(condition = Some(cond1)), base2.copy(condition = Some(cond1)))
      .contains("Condition on both tables: col_int > 0;"))
    assert(msgOf(base1, base2.copy(condition = Some(cond2)))
      .contains("Condition on second table: col_int > 2;"))
    assert(msgOf(base1.copy(condition = Some(cond1)), base2)
      .contains("Condition on first table: col_int > 0;"))
    val both = msgOf(base1.copy(condition = Some(cond1)), base2.copy(condition = Some(cond2)))
    assert(both.contains("Condition on first table: col_int > 0.") &&
      both.contains("Condition on second table: col_int > 2."), both)
    // within constraints keep the single-condition form
    val within = NRowsEquality(base1.copy(condition = Some(cond1)), refValue = Some(99L))
      .test(spark).failureMessage.getOrElse("")
    assert(within.contains("Condition: col_int > 0."), within)
  }

  test("NRowsMinGain edge semantics match the reference (nrows.py:155-184)") {
    val empty = DataRef(FrameSource(intDf("int_empty", Seq.empty), "int_empty"))
    // empty target table → success ("Empty target table.")
    assert(NRowsMinGain(r1NoCols, empty, _ => 0.5).test(spark).outcome)
    // row loss (factual < target) → failure regardless of tolerance
    val loss = NRowsMinGain(r2NoCols, r1NoCols, _ => -10.0).test(spark)
    assert(!loss.outcome)
    assert(loss.failureMessage.get.contains("Row loss"), loss.failureMessage.get)
    // MaxGain / MaxLoss with empty target also succeed, as in the reference
    assert(NRowsMaxGain(r1NoCols, empty, _ => 0.0).test(spark).outcome)
    assert(NRowsMaxLoss(r1NoCols, empty, _ => 0.0).test(spark).outcome)
  }

  // --- numeric -------------------------------------------------------------
  test("NumericMin / NumericMax against literals and between sources") {
    assert(NumericMin(ref1, refValue = Some(Some(1.0))).test(spark).outcome)
    assert(!NumericMin(ref1, refValue = Some(Some(2.0))).test(spark).outcome)
    assert(NumericMax(ref1, refValue = Some(Some(19.0))).test(spark).outcome)
    assert(!NumericMax(ref1, refValue = Some(Some(18.0))).test(spark).outcome)
    // between: min(int1)=1 < min(int2)=2 → fails; max(int1)=19 > max(int2)=19 ok
    assert(!NumericMin(ref1, ref2 = Some(ref2)).test(spark).outcome)
    assert(NumericMax(ref1, ref2 = Some(ref2)).test(spark).outcome)
  }

  test("NumericBetween fraction semantics") {
    // 10 of 19 values in [10, 19]
    assert(NumericBetween(ref1, 10.0 / 19, 10, 19).test(spark).outcome)
    assert(!NumericBetween(ref1, 0.6, 10, 19).test(spark).outcome)
  }

  test("NumericMean absolute deviation") {
    // mean(1..19) = 10
    assert(NumericMean(ref1, 0.0, refValue = Some(Some(10.0))).test(spark).outcome)
    assert(!NumericMean(ref1, 0.4, refValue = Some(Some(10.5))).test(spark).outcome)
    assert(NumericMean(ref1, 0.5, refValue = Some(Some(10.5))).test(spark).outcome)
  }

  test("NumericPercentile exact reference semantics") {
    // smallest v such that >= p% of values <= v over 1..19
    assert(
      NumericPercentile(ref1, 50.0, maxAbsoluteDeviation = Some(0.0), refValue = Some(10.0))
        .test(spark).outcome)
    assert(
      NumericPercentile(ref1, 100.0, maxAbsoluteDeviation = Some(0.0), refValue = Some(19.0))
        .test(spark).outcome)
    // 5% of 19 rows = 0.95 rows → first value with cum>=0.95 is 1
    assert(
      NumericPercentile(ref1, 5.0, maxAbsoluteDeviation = Some(0.0), refValue = Some(1.0))
        .test(spark).outcome)
    assert(
      !NumericPercentile(ref1, 50.0, maxAbsoluteDeviation = Some(0.4), refValue = Some(10.5))
        .test(spark).outcome)
  }

  // --- uniques -------------------------------------------------------------
  private lazy val unique1 = mixDf(
    (0 until 60).map(i => (Integer.valueOf(i / 2), s"hi${i / 3}", "2016-01-01")) ++
      Seq((null, null, null), (null, "hi", null)))
  private def uRefInt =
    DataRef(FrameSource(unique1, "unique_table1"), Some(Seq("col_int")))
  private def uRefVarchar =
    DataRef(FrameSource(unique1, "unique_table1"), Some(Seq("col_varchar")))

  test("UniquesEquality with null filtering") {
    // col_int uniques: 0..29 (nulls filtered by default policy)
    assert(
      UniquesEquality(uRefInt, uniquesLiteral = Some((0 until 30).toSeq))
        .test(spark).outcome)
    assert(
      !UniquesEquality(uRefInt, uniquesLiteral = Some((0 until 29).toSeq))
        .test(spark).outcome)
    // filternullNever keeps the null element → no longer equal
    assert(
      !UniquesEquality(
        uRefInt,
        uniquesLiteral = Some((0 until 30).toSeq),
        filterFunc = filters.filternullNever).test(spark).outcome)
  }

  test("UniquesSubset weighting: row counts vs distinct values") {
    // values 0..29 each occur twice; declare 0..28 as allowed → value 29 (2 rows of 60)
    val allowed = (0 until 29).toSeq
    assert(
      UniquesSubset(uRefInt, uniquesLiteral = Some(allowed), maxRelativeViolations = 2.0 / 60)
        .test(spark).outcome)
    assert(
      !UniquesSubset(uRefInt, uniquesLiteral = Some(allowed), maxRelativeViolations = 1.9 / 60)
        .test(spark).outcome)
    assert(
      UniquesSubset(
        uRefInt, uniquesLiteral = Some(allowed), maxRelativeViolations = 1.0 / 30,
        compareDistinct = true).test(spark).outcome)
  }

  test("UniquesSuperset tolerance relative to target size") {
    val target = Seq(0, 1, 2, 77) // 77 missing → 1/4 lacking
    assert(
      UniquesSuperset(uRefInt, uniquesLiteral = Some(target), maxRelativeViolations = 0.25)
        .test(spark).outcome)
    assert(
      !UniquesSuperset(uRefInt, uniquesLiteral = Some(target), maxRelativeViolations = 0.24)
        .test(spark).outcome)
  }

  test("NUniquesEquality within and between") {
    // SELECT DISTINCT counts the NULL group as one value: 0..29 plus NULL = 31
    assert(NUniquesEquality(uRefInt, refValue = Some(31L)).test(spark).outcome)
    assert(!NUniquesEquality(uRefInt, refValue = Some(30L)).test(spark).outcome)
  }

  test("CategoricalBound per-category shares") {
    // col_varchar "hi0".."hi19" 3 rows each, "hi20" 2 rows(58,59), plus ("hi",1) and null
    val dist: Map[Any, (Double, Double)] =
      (0 to 20).map(i => (s"hi$i": Any) -> (0.0, 3.0 / 62)).toMap + (("hi": Any) -> (0.0, 1.0 / 62))
    assert(
      CategoricalBound(uRefVarchar, dist, maxRelativeViolations = 1.0 / 62)
        .test(spark).outcome) // the null category violates default bounds (0,0) with 1 row
    assert(!CategoricalBound(uRefVarchar, dist).test(spark).outcome)
  }

  // --- varchar -------------------------------------------------------------
  private lazy val varchar1 = mixDf(
    (1 to 9).map(i => (Integer.valueOf(i), "qq" * i, "2016-01-01")) :+
      (Integer.valueOf(10), null, "2016-01-01"))
  private def vRef = DataRef(FrameSource(varchar1, "varchar_table1"), Some(Seq("col_varchar")))

  test("VarCharMinLength / VarCharMaxLength ignore NULLs") {
    assert(VarCharMinLength(vRef, refValue = Some(Some(2L))).test(spark).outcome)
    assert(!VarCharMinLength(vRef, refValue = Some(Some(3L))).test(spark).outcome)
    assert(VarCharMaxLength(vRef, refValue = Some(Some(18L))).test(spark).outcome)
    assert(!VarCharMaxLength(vRef, refValue = Some(Some(17L))).test(spark).outcome)
  }

  test("VarCharRegex anchored client-side matching with allow_none") {
    assert(!VarCharRegex(vRef, "^q+$").test(spark).outcome) // null not allowed
    assert(VarCharRegex(vRef, "^q+$", allowNone = true).test(spark).outcome)
    assert(!VarCharRegex(vRef, "^qqq+$", allowNone = true).test(spark).outcome)
    // anchored semantics: pattern matching a suffix only should fail all values
    assert(
      VarCharRegex(vRef, "q", allowNone = true).test(spark).outcome) // prefix match ok
  }

  test("getRegexViolations(-1) bounds the collect and appends a loud sentinel") {
    import graft.ops.Ops
    val df = spark.range(50).selectExpr("concat('v', id) AS s")
    val r = DataRef(FrameSource(df, "regex_cap"), Some(Seq("s")))
    spark.conf.set(Ops.RegexCollectCapKey, "10")
    try {
      val (n, examples) = Ops.getRegexViolations(
        spark, r, aggregated = false, regex = "^nope$", nCounterexamples = -1)
      assert(n == 50)
      assert(examples.length == 11, "10 capped examples + 1 sentinel")
      assert(examples.last.contains("SHORTENED OUTPUT") &&
        examples.last.contains("10 / 50"))
      // under the cap: no sentinel, full list
      spark.conf.set(Ops.RegexCollectCapKey, "1000")
      val (n2, ex2) = Ops.getRegexViolations(
        spark, r, aggregated = false, regex = "^nope$", nCounterexamples = -1)
      assert(n2 == 50 && ex2.length == 50 &&
        !ex2.exists(_.contains("SHORTENED OUTPUT")))
    } finally spark.conf.unset(Ops.RegexCollectCapKey)
  }

  test("VarCharRegexDb unanchored search semantics + tolerance") {
    assert(VarCharRegexDb(vRef, "q+").test(spark).outcome)
    assert(!VarCharRegexDb(vRef, "^qqqq+$").test(spark).outcome)
    // 9 distinct values; "^qq$" matches only length-2 → 8/9 violations
    assert(VarCharRegexDb(vRef, "^qq$", relativeTolerance = 8.0 / 9).test(spark).outcome)
    assert(!VarCharRegexDb(vRef, "^qq$", relativeTolerance = 7.0 / 9).test(spark).outcome)
  }

  // --- column --------------------------------------------------------------
  private def mixRef = DataRef(FrameSource(unique1, "unique_table1"))

  test("ColumnExistence / Subset / Superset / Type") {
    assert(ColumnExistence(mixRef, Seq("col_int", "col_varchar")).test(spark).outcome)
    assert(!ColumnExistence(mixRef, Seq("no_such_col")).test(spark).outcome)
    assert(ColumnSubset(mixRef, mixRef).test(spark).outcome)
    assert(ColumnSuperset(mixRef, mixRef).test(spark).outcome)
    val intOnly = DataRef(FrameSource(unique1.select("col_int"), "int_only"))
    assert(ColumnSubset(intOnly, mixRef).test(spark).outcome)
    assert(!ColumnSubset(mixRef, intOnly).test(spark).outcome)
    assert(ColumnSuperset(mixRef, intOnly).test(spark).outcome)
    assert(
      ColumnType(uRefInt, expectedTypeString = Some("int")).test(spark).outcome)
    assert(
      !ColumnType(uRefInt, expectedTypeString = Some("string")).test(spark).outcome)
    assert(
      ColumnType(
        uRefInt,
        expectedType = Some(org.apache.spark.sql.types.IntegerType)).test(spark).outcome)
  }

  // --- miscs ---------------------------------------------------------------
  test("Uniqueness with relative and absolute tolerances") {
    // col_int: 62 rows (2 nulls), 31 distinct incl. null → duplicates galore
    assert(Uniqueness(uRefInt, maxDuplicateFraction = 0.5).test(spark).outcome)
    assert(!Uniqueness(uRefInt, maxDuplicateFraction = 0.4).test(spark).outcome)
    assert(Uniqueness(uRefInt, maxAbsoluteNDuplicates = 31).test(spark).outcome)
    assert(!Uniqueness(uRefInt, maxAbsoluteNDuplicates = 20).test(spark).outcome)
  }

  test("MaxNullFraction within and between") {
    // col_varchar: 1 null of 62
    assert(
      MaxNullFraction(uRefVarchar, refValue = Some(1.0 / 62)).test(spark).outcome)
    assert(
      !MaxNullFraction(uRefVarchar, refValue = Some(1.0 / 63)).test(spark).outcome)
    assert(
      MaxNullFraction(uRefVarchar, ref2 = Some(uRefVarchar)).test(spark).outcome)
  }

  test("FunctionalDependency: a→b holds, a↛c") {
    val fd = mixDf(Seq(
      (1, "b1", "2016-01-01"), (1, "b1", "2016-01-01"),
      (2, "b2", "2016-01-01"), (2, "b2", "2016-01-02"))
      .map { case (a, b, d) => (Integer.valueOf(a), b, d) })
    val okRef = DataRef(FrameSource(fd, "fd"), Some(Seq("col_int", "col_varchar")))
    assert(FunctionalDependency(okRef, Seq("col_int")).test(spark).outcome)
    val badRef = DataRef(FrameSource(fd, "fd"), Some(Seq("col_int", "col_date")))
    assert(!FunctionalDependency(badRef, Seq("col_int")).test(spark).outcome)
  }

  test("AggregateNumericRangeEquality: complete vs incomplete ranges") {
    val good = mixDf(
      Seq((1, null, null), (1, null, null), (2, null, null)).map {
        case (k, _, _) => (Integer.valueOf(k), null: String, null: String)
      })
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val ranged = good
      .withColumn("value", row_number().over(
        Window.partitionBy("col_int").orderBy(monotonically_increasing_id())) - lit(1))
      .select(col("col_int"), col("value"))
    val gRef = DataRef(FrameSource(ranged, "groupby_ok"), Some(Seq("col_int")))
    assert(AggregateNumericRangeEquality(gRef, "value").test(spark).outcome)
    val holey = ranged.where(!(col("col_int") === 1 && col("value") === 0))
    val hRef = DataRef(FrameSource(holey, "groupby_bad"), Some(Seq("col_int")))
    assert(!AggregateNumericRangeEquality(hRef, "value").test(spark).outcome)
    assert(AggregateNumericRangeEquality(hRef, "value", tolerance = 0.5).test(spark).outcome)
  }

  // --- dates ---------------------------------------------------------------
  private lazy val date1 = mixDf(
    (1 to 19).map(i => (Integer.valueOf(i), s"hi$i", f"2016-01-$i%02d")))
  private def dRef = DataRef(FrameSource(date1, "date_table1"), Some(Seq("col_date")))

  test("DateMin / DateMax directionality") {
    assert(DateMin(dRef, useLowerBoundReference = true,
      refValue = Some(Some(java.time.LocalDate.parse("2016-01-01")))).test(spark).outcome)
    assert(!DateMin(dRef, useLowerBoundReference = true,
      refValue = Some(Some(java.time.LocalDate.parse("2016-01-02")))).test(spark).outcome)
    assert(DateMin(dRef, useLowerBoundReference = false,
      refValue = Some(Some(java.time.LocalDate.parse("2016-01-02")))).test(spark).outcome)
    assert(DateMax(dRef, useUpperBoundReference = true,
      refValue = Some(Some(java.time.LocalDate.parse("2016-01-19")))).test(spark).outcome)
    assert(!DateMax(dRef, useUpperBoundReference = true,
      refValue = Some(Some(java.time.LocalDate.parse("2016-01-18")))).test(spark).outcome)
  }

  test("DateBetween fraction") {
    assert(DateBetween(dRef, 10.0 / 19, "'2016-01-10'", "'2016-01-19'").test(spark).outcome)
    assert(!DateBetween(dRef, 0.6, "'2016-01-10'", "'2016-01-19'").test(spark).outcome)
  }

  test("NUniquesApproxBetween: HLL count inside/outside widened bounds") {
    // 19 distinct ints; HLL++ at default rsd is deterministic for a fixed
    // input, and far inside a [10, 30] budget / far outside [100, 200]
    assert(NUniquesApproxBetween(ref1, 10, 30).test(spark).outcome)
    assert(!NUniquesApproxBetween(ref1, 100, 200).test(spark).outcome)
    val fail = NUniquesApproxBetween(ref1, 100, 200).test(spark)
    assert(fail.message.contains("approximately"))
  }

  test("NumericPercentileApprox: sketch median within deviation") {
    // values 1..19: any sane sketch median is ~10
    assert(NumericPercentileApprox(
      ref1, 50, refValue = Some(10.0),
      maxAbsoluteDeviation = Some(2.0)).test(spark).outcome)
    assert(!NumericPercentileApprox(
      ref1, 50, refValue = Some(100.0),
      maxAbsoluteDeviation = Some(2.0)).test(spark).outcome)
  }

  // --- requirements builder smoke ------------------------------------------
  test("WithinRequirement end-to-end (reference test_integration.py:69-73 shape)") {
    val req = WithinRequirement.fromDataFrame(int1, "int_table1")
    req.addNRowsEqualityConstraint(19)
    req.addNumericMinConstraint("col_int", 1.0)
    req.addNumericMaxConstraint("col_int", 19.0)
    val results = req.test(spark)
    assert(results.forall(_.outcome), results.map(_.message).mkString("\n"))
  }

  test("BetweenRequirement end-to-end with failure message") {
    val req = BetweenRequirement.fromDataFrames(int1, int2, "int_table1", "int_table2")
    req.addNRowsEqualityConstraint()
    val results = req.test(spark)
    assert(results.length == 1 && !results.head.outcome)
    assert(results.head.message.contains("int_table1"))
  }
}
