package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Condition
import graft.requirements.{BetweenRequirement, WithinRequirement}

/** Full builder-surface sweep (the reference's kwargs-compat test,
  * `tests/unit/test_requirement.py:7-31`, upgraded to actually EXECUTE):
  * every add-method of both requirement classes is invoked once and the
  * resulting constraint must run to a TestResult without throwing.
  */
class BuilderSurfaceSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val mix1 = mixDf(
    (1 to 19).map(i => (Integer.valueOf(i), s"hi$i", f"2016-01-$i%02d")))
  private lazy val mix2 = mixDf(
    (2 to 19).map(i => (Integer.valueOf(i), s"hi$i", f"2016-01-$i%02d")))

  test("every WithinRequirement builder runs to a TestResult") {
    import org.apache.spark.sql.functions.col
    // interval constraints need distinct start/end columns
    val mixW = mix1
      .withColumn("col_date2", org.apache.spark.sql.functions.date_add(col("col_date"), 1))
      .withColumn("col_int2", col("col_int") + 1)
      // embedding column for the semantic-dup constraint
      .withColumn("col_vec", org.apache.spark.sql.functions.array(
        col("col_int").cast("float"), org.apache.spark.sql.functions.lit(1f)))
    val r = WithinRequirement.fromDataFrame(mixW, "mix1")
    r.addColumnExistenceConstraint(Seq("col_int"))
    r.addUniquenessConstraint(Some(Seq("col_int")))
    r.addColumnTypeConstraint("col_int", "int")
    r.addColumnTypeConstraint("col_int", org.apache.spark.sql.types.IntegerType)
    r.addNullAbsenceConstraint("col_int")
    r.addMaxNullFractionConstraint("col_varchar", 0.5)
    r.addNRowsEqualityConstraint(19)
    r.addNRowsMinConstraint(1)
    r.addNRowsMaxConstraint(100)
    r.addUniquesEqualityConstraint(Seq("col_int"), (1 to 19).map(Integer.valueOf))
    r.addUniquesSupersetConstraint(Seq("col_int"), Seq(1, 2))
    r.addUniquesSubsetConstraint(Seq("col_int"), (0 to 20).map(Integer.valueOf))
    r.addNUniquesEqualityConstraint(Seq("col_int"), 19)
    r.addCategoricalBoundConstraint(
      Seq("col_varchar"), Map[Any, (Double, Double)]("hi1" -> (0.0, 1.0)),
      defaultBounds = (0.0, 1.0))
    r.addNumericMinConstraint("col_int", 1)
    r.addNumericMaxConstraint("col_int", 19)
    r.addNumericBetweenConstraint("col_int", 0.5, 5, 19)
    r.addNumericMeanConstraint("col_int", 10.0, 0.1)
    r.addNumericPercentileConstraint("col_int", 50, 10.0, maxAbsoluteDeviation = Some(1.0))
    r.addDateMinConstraint("col_date", "'2016-01-01'")
    r.addDateMaxConstraint("col_date", "'2016-01-19'")
    r.addDateBetweenConstraint("col_date", 0.5, "'2016-01-01'", "'2016-01-19'")
    r.addDateNoOverlapConstraint("col_date", "col_date2", Seq("col_int"),
      maxRelativeNViolations = 1.0)
    r.addDateNoOverlap2dConstraint("col_date", "col_date2", "col_int", "col_int2",
      Seq("col_varchar"), maxRelativeNViolations = 1.0)
    r.addDateNoGapConstraint("col_date", "col_date2", Seq("col_int"),
      maxRelativeNViolations = 1.0)
    r.addFunctionalDependencyConstraint(Seq("col_int"), Seq("col_varchar"))
    r.addNumericNoGapConstraint("col_int", "col_int2", Seq("col_varchar"),
      maxRelativeNViolations = 1.0)
    r.addNumericNoOverlapConstraint("col_int", "col_int2", Seq("col_varchar"),
      maxRelativeNViolations = 1.0)
    r.addVarcharRegexConstraint("col_varchar", "^hi")
    r.addVarcharRegexConstraintDb("col_varchar", "^hi")
    r.addVarcharMinLengthConstraint("col_varchar", 1)
    r.addVarcharMaxLengthConstraint("col_varchar", 10)
    r.addGroupbyAggregationConstraint(Seq("col_varchar"), "col_int", tolerance = 1.0)
    r.addMaxNearDupFractionConstraint("col_varchar", maxFraction = 1.0)
    r.addMaxDupSpanFractionConstraint("col_varchar", maxFraction = 1.0,
      windowTokens = 2)
    r.addMaxSemanticDupFractionConstraint("col_vec", maxFraction = 1.0,
      cosineThreshold = 0.99, nClusters = 4, lloydIters = 1)
    r.addApproxNUniquesBetweenConstraint(Seq("col_int"), 1, 100)
    r.addApproxNumericPercentileConstraint("col_int", 50, 10.0,
      maxAbsoluteDeviation = Some(2.0))
    val results = r.test(spark)
    assert(results.length == 38)
    assert(results.forall(_.constraintDescription.nonEmpty))
  }

  test("every BetweenRequirement builder runs to a TestResult") {
    val r = BetweenRequirement.fromDataFrames(
      mix1, mix2, "mix1", "mix2",
      dateColumn = Some("col_date"), dateColumn2 = Some("col_date"))
    r.addNRowsEqualityConstraint()
    r.addNRowsMaxGainConstraint(constantMaxRelativeGain = Some(1.0))
    r.addNRowsMinGainConstraint(constantMinRelativeGain = Some(0.0))
    r.addNRowsMaxLossConstraint(dateRangeLossDeviation = Some(1.0))
    r.addNUniquesEqualityConstraint(Seq("col_int"), Seq("col_int"))
    r.addNUniquesMaxGainConstraint(Seq("col_int"), Seq("col_int"),
      constantMaxRelativeGain = Some(1.0))
    r.addNUniquesMaxLossConstraint(Seq("col_int"), Seq("col_int"),
      constantMaxRelativeLoss = Some(1.0))
    r.addMaxNullFractionConstraint("col_int", "col_int")
    r.addNumericMinConstraint("col_int", "col_int")
    r.addNumericMaxConstraint("col_int", "col_int")
    r.addUniquesEqualityConstraint(Seq("col_int"), Seq("col_int"))
    r.addUniquesSupersetConstraint(Seq("col_int"), Seq("col_int"))
    r.addUniquesSubsetConstraint(Seq("col_int"), Seq("col_int"),
      maxRelativeViolations = 1.0)
    r.addNumericMeanConstraint("col_int", "col_int", maxAbsoluteDeviation = 1.0)
    r.addNumericPercentileConstraint("col_int", "col_int", 50,
      maxAbsoluteDeviation = Some(2.0))
    r.addDateMinConstraint("col_date", "col_date", useLowerBoundReference = false)
    r.addDateMaxConstraint("col_date", "col_date")
    r.addVarcharMinLengthConstraint("col_varchar", "col_varchar")
    r.addVarcharMaxLengthConstraint("col_varchar", "col_varchar")
    r.addColumnSubsetConstraint()
    r.addColumnSupersetConstraint()
    r.addColumnTypeConstraint("col_int", "col_int")
    r.addRowEqualityConstraint(Some(Seq("col_int")), Some(Seq("col_int")), 1.0)
    r.addRowSubsetConstraint(Some(Seq("col_int")), Some(Seq("col_int")), Some(1.0))
    r.addRowSupersetConstraint(Some(Seq("col_int")), Some(Seq("col_int")), Some(1.0))
    r.addRowMatchingEqualityConstraint(
      Seq("col_int"), Seq("col_int"), Seq("col_varchar"), Seq("col_varchar"), 1.0)
    r.addKs2SampleConstraint("col_int", "col_int")
    r.addMaxCrossNearDupFractionConstraint("col_varchar", "col_varchar",
      maxFraction = 1.0, jaccardThreshold = 0.6)
    val results = r.test(spark)
    assert(results.length == 28)
  }

  test("file sources: csv/json readers feed the same constraint machinery") {
    val dir = java.nio.file.Files.createTempDirectory("graft-filesrc").toFile
    dir.deleteOnExit()
    val csv = new java.io.File(dir, "t.csv")
    val json = new java.io.File(dir, "t.json")
    val w1 = new java.io.PrintWriter(csv)
    w1.println("id,label"); (1 to 9).foreach(i => w1.println(s"$i,row$i")); w1.close()
    val w2 = new java.io.PrintWriter(json)
    (1 to 9).foreach(i => w2.println(s"""{"id":$i,"label":"row$i"}"""))
    w2.close()

    // explicit schema keeps csv/json planning metadata-only (the 100 TB path)
    val within = WithinRequirement.fromCsv(
      csv.getAbsolutePath,
      options = Map("header" -> "true"),
      schemaDdl = Some("id INT, label STRING"))
    within.addNRowsEqualityConstraint(9)
    within.addUniquenessConstraint(Some(Seq("id")))
    assert(within.test(spark).forall(_.outcome))

    // cross-format: staged csv vs published json, same rows
    val between = BetweenRequirement.fromFiles(
      csv.getAbsolutePath, "csv",
      json.getAbsolutePath, "json",
      options1 = Map("header" -> "true"),
      schemaDdl1 = Some("id INT, label STRING"),
      schemaDdl2 = Some("id INT, label STRING"))
    between.addNRowsEqualityConstraint()
    between.addRowEqualityConstraint(
      Some(Seq("id", "label")), Some(Seq("id", "label")), 0.0)
    assert(between.test(spark).forall(_.outcome))
  }

  test("conditions thread through both requirement flavors") {
    val w = WithinRequirement.fromDataFrame(mix1, "mix1")
    w.addNRowsEqualityConstraint(9, condition = Some(Condition.raw("col_int > 10")))
    assert(w.test(spark).head.outcome)
    val b = BetweenRequirement.fromDataFrames(mix1, mix2, "mix1", "mix2")
    b.addNRowsEqualityConstraint(
      condition1 = Some(Condition.raw("col_int > 1")),
      condition2 = None)
    assert(b.test(spark).head.outcome)
  }
}
