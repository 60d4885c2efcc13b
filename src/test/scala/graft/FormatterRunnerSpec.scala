package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{AnsiFormatter, Formatter, PlainFormatter}
import graft.constraints.formatting
import graft.requirements.BetweenRequirement
import graft.runner.Runner

/** Formatter, output-processor, tolerance-getter and runner tests
  * (reference `tests/unit/test_formatter.py`, `test_utils.py`,
  * `requirements.py:1368-1394`, `pytest_integration.py`).
  */
class FormatterRunnerSpec extends AnyFunSuite {
  import TestSpark._

  test("formatDifference highlights the differing suffix (reference examples)") {
    // thousands separators shift the first difference, exactly as the
    // reference's f"{n:,}" rendering does
    assert(Formatter.formatDifference(123L, 1234L) ==
      ("1[numDiff]23[/numDiff]", "1[numDiff],234[/numDiff]"))
    val (a, b) = Formatter.formatDifference(122593859432L, 122593859432347L)
    assert(a == "122,593,859,432")
    assert(b == "122,593,859,432[numDiff],347[/numDiff]")
  }

  test("plain formatter strips tags; ANSI formatter colors them") {
    val msg = "has 1[numDiff]9[/numDiff] rows"
    assert(PlainFormatter.fmt(msg) == "has 19 rows")
    val ansi = AnsiFormatter.fmt(msg)
    assert(ansi.contains(Console.RED) && ansi.contains(Console.RESET))
  }

  test("output-processor sort orders by count desc, then value") {
    val (vs, cs) = formatting.sortedByCount(Seq("b", "a", "c"), Seq(1L, 5L, 5L))
    assert(vs == Seq("a", "c", "b"))
    assert(cs == Seq(5L, 5L, 1L))
  }

  test("output limiting truncates with the reference's marker") {
    val s = formatting.limited(1 to 150, limit = 100)
    assert(s.contains("<SHORTENED OUTPUT, displaying the first 100 / 150 elements above>"))
    assert(formatting.limited(Seq(1, 2, 3)) == "1, 2, 3")
  }

  test("date-growth tolerance getter: max(fixValue, growth + deviation)") {
    // mix-style frames with date columns spanning 10 vs 5 days
    val d1 = mixDf((1 to 11).map(i => (Integer.valueOf(i), "x", f"2016-01-$i%02d")))
    val d2 = mixDf((1 to 6).map(i => (Integer.valueOf(i), "x", f"2016-01-$i%02d")))
    val req = BetweenRequirement.fromDataFrames(
      d1, d2, "t1", "t2", dateColumn = Some("col_date"), dateColumn2 = Some("col_date"))
    // span1/span2 - 1 = 10/5 - 1 = 1.0
    assert(math.abs(req.dateGrowthRate(spark) - 1.0) < 1e-12)
    // n1=11, n2=6: gain = 5/6 ≈ 0.83 <= growth(1.0) + 0.0 → passes
    req.addNRowsMaxGainConstraint(dateRangeGainDeviation = Some(0.0))
    assert(req.test(spark).forall(_.outcome))
    // constant tolerance lower than the gain → fails
    val req2 = BetweenRequirement.fromDataFrames(d1, d2, "t1", "t2")
    req2.addNRowsMaxGainConstraint(constantMaxRelativeGain = Some(0.5))
    assert(!req2.test(spark).head.outcome)
  }

  test("failing constraint carries its compiled retrieval plans (reference base.py:256-293)") {
    // a within constraint: the factual plan must appear in the message
    val d1 = mixDf((1 to 7).map(i => (Integer.valueOf(i), s"v$i", null)))
    val within = graft.constraints.NRowsEquality(
      graft.core.DataRef(graft.core.FrameSource(d1, "plan_t"),
        condition = Some(graft.core.Condition.raw("col_int > 2"))),
      refValue = Some(99L))
    val res = within.test(spark)
    assert(!res.outcome)
    assert(res.factualQueries.nonEmpty, "factual plan missing")
    assert(res.factualQueries.head.contains("col_int"), res.factualQueries.head)
    assert(res.message.contains("Factual plan(s):"), res.message)

    // a between constraint: both sides' plans attach
    val d2 = mixDf((1 to 3).map(i => (Integer.valueOf(i), s"v$i", null)))
    val between = graft.constraints.NRowsEquality(
      graft.core.DataRef(graft.core.FrameSource(d1, "plan_t1")),
      ref2 = Some(graft.core.DataRef(graft.core.FrameSource(d2, "plan_t2"))))
    val res2 = between.test(spark)
    assert(!res2.outcome)
    assert(res2.factualQueries.nonEmpty && res2.targetQueries.nonEmpty)
    assert(res2.message.contains("Target plan(s):"), res2.message)

    // a custom-test constraint (interval family) captures via withPlans
    val iv = intervalDf(Seq(
      (Integer.valueOf(1), "2016-01-01", "2016-01-05"),
      (Integer.valueOf(1), "2016-01-10", "2016-01-20")))
    val gap = graft.constraints.NoGap(
      graft.core.DataRef(graft.core.FrameSource(iv, "plan_gap")),
      Seq("id1"), "date_start", "date_end",
      maxRelativeNViolations = 0.0, legitimateGapSize = 1.0, isDate = true)
    val res3 = gap.test(spark)
    assert(!res3.outcome)
    assert(res3.factualQueries.nonEmpty, "interval constraint should attach plans")

    // memoized second call still renders the plans
    val res4 = within.test(spark)
    assert(res4.factualQueries.nonEmpty)
  }

  test("collectDataTests flattens requirements to (id, thunk) pairs") {
    val d1 = intDf("t", (1 to 5).map(Integer.valueOf))
    val req = graft.requirements.WithinRequirement.fromDataFrame(d1, "t")
    req.addNRowsEqualityConstraint(5)
    req.addNRowsMaxConstraint(4)
    val tests = Runner.collectDataTests(Seq(req))
    assert(tests.length == 2)
    assert(tests.head._1.startsWith("NRowsEquality::"))
    val results = tests.map(_._2(spark))
    assert(results.map(_.outcome) == Seq(true, false))
  }

  test("writeJunitXml emits valid XML with per-constraint cases and escapes") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("x")
    val req = graft.requirements.WithinRequirement.fromDataFrame(df, "t<&>")
    req.addNRowsEqualityConstraint(3)
    req.addNRowsMaxConstraint(1) // fails: message carries numbers + markup
    val results = Runner.runAll(spark, Seq(req))
    val path = java.nio.file.Files.createTempFile("graft_junit", ".xml")
    Runner.writeJunitXml(results, path.toString, suiteName = "graft-suite")
    // parse with the JDK's XML parser: structural validity is the test
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder().parse(path.toFile)
    val suite = doc.getDocumentElement
    assert(suite.getTagName === "testsuite")
    assert(suite.getAttribute("tests") === "2")
    assert(suite.getAttribute("failures") === "1")
    val cases = doc.getElementsByTagName("testcase")
    assert(cases.getLength === 2)
    val failures = doc.getElementsByTagName("failure")
    assert(failures.getLength === 1)
    assert(failures.item(0).getTextContent.contains("FAIL"))
  }

  test("resultsToDf round-trips outcomes as data") {
    import spark.implicits._
    val df = Seq(1, 2).toDF("x")
    val req = graft.requirements.WithinRequirement.fromDataFrame(df, "t")
    req.addNRowsEqualityConstraint(2)
    req.addNRowsMinConstraint(5)
    val out = Runner.resultsToDf(spark, Runner.runAll(spark, Seq(req)))
    assert(out.count() === 2L)
    val rows = out.orderBy("constraint").collect()
    assert(rows.map(_.getBoolean(1)).toSeq.sorted === Seq(false, true))
    assert(rows.exists(r => !r.getBoolean(1) && r.getString(2) != null))
  }
}
