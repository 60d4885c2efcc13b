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
}
