package graft.runner

import org.apache.spark.sql.SparkSession

import graft.core.TestResult
import graft.requirements.Requirement

/** Plain test runner (the engine-side analogue of the reference's pytest
  * integration, `src/datajudge/pytest_integration.py:35-56`): flattens
  * requirements to (testId, thunk) pairs; `runAll` executes them and returns
  * results; `main`-style exit code = number of failures.
  *
  * ScalaTest users instead generate one registered test per constraint:
  * {{{
  * class MySpec extends AnyFunSuite {
  *   Runner.collectDataTests(requirements).foreach { case (id, thunk) =>
  *     test(id) { val r = thunk(spark); assert(r.outcome, r.message) }
  *   }
  * }
  * }}}
  */
object Runner {

  def collectDataTests(
      requirements: Seq[Requirement]): Seq[(String, SparkSession => TestResult)] =
    requirements.flatMap(_.constraints).map(c => c.description -> ((s: SparkSession) => c.test(s)))

  def runAll(spark: SparkSession, requirements: Seq[Requirement]): Seq[TestResult] =
    requirements.flatMap(_.test(spark))

  /** Run everything, print per-constraint outcomes, return #failures. */
  def runAndReport(
      spark: SparkSession,
      requirements: Seq[Requirement],
      formatter: graft.core.Formatter = graft.core.PlainFormatter): Int = {
    val results = runAll(spark, requirements)
    results.foreach(r => println(formatter.fmt(r.message)))
    val failures = results.count(!_.outcome)
    println(s"${results.size - failures}/${results.size} constraints passed.")
    failures
  }
}
