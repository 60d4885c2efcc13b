package graft.core

/** Outcome of testing one constraint. Mirrors the reference's `TestResult`
  * (datajudge `src/datajudge/constraints/base.py:33-101`): outcome + failure
  * message + constraint description + the "compiled queries" (here: Catalyst
  * plan strings instead of dialect SQL).
  */
final case class TestResult(
    outcome: Boolean,
    failureMessage: Option[String],
    constraintDescription: String,
    factualQueries: Seq[String] = Seq.empty,
    targetQueries: Seq[String] = Seq.empty) {

  /** Formatted message, as the pytest integration would print it. */
  def message: String =
    if (outcome) s"PASS: $constraintDescription"
    else {
      val fq =
        if (factualQueries.isEmpty) ""
        else factualQueries.mkString("\nFactual plan(s):\n", "\n---\n", "")
      val tq =
        if (targetQueries.isEmpty) ""
        else targetQueries.mkString("\nTarget plan(s):\n", "\n---\n", "")
      s"FAIL: $constraintDescription\n${failureMessage.getOrElse("")}$fq$tq"
    }
}

object TestResult {
  def success(description: String): TestResult =
    TestResult(outcome = true, None, description)

  def failure(
      description: String,
      msg: String,
      factualQueries: Seq[String] = Seq.empty,
      targetQueries: Seq[String] = Seq.empty): TestResult =
    TestResult(outcome = false, Some(msg), description, factualQueries, targetQueries)
}
