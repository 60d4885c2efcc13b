package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the SIZE of the driver's correctness gate.
  *
  * Round 6 lesson: a gate query that throws is skipped by Verify, so the
  * correctness artifact simply has fewer rows — `q_events_profile` broke
  * with an environment change and the gate silently shrank from 71 to 70
  * with every remaining row green. These literals make that impossible to
  * miss: adding a query means updating the count HERE (that's the point —
  * a deliberate, reviewed change), and losing one turns the suite red.
  */
class GateSpec extends AnyFunSuite {

  // r12: +q_compacted_dedup (index lifecycle under the exact oracle),
  // +q_indexed_auto (persisted annTopKAuto tiers self-check)
  // r13: +q_rebanded_dedup (generation-safe re-band rebuild under the
  // all-pairs oracle), +q_rebuilt_ann (quantizer-refit rebuild under the
  // exhaustive-probe brute-force oracle)
  private val ExpectedGateSize = 178

  test("queries and oracleSql cover exactly the pinned gate") {
    assert(SparkEntry.queries.size === ExpectedGateSize,
      s"SparkEntry.queries shrank or grew — update ExpectedGateSize deliberately. " +
        s"Got ${SparkEntry.queries.size}")
    assert(SparkEntry.oracleSql.size === ExpectedGateSize,
      s"SparkEntry.oracleSql shrank or grew — update ExpectedGateSize deliberately. " +
        s"Got ${SparkEntry.oracleSql.size}")
  }

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).mkString(", ")}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).mkString(", ")}")
  }

  test("every gate query builds a plan against sf0.001 without throwing") {
    // analysis-time regressions (schema drift, dtype mismatches like the
    // round-6 ts/1000 failure) surface here without executing anything
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try { fn(spark, dir).queryExecution.analyzed; None }
      catch { case e: Throwable => Some(s"$name: ${e.toString.take(200)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
