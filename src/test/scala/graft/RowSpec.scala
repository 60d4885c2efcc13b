package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{DataRef, FrameSource}
import graft.constraints.{RowEquality, RowMatchingEquality, RowSubset, RowSuperset}

/** Row set-operation constraints over mix_table1/mix_table2-shaped fixtures
  * (reference `conftest.py:141-180`, `test_integration.py` row sections).
  */
class RowSpec extends AnyFunSuite {
  import TestSpark._

  // mix_table1: i, "hi{i}", 2016-01-i for 1..19
  private lazy val mix1 = mixDf(
    (1 to 19).map(i => (Integer.valueOf(i), s"hi$i", f"2016-01-$i%02d")))
  // mix_table2: 2..19 with one "ho" outlier at i=19
  private lazy val mix2 = mixDf(
    (2 to 18).map(i => (Integer.valueOf(i), s"hi$i", f"2016-01-$i%02d")) :+
      (Integer.valueOf(19), "ho19", "2016-01-19"))

  private val cols = Seq("col_int", "col_varchar")
  private def r1 = DataRef(FrameSource(mix1, "mix_table1"), Some(cols))
  private def r2 = DataRef(FrameSource(mix2, "mix_table2"), Some(cols))

  test("RowEquality: symmetric difference over union") {
    // T1∖T2 = {1, hi19} (2 rows), T2∖T1 = {ho19} (1 row), union = 20 → 3/20
    assert(RowEquality(r1, r2, _ => 3.0 / 20).test(spark).outcome)
    assert(!RowEquality(r1, r2, _ => 2.9 / 20).test(spark).outcome)
    assert(RowEquality(r1, r1, _ => 0.0).test(spark).outcome)
  }

  test("RowSubset: |T1∖T2| / |T1|") {
    // 2 of 19 rows of T1 missing from T2
    assert(RowSubset(r1, r2, _ => 2.0 / 19).test(spark).outcome)
    assert(!RowSubset(r1, r2, _ => 1.9 / 19).test(spark).outcome)
    // T2 ⊂ T1 except the ho-outlier: 1/18
    assert(RowSubset(r2, r1, _ => 1.0 / 18).test(spark).outcome)
    assert(!RowSubset(r2, r1, _ => 0.9 / 18).test(spark).outcome)
  }

  test("RowSuperset: |T2∖T1| / |T2|") {
    assert(RowSuperset(r1, r2, _ => 1.0 / 18).test(spark).outcome)
    assert(!RowSuperset(r1, r2, _ => 0.9 / 18).test(spark).outcome)
    assert(RowSuperset(r1, r1, _ => 0.0).test(spark).outcome)
  }

  test("RowSubset set semantics: duplicates in T1 count once (EXCEPT DISTINCT)") {
    val dup = mix1.union(mix1)
    val rd  = DataRef(FrameSource(dup, "mix_table1_dup"), Some(cols))
    assert(RowSubset(rd, r1, _ => 0.0).test(spark).outcome)
  }

  test("RowMatchingEquality: null-safe comparison after match join") {
    // match on col_int, compare col_varchar; mix2 differs at key 19 only.
    // join keys 2..19 → 18 matched rows, 1 mismatch
    assert(
      RowMatchingEquality(
        r1, r2, Seq("col_int"), Seq("col_int"), Seq("col_varchar"), Seq("col_varchar"),
        _ => 1.0 / 18).test(spark).outcome)
    assert(
      !RowMatchingEquality(
        r1, r2, Seq("col_int"), Seq("col_int"), Seq("col_varchar"), Seq("col_varchar"),
        _ => 0.9 / 18).test(spark).outcome)
    // NULL <=> NULL counts as equal (reference row_match_table fixtures)
    val withNull1 = mixDf(Seq((Integer.valueOf(1), null, "2016-01-01")))
    val withNull2 = mixDf(Seq((Integer.valueOf(1), null, "2016-01-01")))
    assert(
      RowMatchingEquality(
        DataRef(FrameSource(withNull1, "n1"), Some(cols)),
        DataRef(FrameSource(withNull2, "n2"), Some(cols)),
        Seq("col_int"), Seq("col_int"), Seq("col_varchar"), Seq("col_varchar"),
        _ => 0.0).test(spark).outcome)
  }
}
