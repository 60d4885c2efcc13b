package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Condition

/** Condition-algebra tests (reference `tests/unit/test_condition.py:6-75`). */
class ConditionSpec extends AnyFunSuite {

  test("atomic condition renders its raw string") {
    assert(Condition.raw("col_int > 10").render == "col_int > 10")
  }

  test("composite AND/OR render parenthesized") {
    val a = Condition.raw("a > 1")
    val b = Condition.raw("b < 2")
    assert(Condition.and(a, b).render == "(a > 1) AND (b < 2)")
    assert(Condition.or(a, b).render == "(a > 1) OR (b < 2)")
  }

  test("nesting renders recursively") {
    val a = Condition.raw("a > 1")
    val b = Condition.raw("b < 2")
    val c = Condition.raw("c = 3")
    assert(
      Condition.or(Condition.and(a, b), c).render ==
        "((a > 1) AND (b < 2)) OR (c = 3)")
  }

  test("merge AND-combines optional conditions (db_access.py:212-221)") {
    val a = Condition.raw("a > 1")
    val b = Condition.raw("b < 2")
    assert(Condition.merge(Some(a), Some(b)).get.render == "(a > 1) AND (b < 2)")
    assert(Condition.merge(Some(a), None).contains(a))
    assert(Condition.merge(None, Some(b)).contains(b))
    assert(Condition.merge(None, None).isEmpty)
  }

  test("empty raw condition is rejected") {
    assertThrows[IllegalArgumentException](Condition.raw("  "))
  }

  test("invalid reduction operator is rejected") {
    assertThrows[IllegalArgumentException](
      Condition.Composite("XOR", Seq(Condition.raw("a"))))
  }
}
