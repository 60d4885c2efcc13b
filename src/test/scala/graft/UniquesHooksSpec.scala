package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{DataRef, FrameSource}
import graft.constraints.{filters, UniquesEquality, UniquesSubset, UniquesSuperset, VarCharRegex}

/** Client-side post-processing hooks and null policies on Uniques
  * (reference `uniques.py:112-165`, `utils.py:125-148`, nested_table
  * scenario `conftest.py:820-833`) and row-weighted regex tolerance
  * (`varchar.py:89-156`).
  */
class UniquesHooksSpec extends AnyFunSuite {
  import TestSpark._

  test("mapFunc/reduceFunc decompose nested varchar values (nested_table)") {
    // "ABC#1,DEF#2," style values → reduce to the set of '#'-separated parts
    val df = mixDf(Seq(
      (Integer.valueOf(1), "ABC#1,", null),
      (Integer.valueOf(2), "ABC#1,DEF#2,", null),
      (Integer.valueOf(3), "GHI#3,JKL#4,", null)))
    val ref = DataRef(FrameSource(df, "nested_table"), Some(Seq("col_varchar")))
    val decompose: Seq[Any] => Seq[Any] =
      values => values.flatMap(v => String.valueOf(v).split(",").filter(_.nonEmpty)).distinct
    val c = UniquesEquality(
      ref,
      uniquesLiteral = Some(Seq("ABC#1", "DEF#2", "GHI#3", "JKL#4")),
      reduceFunc = Some(decompose))
    assert(c.test(spark).outcome)
    val miss = UniquesEquality(
      ref,
      uniquesLiteral = Some(Seq("ABC#1", "DEF#2")),
      reduceFunc = Some(decompose))
    assert(!miss.test(spark).outcome)
  }

  test("mapFunc applies per value before comparison") {
    val df  = mixDf(Seq((Integer.valueOf(1), "Hi", null), (Integer.valueOf(2), "HO", null)))
    val ref = DataRef(FrameSource(df, "t"), Some(Seq("col_varchar")))
    val c = UniquesEquality(
      ref,
      uniquesLiteral = Some(Seq("hi", "ho")),
      mapFunc = Some(v => String.valueOf(v).toLowerCase))
    assert(c.test(spark).outcome)
  }

  test("tuple null policies: all-null vs any-null filtering") {
    val df = mixDf(Seq(
      (Integer.valueOf(1), "a", null),
      (null, null, null),          // all-null tuple
      (Integer.valueOf(2), null, null))) // partially-null tuple
    val ref = DataRef(FrameSource(df, "t"), Some(Seq("col_int", "col_varchar")))
    // tupleAll drops only the fully-null tuple → 2 values remain
    val all = UniquesSubset(
      ref,
      uniquesLiteral = Some(Seq(Seq(1, "a"), Seq(2, null))),
      filterFunc = filters.filternullElementOrTupleAll)
    assert(all.test(spark).outcome)
    // tupleAny also drops the partially-null tuple → only (1, a) remains
    val any = UniquesSubset(
      ref,
      uniquesLiteral = Some(Seq(Seq(1, "a"))),
      filterFunc = filters.filternullElementOrTupleAny)
    assert(any.test(spark).outcome)
    val anyStrict = UniquesSubset(
      ref,
      uniquesLiteral = Some(Seq(Seq(1, "a"))),
      filterFunc = filters.filternullElementOrTupleAll)
    assert(!anyStrict.test(spark).outcome) // (2, null) not in the allowed set
  }

  test("high-cardinality column: literal comparison runs in-engine, client path aborts bounded") {
    import graft.constraints.Uniques
    // 100k distinct values, driver collect capped at 500
    val wide = spark.range(100000).toDF("col_long")
    val ref  = DataRef(FrameSource(wide, "wide_t"), Some(Seq("col_long")))
    spark.conf.set(Uniques.CollectCapKey, "500")
    try {
      // literal target + standard hooks → engine path: correct outcome, the
      // driver never sees more than outputLimit rows
      assert(
        UniquesSuperset(ref, uniquesLiteral = Some(Seq(1L, 2L, 3L))).test(spark).outcome)
      assert(
        !UniquesEquality(ref, uniquesLiteral = Some(Seq(1L, 2L, 3L))).test(spark).outcome)
      // a user mapFunc forces the client path → capped collect aborts into a
      // loud failure with the truncation sentinel instead of a driver OOM
      val res = UniquesSuperset(
        ref,
        uniquesLiteral = Some(Seq(1L, 2L, 3L)),
        mapFunc = Some(identity[Any])).test(spark)
      assert(!res.outcome)
      val msg = res.failureMessage.get
      assert(msg.contains("more than 500 distinct values"), msg)
      assert(msg.contains("<SHORTENED OUTPUT"), msg)
      assert(msg.contains(Uniques.CollectCapKey), msg)
    } finally spark.conf.unset(Uniques.CollectCapKey)
  }

  test("literal edge cases: fractional literals stay strict, null literals don't crash") {
    val wide = spark.range(10).toDF("col_long")
    val ref  = DataRef(FrameSource(wide, "strict_t"), Some(Seq("col_long")))
    // 1.5 can't exist in a LONG column — not engine-representable, so the
    // constraint keeps the strict client path and reports it lacking (the
    // reference's Python comparison: 1.5 != 1)
    assert(!UniquesSuperset(ref, uniquesLiteral = Some(Seq(1.5))).test(spark).outcome)
    // exact-valued numeric literals widen losslessly onto the column type
    assert(UniquesSuperset(ref, uniquesLiteral = Some(Seq(1, 2))).test(spark).outcome)
    // a null literal against a non-nullable source column must produce a
    // test result (null is lacking), not a createDataFrame crash; and the
    // null policy must NOT filter the user's literal list
    assert(!UniquesSuperset(ref, uniquesLiteral = Some(Seq(5L, null))).test(spark).outcome)
    // Long.MaxValue is NOT exactly representable as a double: the coercion
    // gate rejects it and the constraint takes the client path — where
    // Scala's cooperative numeric equality promotes Long to Double, so the
    // (rounded) column value compares equal and the superset holds. The
    // invariant pinned here is path CONSISTENCY: the gate must not let the
    // engine path decide differently from the client path
    val dbl  = spark.range(1).selectExpr("cast(9223372036854775807 as double) as col_d")
    val refD = DataRef(FrameSource(dbl, "dbl_t"), Some(Seq("col_d")))
    assert(UniquesSuperset(refD, uniquesLiteral = Some(Seq(Long.MaxValue))).test(spark).outcome)
  }

  test("pluggable output processors: limit appends the reference's sentinel") {
    import graft.constraints.formatting
    val df = mixDf((1 to 30).map(i => (Integer.valueOf(i), s"v$i", null)))
    val ref = DataRef(FrameSource(df, "proc_table"), Some(Seq("col_varchar")))
    val c = UniquesSubset(
      ref,
      uniquesLiteral = Some(Seq("v1")), // 29 excess values
      outputProcessors = Some(Seq(formatting.processorLimit(5))))
    val res = c.test(spark)
    assert(!res.outcome)
    val msg = res.failureMessage.get
    assert(msg.contains("<SHORTENED OUTPUT, displaying the first 5 / 29 elements above>"), msg)
    assert(msg.contains("<SHORTENED OUTPUT, displaying the first 5 / 29 counts above>"), msg)
  }

  test("pluggable output processors: sort orders excess by count desc, ties by value") {
    import graft.constraints.formatting
    val df = mixDf(Seq(
      (Integer.valueOf(1), "rare", null),
      (Integer.valueOf(2), "mid", null), (Integer.valueOf(3), "mid", null),
      (Integer.valueOf(4), "hot", null), (Integer.valueOf(5), "hot", null),
      (Integer.valueOf(6), "hot", null)))
    val ref = DataRef(FrameSource(df, "proc_sort_table"), Some(Seq("col_varchar")))
    val c = UniquesSubset(
      ref,
      uniquesLiteral = Some(Seq("nope")),
      outputProcessors = Some(Seq(formatting.processorSort)))
    val res = c.test(spark)
    assert(!res.outcome)
    val msg = res.failureMessage.get
    assert(msg.contains("'hot, mid, rare' with counts 3, 2, 1"), msg)
  }

  test("between-source uniques run in-engine and agree with the client path") {
    // factual has v1..v6 (v6 twice), target has v1..v5 → one excess value,
    // 2/8 violating rows, 1/6 violating distincts
    val f = mixDf(Seq(
      (Integer.valueOf(1), "v1", null), (Integer.valueOf(2), "v2", null),
      (Integer.valueOf(3), "v3", null), (Integer.valueOf(4), "v4", null),
      (Integer.valueOf(5), "v5", null), (Integer.valueOf(6), "v6", null),
      (Integer.valueOf(7), "v6", null), (Integer.valueOf(8), "v5", null)))
    val t = mixDf((1 to 5).map(i => (Integer.valueOf(i), s"v$i", null)))
    val rf = DataRef(FrameSource(f, "eng_f"), Some(Seq("col_varchar")))
    val rt = DataRef(FrameSource(t, "eng_t"), Some(Seq("col_varchar")))

    // engine-eligible (default hooks): row-weighted 2/8
    val engine = UniquesSubset(rf, ref2 = Some(rt), maxRelativeViolations = 0.2)
    val engRes = engine.test(spark)
    assert(!engRes.outcome)
    assert(engRes.failureMessage.get.contains("0.25 > 0.2"), engRes.failureMessage.get)
    assert(engRes.failureMessage.get.contains("(2 / 8)"), engRes.failureMessage.get)
    assert(engRes.failureMessage.get.contains("'v6' with counts 2"), engRes.failureMessage.get)
    assert(UniquesSubset(rf, ref2 = Some(rt), maxRelativeViolations = 0.25)
      .test(spark).outcome)

    // distinct-weighted 1/6
    val engD = UniquesSubset(rf, ref2 = Some(rt), compareDistinct = true,
      maxRelativeViolations = 0.1)
    assert(!engD.test(spark).outcome)
    assert(engD.test(spark).failureMessage.get.contains("(1 / 6)"))

    // a client-forcing hook (mapFunc) must agree on the outcome
    val client = UniquesSubset(rf, ref2 = Some(rt), maxRelativeViolations = 0.2,
      mapFunc = Some(identity[Any]))
    assert(!client.test(spark).outcome)

    // equality + superset engine paths
    val eq = UniquesEquality(rf, ref2 = Some(rt))
    val eqRes = eq.test(spark)
    assert(!eqRes.outcome)
    assert(eqRes.failureMessage.get.contains("excess element(s) 'v6'"), eqRes.failureMessage.get)
    val sup = UniquesSuperset(rt, ref2 = Some(rf), maxRelativeViolations = 0.0)
    val supRes = sup.test(spark)
    assert(!supRes.outcome)
    assert(supRes.failureMessage.get.contains("(1 / 6)"), supRes.failureMessage.get)
    assert(UniquesSuperset(rf, ref2 = Some(rt)).test(spark).outcome)
  }

  test("between-source uniques with mismatched column arity fail loudly") {
    val f = mixDf(Seq((Integer.valueOf(1), "v1", null)))
    val rf = DataRef(FrameSource(f, "arity_f"), Some(Seq("col_varchar")))
    val rt = DataRef(FrameSource(f, "arity_t"), Some(Seq("col_int", "col_varchar")))
    val e = intercept[IllegalArgumentException] {
      UniquesEquality(rf, ref2 = Some(rt)).test(spark)
    }
    assert(e.getMessage.contains("arity"), e.getMessage)
  }

  test("VarCharRegex row-weighted (aggregated=false) tolerance") {
    // "ok" x3 rows, "bad!" x1 row → row-weighted violations 1/4; distinct 1/2
    val df = mixDf(Seq(
      (Integer.valueOf(1), "ok", null), (Integer.valueOf(2), "ok", null),
      (Integer.valueOf(3), "ok", null), (Integer.valueOf(4), "bad!", null)))
    val ref = DataRef(FrameSource(df, "t"), Some(Seq("col_varchar")))
    assert(VarCharRegex(ref, "^[a-z]+$", aggregated = false,
      relativeTolerance = 0.25).test(spark).outcome)
    assert(!VarCharRegex(ref, "^[a-z]+$", aggregated = false,
      relativeTolerance = 0.24).test(spark).outcome)
    assert(VarCharRegex(ref, "^[a-z]+$", aggregated = true,
      relativeTolerance = 0.5).test(spark).outcome)
    assert(!VarCharRegex(ref, "^[a-z]+$", aggregated = true,
      relativeTolerance = 0.49).test(spark).outcome)
  }
}
