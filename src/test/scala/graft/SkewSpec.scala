package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

/** Salted-join and heavy-hitter diagnosis tests. */
class SkewSpec extends AnyFunSuite {
  import TestSpark._

  test("salted join preserves inner-join semantics") {
    import spark.implicits._
    // skewed: key 1 carries 90% of rows
    val skewed = ((1 to 90).map(i => (1, s"v$i")) ++ (1 to 10).map(i => (i + 1, "x")))
      .toDF("k", "payload")
    val small = Seq((1, "one"), (2, "two"), (99, "none")).toDF("k", "name")
    val plain  = skewed.join(small, "k").select("k", "payload", "name")
      .collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedJoin(skewed, small, Seq("k"), saltBuckets = 8)
      .select("k", "payload", "name")
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("heavyHitters flags the hot key only") {
    import spark.implicits._
    val df = ((1 to 90).map(_ => 1) ++ (2 to 11)).toDF("k")
    val hot = Skew.heavyHitters(df, Seq("k"), threshold = 0.5)
      .collect().map(_.getInt(0)).toSeq
    assert(hot == Seq(1))
  }
}
