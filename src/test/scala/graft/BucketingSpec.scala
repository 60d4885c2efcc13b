package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketing

/** Pins the co-located-join layout: two tables bucketed by the same key
  * into the same bucket count join with NO shuffle exchange on either side
  * (the storage-side join strategy at 100 TB — pay one shuffle at write
  * time, every subsequent join is exchange-free).
  */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("co-bucketed tables join without a shuffle exchange") {
    val a = (1 to 200).map(i => (i.toLong % 37, i.toLong)).toDF("k", "va")
    val b = (1 to 300).map(i => (i.toLong % 37, -i.toLong)).toDF("k", "vb")
    // one write task → one file per bucket, so the sortBy is exploitable
    Bucketing.writeBucketed(a.coalesce(1), "graft_buck_a", Seq("k"), 4)
    Bucketing.writeBucketed(b.coalesce(1), "graft_buck_b", Seq("k"), 4)
    try {
      val joined = spark.table("graft_buck_a")
        .join(spark.table("graft_buck_b"), "k")
        // keep the join out of broadcast range so the bucketing, not a
        // broadcast, is what removes the exchange
        .hint("merge")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed join must not shuffle:\n$plan")
      // correctness: same result as the plain join
      val expected = a.join(b, "k").count()
      assert(joined.count() == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_buck_a")
      spark.sql("DROP TABLE IF EXISTS graft_buck_b")
    }
  }

  test("a non-bucketed probe against a bucketed table still answers correctly") {
    val a = (1 to 50).map(i => (i.toLong % 7, i.toLong)).toDF("k", "va")
    Bucketing.writeBucketed(a.coalesce(1), "graft_buck_c", Seq("k"), 4)
    try {
      val probe = Seq((1L, "x"), (2L, "y")).toDF("k", "tag")
      val j = spark.table("graft_buck_c").join(probe.hint("merge"), "k")
      assert(j.count() == a.where(col("k").isin(1L, 2L)).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_buck_c")
    }
  }
}
