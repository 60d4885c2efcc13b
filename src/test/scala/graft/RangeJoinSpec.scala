package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RangeJoin

/** Bucketed range join vs. the naive non-equi join it replaces: exact pair
  * parity over randomized inputs (duplicates, negatives, touching
  * boundaries), boundary semantics, keyed matching, and the no-nested-loop
  * plan shape that is the operator's reason to exist.
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pts(rows: Seq[(Long, Double)]) =
    rows.toDF("point_id", "x")

  private def ivs(rows: Seq[(Long, Double, Double)]) =
    rows.toDF("interval_id", "start", "end")

  test("matches the naive non-equi join exactly on randomized input") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val points = pts((1 to 120).map(i =>
        (i.toLong, math.floor(rnd.nextDouble() * 200 - 100))))
      val intervals = ivs((1 to 40).map { i =>
        val s = math.floor(rnd.nextDouble() * 200 - 100)
        val len = math.floor(rnd.nextDouble() * (if (i % 7 == 0) 90 else 8))
        (i.toLong, s, s + len)
      })
      val got = RangeJoin
        .rangeJoin(points, intervals, "x", "start", "end")
        .select("point_id", "interval_id")
        .as[(Long, Long)].collect().toSet
      val want = points
        .join(intervals, col("x") >= col("start") && col("x") < col("end"))
        .select("point_id", "interval_id")
        .as[(Long, Long)].collect().toSet
      assert(got === want, s"trial $trial")
      // exactly-once production: no duplicate pairs before the Set
      val n = RangeJoin
        .rangeJoin(points, intervals, "x", "start", "end")
        .count()
      assert(n === want.size.toLong, s"trial $trial duplicate pairs")
    }
  }

  test("boundary semantics: start inclusive, end exclusive unless inclusiveEnd") {
    val points = pts(Seq((1L, 10.0), (2L, 20.0)))
    val intervals = ivs(Seq((100L, 10.0, 20.0)))
    val exclusive = RangeJoin
      .rangeJoin(points, intervals, "x", "start", "end")
      .select("point_id").as[Long].collect().toSet
    assert(exclusive === Set(1L))
    val inclusive = RangeJoin
      .rangeJoin(points, intervals, "x", "start", "end", inclusiveEnd = true)
      .select("point_id").as[Long].collect().toSet
    assert(inclusive === Set(1L, 2L))
  }

  test("keys restrict matches; null coordinates and inverted intervals drop") {
    val points = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "a", java.lang.Double.valueOf(5.0)),
        Row(2L, "b", java.lang.Double.valueOf(5.0)),
        Row(3L, "a", null: java.lang.Double))),
      StructType(Seq(
        StructField("point_id", LongType),
        StructField("k", StringType),
        StructField("x", DoubleType))))
    val intervals = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(10L, "a", 0.0, 9.0),
        Row(11L, "b", 6.0, 9.0),
        Row(12L, "a", 9.0, 0.0))), // inverted: dropped
      StructType(Seq(
        StructField("interval_id", LongType),
        StructField("k", StringType),
        StructField("start", DoubleType),
        StructField("end", DoubleType))))
    val got = RangeJoin
      .rangeJoin(points, intervals, "x", "start", "end", keys = Seq("k"))
      .select("point_id", "interval_id")
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L)))
  }

  test("coverageFraction counts each point row once, duplicates included") {
    val points = pts(Seq((1L, 1.0), (2L, 1.0), (3L, 50.0), (4L, 99.0)))
    val intervals = ivs(Seq((10L, 0.0, 2.0), (11L, 0.5, 1.5), (12L, 98.0, 100.0)))
    val f = RangeJoin.coverageFraction(points, intervals, "x", "start", "end")
    assert(f === 0.75) // points 1, 2 (duplicate coord), 4 covered; 3 not
  }

  test("plan is an equi-join, not a nested loop or cartesian") {
    val points = pts((1 to 50).map(i => (i.toLong, i.toDouble)))
    val intervals = ivs((1 to 10).map(i => (i.toLong, i * 5.0, i * 5.0 + 7)))
    val plan = RangeJoin
      .rangeJoin(points, intervals, "x", "start", "end")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(
      plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
        plan.contains("BroadcastHashJoin"),
      s"expected an equi-join:\n$plan")
  }

  test("autoBucketWidth bounds the widest interval's explode factor") {
    val intervals = ivs(Seq((1L, 0.0, 1.0), (2L, 0.0, 2.0), (3L, 0.0, 6400.0)))
    val w = RangeJoin.autoBucketWidth(intervals, "start", "end")
    assert(6400.0 / w <= 64.000001)
    assert(w >= (1 + 2 + 6400.0) / 3 - 1e-6) // at least the average length
  }
}
