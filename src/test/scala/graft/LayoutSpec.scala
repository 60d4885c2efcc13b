package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Layout

/** Z-order layout: Morton-code correctness against a reference bit
  * interleave, per-dimension monotonicity, and the clustering claim itself
  * (bounding boxes shrink in EVERY dimension vs a random layout).
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference Morton code (plain Scala). */
  private def morton(buckets: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits; (b, j) <- buckets.zipWithIndex)
      z |= ((b >> i) & 1L) << (i * buckets.size + j)
    z
  }

  test("interleaveBits matches the reference Morton code on randoms") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map(_ =>
      (rnd.nextInt(256).toLong, rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val out = rows.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        Layout.interleaveBits(Seq(col("a"), col("b"), col("c")), 8).as("z"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(3) === morton(Seq(r.getLong(0), r.getLong(1), r.getLong(2)), 8))
    }
  }

  test("linearBucket: clamped, degenerate-range and null safe, full span") {
    val df = Seq(0.0, 50.0, 100.0).toDF("v")
    val b = df.select(
      Layout.linearBucket(col("v"), lit(0.0), lit(100.0), 8)).as[Long].collect()
    assert(b(0) === 0L)
    assert(b(1) === 128L)
    assert(b(2) === 255L) // v = max hits 2^bits, clamps to 2^bits - 1
    val degenerate = Seq(7.0).toDF("v")
      .select(Layout.linearBucket(col("v"), lit(7.0), lit(7.0), 8))
      .as[Long].head()
    assert(degenerate === 0L)
  }

  test("zorder is monotonic per dimension with the others fixed") {
    val df = (0L until 64L).map(x => (x, 13L)).toDF("x", "y")
    val z = Layout.zorderKey(df, Seq("x", "y"), bits = 6,
        ranges = Some(Seq((0.0, 64.0), (0.0, 64.0))))
      .orderBy("x").select("zorder_key").as[Long].collect()
    assert(z.sliding(2).forall(p => p(0) < p(1)), "z must rise with x at fixed y")
  }

  test("zorderPartitioned clusters BOTH dimensions; row set is preserved") {
    // uniform 2-D grid; a 1-D sort would cluster x only
    val n = 64
    val grid = for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y").repartition(16) // scrambled input layout
    val parts = 16
    val zed = Layout.zorderPartitioned(df, Seq("x", "y"), parts, bits = 6)
    assert(zed.count() === n.toLong * n)
    val zShare = Layout.boundingBoxShare(zed, Seq("x", "y"))
      .agg(avg("bbox_share")).as[Double].head()
    val randomShare = Layout.boundingBoxShare(df, Seq("x", "y"))
      .agg(avg("bbox_share")).as[Double].head()
    // 16 partitions on a 2-D Z-curve -> each covers ~1/16 of the area;
    // a scrambled layout's partitions each cover ~the whole area
    assert(zShare < 0.15, s"z-ordered mean bbox share $zShare")
    assert(randomShare > 0.8, s"scrambled mean bbox share $randomShare")
    // the claim that distinguishes Z-order from a 1-D sort is PER-DIMENSION:
    // a sort on x also reaches ~1/16 total volume, but its y extent is
    // global (y-predicates prune nothing), while the Z-curve bounds BOTH
    // dimensions (~1/4 each at 16 partitions)
    def dimShare(frame: org.apache.spark.sql.DataFrame, c: String) =
      Layout.boundingBoxShare(frame, Seq(c)).agg(avg("bbox_share")).as[Double].head()
    val sorted = df.repartitionByRange(parts, col("x")).sortWithinPartitions("x")
    assert(dimShare(zed, "x") < 0.6, s"z x-share ${dimShare(zed, "x")}")
    assert(dimShare(zed, "y") < 0.6, s"z y-share ${dimShare(zed, "y")}")
    assert(dimShare(sorted, "y") > 0.9,
      s"1-D sort must leave y unclustered: ${dimShare(sorted, "y")}")
  }

  test("writeZOrdered round-trips rows through parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val df = (0L until 500L).map(i => (i % 25, i / 25)).toDF("x", "y")
    Layout.writeZOrdered(df, Seq("x", "y"), dir, numFiles = 4, bits = 5)
    val back = spark.read.parquet(dir)
    assert(back.count() === 500L)
    assert(back.columns.toSet === Set("x", "y"))
    assert(back.select(sum(col("x") * 1000 + col("y"))).as[Long].head() ===
      df.select(sum(col("x") * 1000 + col("y"))).as[Long].head())
  }
}
