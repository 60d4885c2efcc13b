package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for write paths.
  *
  * At 100 TB the scan cost of every later query is set by LAYOUT, not by
  * the query plan: parquet row-group min/max pruning only helps when rows
  * with nearby key values are physically adjacent. Sorting clusters one
  * dimension perfectly and the rest not at all; a Z-order (Morton) curve
  * interleaves the bits of several dimensions so each output file covers a
  * small hyper-rectangle of the key space and predicates on ANY
  * participating column prune most files (the technique behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY` — public literature: Morton 1966,
  * "A computer oriented geodetic data base and a new technique in file
  * sequencing").
  *
  * Everything is declarative: bucketization and bit-interleave are plain
  * codegen'd column arithmetic, the global clustering is one
  * `repartitionByRange` (sampled range boundaries — Spark's distributed
  * total-order machinery) plus a within-partition sort. No collect, no
  * custom partitioner.
  */
object Layout {

  /** Scale a numeric column to an integer bucket in [0, 2^bits): linear
    * min-max normalization, computed in double (`floor((v - min) / range ·
    * 2^bits)`, clamped) — IEEE-deterministic and re-derivable by any
    * engine. A degenerate dimension (min = max) buckets to 0.
    */
  def linearBucket(v: Column, min: Column, max: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, s"bits per dimension must lie in [1, 20]: $bits")
    val range = max.cast("double") - min.cast("double")
    val scaled =
      floor((v.cast("double") - min.cast("double")) / range * (1L << bits))
        .cast("long")
    when(range <= 0 || v.isNull, lit(0L))
      .otherwise(least(lit((1L << bits) - 1), greatest(lit(0L), scaled)))
  }

  /** Bit-interleave `d` bucket columns (each in [0, 2^bits)) into the
    * Morton code: result bit `i·d + j` is bit `i` of dimension `j` — the
    * canonical Z-curve. `d · bits` must fit a signed long (≤ 62). Pure
    * shift/mask arithmetic, one codegen'd projection.
    */
  def interleaveBits(buckets: Seq[Column], bits: Int): Column = {
    val d = buckets.size
    require(d >= 1, "at least one dimension")
    require(d * bits <= 62, s"interleaved width $d x $bits exceeds a signed long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      buckets.zipWithIndex.foldLeft(acc) { case (a, (b, j)) =>
        a + shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * d + j)
      }
    }
  }

  /** The Z-order key of `cols` with per-dimension min/max taken from the
    * data (one tiny aggregate, broadcast via cross join — the only extra
    * scan; pass `ranges` to skip it when bounds are known, e.g. dates).
    */
  def zorderKey(
      df: DataFrame,
      cols: Seq[String],
      bits: Int = 12,
      ranges: Option[Seq[(Double, Double)]] = None): DataFrame = {
    require(cols.nonEmpty, "zorderKey needs at least one column")
    ranges.foreach(r => require(r.size == cols.size, "one (min,max) per column"))
    val withBounds = ranges match {
      case Some(r) =>
        r.zipWithIndex.foldLeft(df) { case (acc, ((lo, hi), i)) =>
          acc.withColumn(s"dj_min_$i", lit(lo)).withColumn(s"dj_max_$i", lit(hi))
        }
      case None =>
        val agg = df.agg(
          cols.zipWithIndex.flatMap { case (c, i) =>
            Seq(min(col(c)).cast("double").as(s"dj_min_$i"),
              max(col(c)).cast("double").as(s"dj_max_$i"))
          }.head,
          cols.zipWithIndex.flatMap { case (c, i) =>
            Seq(min(col(c)).cast("double").as(s"dj_min_$i"),
              max(col(c)).cast("double").as(s"dj_max_$i"))
          }.tail: _*)
        df.crossJoin(broadcast(agg))
    }
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      linearBucket(col(c), col(s"dj_min_$i"), col(s"dj_max_$i"), bits)
    }
    withBounds
      .withColumn("zorder_key", interleaveBits(buckets, bits))
      .drop(cols.indices.flatMap(i => Seq(s"dj_min_$i", s"dj_max_$i")): _*)
  }

  /** Cluster `df` along the Z-curve of `cols` into `numFiles` output
    * partitions: range-partition on the Morton key (Spark samples the key
    * distribution for balanced boundaries), sort within each partition,
    * drop the key. Each written file then covers a compact hyper-rectangle
    * of the key space — parquet min/max pruning works for predicates on
    * every participating column, not just a leading sort column.
    */
  def zorderPartitioned(
      df: DataFrame,
      cols: Seq[String],
      numFiles: Int,
      bits: Int = 12,
      ranges: Option[Seq[(Double, Double)]] = None): DataFrame = {
    require(numFiles >= 1, s"numFiles must be positive: $numFiles")
    zorderKey(df, cols, bits, ranges)
      .repartitionByRange(numFiles, col("zorder_key"))
      .sortWithinPartitions("zorder_key")
      .drop("zorder_key")
  }

  /** Write `df` Z-ordered by `cols` (parquet, `numFiles` files). */
  def writeZOrdered(
      df: DataFrame,
      cols: Seq[String],
      path: String,
      numFiles: Int,
      bits: Int = 12): Unit =
    zorderPartitioned(df, cols, numFiles, bits).write
      .mode("overwrite").parquet(path)

  /** Clustering diagnostic: per-partition bounding-box volume share.
    * For each current partition, the product over dimensions of
    * (per-partition range / global range); the mean over partitions is
    * ≈ 1/numPartitions^(d/d)… for a PERFECT d-dim clustering it shrinks
    * like numPartitions^-1, while a random layout stays ≈ 1. Used by the
    * spec to pin that Z-ordering actually clusters every dimension.
    */
  def boundingBoxShare(df: DataFrame, cols: Seq[String]): DataFrame = {
    val withPid = df.withColumn("dj_pid", spark_partition_id())
    val perPart = withPid
      .groupBy("dj_pid")
      .agg(
        cols.flatMap(c => Seq(
          min(col(c)).cast("double").as(s"dj_lo_$c"),
          max(col(c)).cast("double").as(s"dj_hi_$c"))).head,
        cols.flatMap(c => Seq(
          min(col(c)).cast("double").as(s"dj_lo_$c"),
          max(col(c)).cast("double").as(s"dj_hi_$c"))).tail: _*)
    val globals = df.agg(
      cols.flatMap(c => Seq(
        min(col(c)).cast("double").as(s"dj_glo_$c"),
        max(col(c)).cast("double").as(s"dj_ghi_$c"))).head,
      cols.flatMap(c => Seq(
        min(col(c)).cast("double").as(s"dj_glo_$c"),
        max(col(c)).cast("double").as(s"dj_ghi_$c"))).tail: _*)
    val share = cols.map { c =>
      (col(s"dj_hi_$c") - col(s"dj_lo_$c")) /
        (col(s"dj_ghi_$c") - col(s"dj_glo_$c"))
    }.reduce(_ * _)
    perPart.crossJoin(broadcast(globals))
      .select(col("dj_pid").as("partition_id"), share.as("bbox_share"))
  }
}
