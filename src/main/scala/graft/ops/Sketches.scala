package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches, Spark-first: the sketch is a TABLE (a
  * `depth × width` grouped-count frame), not an opaque aggregation buffer —
  * partial aggregation gives the map-side combine a custom
  * TypedImperativeAggregate would hand-roll, `cmsMerge` is a union+re-agg
  * (associative and commutative, so daily sketches roll up into monthly
  * ones), and estimates are a broadcast join against ≤ depth·width rows.
  * A 100 TB value stream folds to a frame bounded by the sketch geometry
  * — nothing scales with the data.
  *
  * Hashing is cross-engine recomputable on purpose (row-salted md5, first
  * 15 hex digits, mod width — the `q_simhash_md5` precedent), so the
  * DuckDB oracle rebuilds the sketch AND the estimates bit-for-bit.
  */
object Sketches {

  /** Row-`d` CMS bucket of a value: `md5("d:value")`'s first 15 hex digits
    * mod `width` (positive — 15 hex digits < 2^60).
    */
  def cmsBucket(value: Column, d: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"$d:"), value.cast("string"))), 1, 15), 16, 10)
      .cast("long") % width

  /** Build the Count-Min sketch of `valueCol`: one row per non-empty
    * (cms_row, cms_bucket) cell with its collision-summed count. NULL
    * values are not counted (SQL aggregate convention).
    */
  def cmsSketch(
      df: DataFrame,
      valueCol: String,
      depth: Int = 4,
      width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad sketch geometry: $depth x $width")
    val cells = (0 until depth).map { d =>
      struct(lit(d).as("cms_row"), cmsBucket(col(valueCol), d, width).as("cms_bucket"))
    }
    df.where(col(valueCol).isNotNull)
      .select(explode(array(cells: _*)).as("dj_cell"))
      .groupBy(col("dj_cell.cms_row").as("cms_row"), col("dj_cell.cms_bucket").as("cms_bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketches of the SAME geometry: union + re-sum. Counter cells are
    * sums, so merge order never matters.
    */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("cms_row", "cms_bucket")
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-frequency estimates for `probes`' `valueCol`: min over the
    * sketch rows of the probed cell (0 for a never-hit cell). The classic
    * CMS guarantee holds: estimate ≥ true count, with overshoot bounded by
    * collisions. The sketch side is tiny — Spark broadcasts it.
    */
  def cmsEstimate(
      sketch: DataFrame,
      probes: DataFrame,
      valueCol: String,
      depth: Int = 4,
      width: Int = 256): DataFrame = {
    val cells = (0 until depth).map { d =>
      struct(lit(d).as("cms_row"), cmsBucket(col(valueCol), d, width).as("cms_bucket"))
    }
    probes
      .where(col(valueCol).isNotNull)
      .select(col(valueCol), explode(array(cells: _*)).as("dj_cell"))
      .select(col(valueCol), col("dj_cell.cms_row"), col("dj_cell.cms_bucket"))
      .join(broadcast(sketch), Seq("cms_row", "cms_bucket"), "left")
      .groupBy(valueCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_count"))
  }
}
