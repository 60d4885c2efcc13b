package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Whole-table column profiling — the "describe this table" report a data
  * platform renders before anyone writes a constraint: per column, counts,
  * null counts, exact distinct counts, and string-rendered min/max.
  *
  * ONE aggregate over one scan produces every column's numbers (Spark
  * plans the multiple `count(DISTINCT …)` via Expand — one pass over the
  * data replicated per distinct-column, all partial-aggregated); the
  * per-column rows are then a constant-size driver-side pivot of that
  * single aggregate row. min/max render as strings so heterogeneous
  * column types share one output schema (the cross-type caveat: values
  * compare in their native type BEFORE rendering).
  */
object Profile {

  def profileColumns(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "at least one column to profile")
    val spark = df.sparkSession
    val aggs = columns.flatMap { c =>
      Seq(
        count(col(c)).as(s"dj_n_$c"),
        countDistinct(col(c)).as(s"dj_d_$c"),
        min(col(c)).cast("string").as(s"dj_min_$c"),
        max(col(c)).cast("string").as(s"dj_max_$c"))
    }
    val total = count(lit(1)).as("dj_total")
    val row = df.agg(total, aggs: _*).head()
    val totalRows = row.getLong(0)
    val out = columns.map { c =>
      val n = row.getAs[Long](s"dj_n_$c")
      org.apache.spark.sql.Row(
        c, totalRows, totalRows - n, row.getAs[Long](s"dj_d_$c"),
        row.getAs[String](s"dj_min_$c"), row.getAs[String](s"dj_max_$c"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "column", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField(
          "n_rows", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField(
          "n_null", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField(
          "n_distinct", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField(
          "min_value", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField(
          "max_value", org.apache.spark.sql.types.StringType))))
  }

  /** Per-group top-k most frequent values — the grouped mode profile
    * ("what are each source's dominant languages / each status's
    * priorities"), with a fully deterministic order: count descending,
    * value ascending on ties. Values render as strings with NULL as the
    * explicit "<null>" category (a real category here, and it sidesteps
    * the engines' opposite NULL-ordering defaults).
    *
    * Exact salted two-phase plan (the [[Corpus]] stratified-sample
    * posture): distinct-value counts (one partial-agg shuffle), a LOCAL
    * top-k per (group, salt-of-value) — every global top-k value is
    * necessarily in its own salt's local top-k, so no candidate is lost —
    * then the final rank over ≤ k·nSalts survivors per group. A group
    * with millions of distinct values never sorts in one partition; the
    * final window's per-group input is k·nSalts rows by construction.
    * Out: (groupCol, value STRING, cnt, rank) with rank ≤ k.
    */
  def groupTopK(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Int,
      nSalts: Int = 32): DataFrame = {
    require(k >= 1 && nSalts >= 1, s"bad groupTopK: k=$k nSalts=$nSalts")
    val v = coalesce(col(valueCol).cast("string"), lit("<null>"))
    val counts = df
      .groupBy(col(groupCol), v.as("value"))
      .agg(count(lit(1)).as("cnt"))
    val salted = counts.withColumn(
      "dj_salt", pmod(xxhash64(col("value")), lit(nSalts)))
    val wLocal = Window.partitionBy(col(groupCol), col("dj_salt"))
      .orderBy(col("cnt").desc, col("value").asc)
    val survivors = salted
      .withColumn("dj_lr", row_number().over(wLocal))
      .where(col("dj_lr") <= k)
      .drop("dj_salt", "dj_lr")
    val wFinal = Window.partitionBy(col(groupCol))
      .orderBy(col("cnt").desc, col("value").asc)
    survivors
      .withColumn("rank", row_number().over(wFinal))
      .where(col("rank") <= k)
  }
}
