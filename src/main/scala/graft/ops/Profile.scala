package graft.ops

import org.apache.spark.sql.DataFrame
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
}
