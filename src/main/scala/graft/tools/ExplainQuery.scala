package graft.tools

import org.apache.spark.sql.SparkSession

/** Iteration aid: print the formatted physical plan of a SparkEntry query.
  * Usage: runMain graft.tools.ExplainQuery <sfDir> <query>
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val Array(dir, name) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
    spark.stop()
  }
}
