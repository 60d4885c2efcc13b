package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off: generate a fresh-content scale leg (ScaleData, freshEmbeddings)
  * for local recall validation. Run:
  * `sbt "runMain graft.tools.FreshLegGen <src> <dst> <reps>"`
  */
object FreshLegGen {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ScaleData.scale(spark, args(0), args(1), args(2).toInt, freshEmbeddings = true)
    spark.stop()
  }
}
