package graft

import org.apache.spark.sql.SparkSession

/** Local smoke: run the flagship entry the way the driver's t1 gate does
  * (rows>0 on sf0.001) and print the result.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n  = df.count()
    df.show(10, truncate = false)
    println(s"[smoke] entry rows=$n (driver requires >0)")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
