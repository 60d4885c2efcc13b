package graft.tools
import org.apache.spark.sql.SparkSession
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { d =>
      val t0 = System.nanoTime()
      val r = graft.Bench.annRecall(spark, d)
      println(f"[recall] $d ${(System.nanoTime()-t0)/1e9}%.1fs -> $r")
    }
    spark.stop()
  }
}
