package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15: warm stage decomposition of q_mad_outliers (two exact rank
  * selections over orders.o_totalprice).
  * Usage: runMain graft.tools.MadProbe <dir> [reps]
  */
object MadProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        graft.core.Tuning.wideStart(dir, cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"))
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val out = graft.ops.Integrity.madOutliers(
        orders, "o_totalprice", k = 2.0, scale = 100)
        .select(col("o_orderkey"), col("is_outlier"))
      val tc = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      out.write.format("noop").mode("overwrite").save()
      val ta = (System.nanoTime() - t1) / 1e9
      println(f"[mad rep$r] construct(eager)=$tc%.2fs action=$ta%.2fs total=${tc + ta}%.2fs")
      graft.core.Blocks.releaseAll()
    }
    spark.stop()
  }
}
