package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B the AQE wide-start cost on the sf10 heavies: the bench sizes
  * `initialPartitionNum` to the leg (425 at ~1.7 GB) for spill safety, but
  * the eager-checkpoint pipelines run MANY stages — if wide-start
  * scheduling overhead dominates, the number measures the session config,
  * not the plan. Usage: runMain graft.tools.WideProbe <dir> <q1,q2> [wides]
  */
object WideProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val wides = args.lift(2).getOrElse("32,128,425").split(",").map(_.toInt)
    for (wide <- wides) {
      val spark = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", wide)
        .config("spark.cleaner.periodicGC.interval", "5min")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      names.foreach { name =>
        val fn = graft.SparkEntry.queries(name)
        fn(spark, dir).count() // warm
        graft.core.Blocks.releaseAll(); spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        println(f"[wide] wide=$wide $name t=${(System.nanoTime() - t0) / 1e9}%.2fs")
        graft.core.Blocks.releaseAll(); spark.catalog.clearCache()
      }
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
