package graft.tools

import org.apache.spark.sql.SparkSession

/** Iteration aid: time one or more SparkEntry queries against a data dir.
  * Usage: runMain graft.tools.TimeQuery <sfDir> <query>[,<query>...]
  * Prints warm + timed seconds per query (same discipline as Bench:
  * first run is JIT warm-up, second is the representative time).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val Array(dir, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // same input-sized wide-start AQE + periodic-GC posture as Bench/Verify
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        graft.core.Tuning.wideStart(dir, cpus.toInt))
      .config("spark.cleaner.periodicGC.interval", "5min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.split(",").foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        graft.core.Blocks.releaseAll()
        t
      }
      println(f"[time] $name warm=${times.head}%.2fs timed=${times.last}%.2fs")
    }
    spark.stop()
  }
}
