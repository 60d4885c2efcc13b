package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15: job-level decomposition of q_incremental_dedup.
  * Usage: runMain graft.tools.IncProbe <dir> <indexPath> [reps]
  */
object IncProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val path = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        graft.core.Tuning.wideStart(dir, cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val starts =
          new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(j.jobId, System.nanoTime())
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = starts.remove(j.jobId)
          println(f"[job] id=${j.jobId} ${(System.nanoTime() - t0) / 1e9}%.3fs")
        }
      })
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val out = graft.sources.DedupIndex.incrementalNearDups(
        docs.where(col("doc_id") % 2 === 0), "text", path, threshold = 0.6)
        .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
      val tc = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val n = out.count()
      val ta = (System.nanoTime() - t1) / 1e9
      println(f"[inc rep$r] construct=$tc%.2fs action=$ta%.2fs total=${tc + ta}%.2fs pairs=$n")
      graft.core.Blocks.releaseAll()
    }
    spark.stop()
  }
}
