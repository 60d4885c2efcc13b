package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15: warm decomposition of q_semantic_neardup / q_semantic_mp.
  * Usage: runMain graft.tools.SemanticProbe <dir> [reps] [probes]
  */
object SemanticProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val probes = if (args.length > 2) args(2).toInt else 1
    val maxLit = if (args.length > 3) args(3).toInt else 512
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
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val out = graft.ops.Similarity.semanticNearDups(
        emb, "vec_id", "embedding", threshold = 0.3495,
        nClusters = 64, lloydIters = 0, corpusSize = Some(1), probes = probes,
        maxLiteralCentroids = maxLit)
        .select(
          col("id1"), col("id2"), col("cluster"),
          round(col("cosine"), 6).as("cosine"),
          round(col("cosine"), 3).as("dj_member"))
        .where(col("dj_member") >= 0.35)
        .drop("dj_member")
      val tc = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      out.write.format("noop").mode("overwrite").save()
      val ta = (System.nanoTime() - t1) / 1e9
      println(f"[sem rep$r] construct=$tc%.2fs action=$ta%.2fs total=${tc + ta}%.2fs")
      graft.core.Blocks.releaseAll()
    }
    spark.stop()
  }
}
