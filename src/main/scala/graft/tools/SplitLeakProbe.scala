package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15: warm stage decomposition of q_split_leakage (ngramJaccardPairs →
  * connectedComponents → splitLeakage).
  * Usage: runMain graft.tools.SplitLeakProbe <dir> [reps]
  */
object SplitLeakProbe {
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    for (r <- 1 to reps) {
      def step[T](name: String)(body: => T): T = {
        val t0 = System.nanoTime()
        val res = body
        println(f"[sl rep$r] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
        res
      }
      val t0 = System.nanoTime()
      val pairs = step("ngramJaccardPairs construct")(
        graft.ops.Dedup.ngramJaccardPairs(
          docs, "text", "doc_id", shingleK = 5, threshold = 0.6))
      val clusters = step("connectedComponents (eager)")(
        graft.ops.Dedup.connectedComponents(pairs)
          .select(col("id").as("doc_id"),
            col("cluster_id").cast("bigint").as("cluster_id")))
      val splits = graft.ops.Corpus.assignSplits(
        docs.select(col("doc_id")), "doc_id",
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      step("splitLeakage + action")(
        graft.ops.Corpus
          .splitLeakage(clusters, "doc_id", "cluster_id", splits, "split")
          .write.format("noop").mode("overwrite").save())
      println(f"[sl rep$r] TOTAL: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      graft.core.Blocks.releaseAll()
    }
    spark.stop()
  }
}
