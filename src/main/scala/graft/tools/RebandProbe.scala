package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Step decomposition probe for the q_rebanded_dedup lifecycle (r14: the
  * gate's warm-up measured 171 s of index build and a 27.6 s query at
  * sf0.1 — far past any plausible cost for 5k documents). Times each
  * lifecycle step (build thirdA, append thirdB, rebuild bands=32, query
  * thirdC) plus a contrast run at the q_incremental_dedup geometry.
  * Usage: runMain graft.tools.RebandProbe <dir> [bands]
  */
object RebandProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val bands = args.lift(1).map(_.toInt).getOrElse(32)
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
    val path = java.nio.file.Files
      .createTempDirectory("graft_reband_probe").toString
    def step[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[reband] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    step("build(thirdA)") {
      graft.sources.DedupIndex.build(
        docs.where(col("doc_id") % 3 === 1), "text", "doc_id", path)
    }
    step("append(thirdB)") {
      graft.sources.DedupIndex.append(
        docs.where(col("doc_id") % 3 === 2), "text", path)
    }
    step(s"rebuild(bands=$bands)") {
      graft.sources.DedupIndex.rebuild(spark, path, bands = bands)
    }
    for (i <- 1 to 2) {
      step(s"query(thirdC) run$i") {
        graft.sources.DedupIndex
          .incrementalNearDups(
            docs.where(col("doc_id") % 3 === 0), "text", path,
            threshold = 0.6, maxBucketSize = 1000000)
          .count()
      }
      graft.core.Blocks.releaseAll(); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
