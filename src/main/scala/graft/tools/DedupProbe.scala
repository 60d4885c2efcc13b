package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage/volume decomposition probe for the heavy dedup pipelines.
  * Usage: runMain graft.tools.DedupProbe <dir> [minhash|ngram|both]
  *   [maxShingleDf,coarseStride,coarseK]  (ngram knob A/B)
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val which = args.lift(1).getOrElse("both")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        graft.core.Tuning.wideStart(dir, 32))
      .config("spark.cleaner.periodicGC.interval", "5min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    if (which == "minhash" || which == "both") {
      val stages = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      val t0 = System.nanoTime()
      val n = graft.ops.Dedup.minhashNearDups(
        docs, "text", "doc_id",
        stageHook = (k, v) => stages.update(k, math.round(v * 1000) / 1000.0))
        .count()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"[minhash] total=$total%.2fs pairs=$n stages=$stages")
      graft.core.Blocks.releaseAll(); spark.catalog.clearCache()
    }
    if (which == "ngram" || which == "both") {
      val knobs = args.lift(2).getOrElse("20,4,24").split(",").map(_.toInt)
      val m = graft.ops.Dedup.ngramJaccardProfile(
        docs, "text", "doc_id",
        maxShingleDf = knobs(0), coarseStride = knobs(1), coarseK = knobs(2))
      println(s"[ngram] knobs=df<=${knobs(0)},stride=${knobs(1)},k=${knobs(2)} $m")
      graft.core.Blocks.releaseAll(); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
