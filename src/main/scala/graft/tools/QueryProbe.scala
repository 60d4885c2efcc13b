package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone re-measure of one gate query — the arbitration tool for a
  * disputed bench number: a fresh JVM, the bench's session geometry, N
  * back-to-back runs. Used in r13 to prove the sf10 leg's
  * `q_minhash_dedup` 159.5 s (and its same-window "fresh rerun" 160.2 s)
  * was a host-contention window, not a regression: this probe read
  * 46.9 / 33.3 s minutes later on the same data.
  *
  * Run: `sbt "runMain graft.tools.QueryProbe [query] [dir] [runs]"`
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val query = args.headOption.getOrElse("q_minhash_dedup")
    val dir = args.lift(1).getOrElse("/root/repo/benchdata/sf10")
    val runs = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        graft.core.Tuning.wideStart(dir, cpus))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries.getOrElse(query,
      sys.error(s"unknown query '$query' — keys: ${graft.SparkEntry.queries.keys.toSeq.sorted.take(8).mkString(", ")}…"))
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(s"[probe] run$i $query $dir: ${(System.nanoTime() - t0) / 1e9}s rows=$n")
      graft.core.Blocks.releaseAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
