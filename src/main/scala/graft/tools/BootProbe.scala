package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B the bootstrap lattice-uniform flavors (xxhash64 default vs the
  * oracle's md5 chain) at scale. Usage: runMain graft.tools.BootProbe <dir>
  */
object BootProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/benchdata/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet(s"$dir/events.parquet")
    for (flavor <- Seq(false, true); rep <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.ops.Stats.bootstrapMeanCI(
        ev, "event_id", "value", nResamples = 100, md5Flavor = flavor).count()
      println(f"[boot] md5=$flavor rep=$rep t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      graft.core.Blocks.releaseAll(); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
