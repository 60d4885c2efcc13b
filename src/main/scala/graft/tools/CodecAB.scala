package graft.tools

import org.apache.spark.sql.SparkSession

/** r15 verdict task 6: shuffle-codec A/B (lz4 default vs zstd) over the
  * heavy-shuffle gates, fresh session per codec arm, warm-up + 2 timed
  * runs per query (min reported). Alternating codec order across arms
  * would need two JVMs; instead both arms run in THIS JVM back-to-back
  * with a calibration probe bracketing each arm so window drift is on
  * record.
  * Usage: runMain graft.tools.CodecAB <dir> [q1,q2,...]
  */
object CodecAB {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val queries = args.lift(1)
      .map(_.split(',').toSeq)
      .getOrElse(Seq(
        "q_rebanded_dedup", "q_cross_neardup", "q_minhash_dedup",
        "q_dedup_clusters", "q_classifier_score", "q_bootstrap_ci"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    def session(codec: String): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
          graft.core.Tuning.wideStart(dir, cpus))
        .config("spark.io.compression.codec", codec)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    for (codec <- sys.env.getOrElse("CODEC_ORDER", "lz4,zstd,lz4").split(",")) { // lz4 twice: drift bracket
      val spark = session(codec)
      val calib = math.min(
        graft.Bench.calibProbe(spark), graft.Bench.calibProbe(spark))
      println(f"[codec] arm=$codec calib=$calib%.3f")
      queries.foreach { q =>
        val fn = graft.SparkEntry.queries(q)
        def once(): Double = {
          val t0 = System.nanoTime()
          fn(spark, dir).count(): Unit
          val t = (System.nanoTime() - t0) / 1e9
          graft.core.Blocks.releaseAll()
          spark.catalog.clearCache()
          t
        }
        once() // warm-up
        val t = math.min(once(), once())
        println(f"[codec] $codec $q: $t%.2fs")
      }
      spark.stop()
    }
  }
}
