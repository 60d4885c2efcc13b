package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone re-measure of gate queries — the arbitration tool for a
  * disputed bench number: a fresh JVM, the bench's session geometry, N
  * back-to-back runs per query, bracketed by the bench's fixed-work
  * calibration probe so the probe session's own contention is on record.
  * Used in r13 to prove the sf10 leg's `q_minhash_dedup` 159.5 s (and its
  * same-window "fresh rerun" 160.2 s) was a host-contention window, not a
  * regression: this probe read 46.9 / 33.3 s minutes later on the same
  * data. From r14 the bench spawns it itself for every `unmeasured` /
  * `leg_contended` flag (post-schedule, quiet-gated) and parses the
  * `[probe-json]` line.
  *
  * Run: `sbt "runMain graft.tools.QueryProbe [q1,q2,…] [dir] [runs]"`
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val queries = args.headOption.getOrElse("q_minhash_dedup").split(',').toSeq
    val dir = args.lift(1).getOrElse("/root/repo/benchdata/sf10")
    val runs = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        graft.core.Tuning.wideStart(dir, cpus))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // min of two: the first probe execution carries its own JIT warm-up
    val calib = math.min(
      graft.Bench.calibProbe(spark), graft.Bench.calibProbe(spark))
    def r3(v: Double) = math.round(v * 1000) / 1000.0
    val results = queries.map { query =>
      val fn = graft.SparkEntry.queries.getOrElse(query,
        sys.error(s"unknown query '$query' — keys: ${graft.SparkEntry.queries.keys.toSeq.sorted.take(8).mkString(", ")}…"))
      val times = (1 to runs).map { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val t = (System.nanoTime() - t0) / 1e9
        println(s"[probe] run$i $query $dir: ${t}s rows=$n")
        graft.core.Blocks.releaseAll()
        spark.catalog.clearCache()
        t
      }
      query -> times
    }
    val calibEnd = graft.Bench.calibProbe(spark)
    val resJson = results
      .map { case (q, ts) => s"\"$q\":" + ts.map(r3).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    println(s"""[probe-json] {"dir":"$dir","calib":${r3(calib)},""" +
      s""""calib_end":${r3(calibEnd)},"results":$resJson}""")
    spark.stop()
  }
}
