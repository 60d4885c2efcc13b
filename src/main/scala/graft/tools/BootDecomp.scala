package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15: which part of the bootstrap replicate job is the time going to?
  * Usage: runMain graft.tools.BootDecomp <dir> [reps]
  */
object BootDecomp {
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
    val events = spark.read.parquet(s"$dir/events.parquet")
    val base = events.where(col("value").isNotNull)
    val nResamples = 20
    val x = round(col("value") * 1000000L).cast("decimal(30,0)")
    val u = (graft.functions.Md5Lattice.md5PrefixLong(
      concat(col("event_id").cast("string"), lit(":gate:"),
        col("dj_b").cast("string")), 13) + 0.5) / lit(4503599627370496.0)
    val wLadder = graft.ops.Stats.PoissonCdf.zipWithIndex.reverse
      .foldLeft(lit(8).cast("decimal(1,0)")) { case (acc, (t, k)) =>
        when(col("dj_u") < t, lit(k).cast("decimal(1,0)")).otherwise(acc)
      }
    def step(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[bd] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    for (r <- 1 to reps) {
      println(s"[bd] --- rep $r ---")
      step("scan only (count)")(base.count(): Unit)
      step("explode only")(
        base.select(col("event_id"), x.as("dj_x"),
          explode(sequence(lit(1), lit(nResamples))).as("dj_b"))
          .agg(count(lit(1))).head(): Unit)
      step("explode+md5u sum")(
        base.select(col("event_id"), x.as("dj_x"),
          explode(sequence(lit(1), lit(nResamples))).as("dj_b"))
          .select(col("dj_x"), col("dj_b"), u.as("dj_u"))
          .agg(sum(col("dj_u"))).head(): Unit)
      step("full grouped (ladder+aggs)")(
        base.select(col("event_id"), x.as("dj_x"),
          explode(sequence(lit(1), lit(nResamples))).as("dj_b"))
          .select(col("dj_x"), col("dj_b"), u.as("dj_u"))
          .select(col("dj_x"), col("dj_b"), wLadder.as("dj_w"))
          .groupBy("dj_b")
          .agg(
            sum((col("dj_w") * col("dj_x")).cast("decimal(38,0)")).as("dj_sx"),
            sum(col("dj_w").cast("long")).as("dj_sw"),
            count(lit(1)).as("dj_cnt"),
            sum(col("dj_x")).as("dj_tx"))
          .collect(): Unit)
    }
    spark.stop()
  }
}
