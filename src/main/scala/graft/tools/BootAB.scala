package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r15: same-JVM A/B of bootstrapMeanCI's tail — r14 spelling (totals
  * branch + rank window + crossjoin, one lazy action) vs r15 driver-side
  * assembly over the collected ≤nResamples grouped rows. Checks value
  * equality, then alternates timed reps.
  * Usage: runMain graft.tools.BootAB <dir> [reps]
  */
object BootAB {
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
    val nResamples = 20
    val alpha = 0.05
    val seed = "gate"
    val valueScale = 1000000L
    val base = events.where(col("value").isNotNull)
    val x = round(col("value") * valueScale).cast("decimal(30,0)")
    val u = (conv(
      substring(md5(concat(col("event_id").cast("string"), lit(":" + seed + ":"),
        col("dj_b").cast("string")).cast("binary")), 1, 13), 16, 10)
      .cast("long") + 0.5) / lit(4503599627370496.0)
    val wLadder = graft.ops.Stats.PoissonCdf.zipWithIndex.reverse
      .foldLeft(lit(8).cast("decimal(1,0)")) { case (acc, (t, k)) =>
        when(col("dj_u") < t, lit(k).cast("decimal(1,0)")).otherwise(acc)
      }
    def exploded = base
      .select(col("event_id"), x.as("dj_x"),
        explode(sequence(lit(1), lit(nResamples))).as("dj_b"))
      .select(col("dj_x"), col("dj_b"), u.as("dj_u"))
      .select(col("dj_x"), col("dj_b"), wLadder.as("dj_w"))
    val loRank = (alpha / 2 * nResamples).toInt + 1
    val hiRank = nResamples - (alpha / 2 * nResamples).toInt
    def oldTail(): Seq[Any] = {
      val totals = base.agg(count(lit(1)).as("dj_n"), sum(x).as("dj_sx"))
      val perReplicate = exploded
        .groupBy("dj_b")
        .agg(
          sum((col("dj_w") * col("dj_x")).cast("decimal(38,0)")).as("dj_sx"),
          sum(col("dj_w").cast("long")).as("dj_sw"))
        .where(col("dj_sw") > 0)
        .select(col("dj_b"),
          (col("dj_sx").cast("double") / col("dj_sw").cast("double")
            / lit(valueScale.toDouble)).as("dj_mean"))
      val ranked = perReplicate.withColumn("dj_rk",
        row_number().over(Window.orderBy(col("dj_mean"), col("dj_b"))))
      val ci = ranked.agg(
        min(when(col("dj_rk") === loRank, col("dj_mean"))).as("dj_lo"),
        min(when(col("dj_rk") === hiRank, col("dj_mean"))).as("dj_hi"),
        count(lit(1)).as("dj_nb"))
      totals.crossJoin(broadcast(ci))
        .select(col("dj_n").as("n"), lit(nResamples).as("n_resamples"),
          when(col("dj_n") > 0, col("dj_sx").cast("double") /
            col("dj_n").cast("double") / lit(valueScale.toDouble)).as("mean"),
          when(col("dj_nb") >= hiRank, col("dj_lo")).as("ci_lo"),
          when(col("dj_nb") >= hiRank, col("dj_hi")).as("ci_hi"))
        .collect().head.toSeq
    }
    def newTail(): Seq[Any] =
      graft.ops.Stats.bootstrapMeanCI(events, "event_id", "value",
        nResamples = nResamples, alpha = alpha, seed = seed,
        md5Flavor = true).collect().head.toSeq
    val o = oldTail()
    val nw = newTail()
    println(s"[boot] equal=${o == nw}  old=$o  new=$nw")
    for (r <- 1 to reps) {
      var t0 = System.nanoTime()
      oldTail()
      println(f"[boot] old rep$r: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      t0 = System.nanoTime()
      newTail()
      println(f"[boot] new rep$r: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
