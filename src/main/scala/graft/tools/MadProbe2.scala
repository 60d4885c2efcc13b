package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15: phase-level decomposition of the fused madOutliers internals. */
object MadProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
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
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"))
    for (r <- 1 to reps) {
      def step[T](name: String)(body: => T): T = {
        val t0 = System.nanoTime()
        val res = body
        println(f"[mad2 rep$r] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
        res
      }
      val base = orders.where(col("o_totalprice").isNotNull)
          .withColumn("dj_v",
            round(col("o_totalprice") * 100).cast("decimal(38,0)"))
      val counts = step("counts ckptLazy")(graft.core.Blocks.checkpointLazy(
        base.groupBy(col("dj_v").as("dj_ov")).agg(count(lit(1)).as("dj_cnt"))))
      val Some((bounds, totals)) = step("estimateBoundaries job")(
        graft.ops.CumSum.estimateBoundaries(counts, "dj_ov", Seq("dj_cnt")))
      val n = totals.head
      val r1 = (n + 1) / 2
      val r2 = (n + 2) / 2
      val running = step("sel1 bucket-totals collect (withRunningSumsAt)")(
        graft.ops.CumSum.withRunningSumsAt(
          counts, "dj_ov", Seq("dj_cnt"), Seq("dj_cum"), bounds))
      val row = step("sel1 min-when head")(running.agg(
        min(when(col("dj_cum") >= r1, col("dj_ov"))).as("v1"),
        min(when(col("dj_cum") >= r2, col("dj_ov"))).as("v2")).head())
      val mm2 = row.getDecimal(0).add(row.getDecimal(1))
      val devCounts = graft.core.Blocks.checkpointLazy(
        counts.groupBy(
          abs(col("dj_ov") * 2 - lit(mm2).cast("decimal(38,0)")).as("dj_ov"))
          .agg(sum(col("dj_cnt")).as("dj_cnt")))
      val m2d = mm2.doubleValue
      val devBounds =
        (bounds.map(b => math.abs(2 * b - m2d)) :+ 0.0).distinct.sorted
      val running2 = step("sel2 bucket-totals collect (withRunningSumsAt)")(
        graft.ops.CumSum.withRunningSumsAt(
          devCounts, "dj_ov", Seq("dj_cnt"), Seq("dj_cum"), devBounds))
      val row2 = step("sel2 min-when head")(running2.agg(
        min(when(col("dj_cum") >= r1, col("dj_ov"))).as("v1"),
        min(when(col("dj_cum") >= r2, col("dj_ov"))).as("v2")).head())
      println(s"[mad2 rep$r] d2=${row2.getDecimal(0).add(row2.getDecimal(1))}")
      graft.core.Blocks.releaseAll()
    }
    spark.stop()
  }
}
