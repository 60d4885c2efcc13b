package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only A/B for the as-of join probe-width variants: times the default
  * (full rows through the window sort) against `slimProbes` (rowid sweep +
  * payload join-back) while widening a synthetic payload column.
  * Usage: `sbt "runMain graft.tools.AsofProbe <sfDir> [widths,csv,bytes]"`.
  */
object AsofProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val widths = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(0, 512, 2048, 8192))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val events = spark.read.parquet(s"$dir/events.parquet")
    val right = events.select(col("user_id"), col("ts"), col("value"))
      .where(col("value").isNotNull)
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    widths.foreach { w =>
      // data-dependent payload (constant folding must not elide it), and
      // the consuming aggregate below reads it so column pruning cannot
      // drop the width from the window/join plans — a bare count() would
      // prune the payload and time an unrepresentative slim plan anyway
      val left =
        if (w == 0) events
        else events.withColumn(
          "wide",
          repeat(sha2(col("event_id").cast("string"), 256), math.max(1, w / 64)))
      for (slim <- Seq(false, true)) {
        // warm-up + timed run, bench discipline
        def run(): Long = {
          val out = graft.ops.Events
            .asofJoin(left, right, Seq("user_id"), "ts", "ts", Seq("value"),
              slimProbes = slim)
          if (w == 0) out.count()
          else out.agg(sum(length(col("wide")))).head().getLong(0)
        }
        time(run())
        graft.core.Blocks.releaseAll(); spark.catalog.clearCache()
        val t = time(run())
        graft.core.Blocks.releaseAll(); spark.catalog.clearCache()
        println(f"[asof] width=$w%6d slim=$slim%-5s $t%7.2f s")
      }
    }
    spark.stop()
  }
}
