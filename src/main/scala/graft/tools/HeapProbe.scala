package graft.tools

import org.apache.spark.sql.SparkSession

/** Heap high-water audit (r8 verdict item 6): the 20 GB+ heap snapshots on
  * q_span_removal / q_classifier_score / q_date_gaps in one 32-core JVM are
  * claimed to be PER-TASK aggregation state that partitions out on a real
  * cluster. This probe measures the claim: run a query at two parallelism
  * levels in fresh sessions and report the heap-pool peak for each —
  * per-task state scales with concurrent tasks (local[8] ≈ ¼ the
  * residency of local[32]); a driver-side or per-JVM accumulation would
  * not move.
  *
  * Usage: runMain graft.tools.HeapProbe <sfDir> <query>[,<query>...] [cpusCsv]
  */
object HeapProbe {
  private def resetHeapPeaks(): Unit = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .foreach(p => try p.resetPeakUsage() catch { case _: Throwable => })
  }

  private def heapPeakMb(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .map(p => try p.getPeakUsage.getUsed catch { case _: Throwable => 0L })
      .sum >> 20
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val cpusList = args.lift(2).getOrElse("32,8").split(",").map(_.toInt).toSeq
    for (cpus <- cpusList) {
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
          graft.core.Tuning.wideStart(dir, cpus))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      names.foreach { name =>
        val fn = graft.SparkEntry.queries(name)
        fn(spark, dir).count() // warm: JIT + page cache out of the measure
        System.gc()
        Thread.sleep(200)
        resetHeapPeaks()
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[heap] cpus=$cpus $name peak=${heapPeakMb()}MB t=$t%.2fs")
        spark.catalog.clearCache()
        graft.core.Blocks.releaseAll()
      }
      spark.stop()
      // a stopped context leaves its session registered; clear so the next
      // builder call creates a fresh one at the new core count
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
