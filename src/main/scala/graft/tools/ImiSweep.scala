package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement harness for the occupancy-budgeted IMI path
  * (r10 verdict task 3): recall@10 and wall time of `imiTopKAuto` (and a
  * small parameter neighborhood) against brute-force ground truth on a
  * leg directory, printed as [imi] lines. Not part of the bench contract —
  * the bench's annRecall carries the resulting numbers.
  */
object ImiSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/benchdata/sf10f")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val S = graft.ops.Similarity
    val v = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = v.count()
    val k = 10
    val qStep = math.max(1L, n / 200L)
    val queries = v.where(pmod(col("vec_id"), lit(qStep)) === 0)
    val truth = graft.core.Blocks.checkpoint(
      S.bruteForceTopK(v, queries, "vec_id", "embedding", k)
        .select(col("query_id"), col("neighbor_id")))
    val nTruth = truth.count().toDouble
    def recall(approx: org.apache.spark.sql.DataFrame): Double =
      truth.join(
        approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi").count() / nTruth
    val (cphA, slA, budA) = S.imiAutoParams(n, k)
    println(s"[imi] n=$n auto cph=$cphA shortlist=$slA budget=$budA " +
      s"(fraction=${budA.toDouble / n}) dispatch=${S.annAutoMethod(n, k)}")
    def run(tag: String, cph: Int, sl: Int, budget: Long): Unit = {
      val t0 = System.nanoTime()
      val r = recall(S.imiTopK(
        v, queries, "vec_id", "embedding", k,
        cellsPerHalf = cph, nProbeCells = sl * sl, halfShortlist = sl,
        kmeansIters = 1, corpusSize = Some(n),
        probeRowBudget = Some(budget)))
      println(f"[imi] $tag cph=$cph sl=$sl budget=$budget " +
        f"recall=$r%.3f t=${(System.nanoTime() - t0) / 1e9}%.1fs")
      graft.core.Blocks.releaseAll()
      spark.catalog.clearCache()
      // re-pin the truth frame for the next measurement
      ()
    }
    // releaseAll drops the truth checkpoint too — hold it via re-checkpoint
    // per run instead: simplest is to measure sequentially with a fresh
    // truth reference
    def runFresh(tag: String, cph: Int, sl: Int, budget: Long): Unit = {
      val tr = graft.core.Blocks.checkpoint(
        S.bruteForceTopK(v, queries, "vec_id", "embedding", k)
          .select(col("query_id"), col("neighbor_id")))
      val nT = tr.count().toDouble
      val t0 = System.nanoTime()
      val approx = S.imiTopK(
        v, queries, "vec_id", "embedding", k,
        cellsPerHalf = cph, nProbeCells = sl * sl, halfShortlist = sl,
        kmeansIters = 1, corpusSize = Some(n),
        probeRowBudget = Some(budget))
      val r = tr.join(
        approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi").count() / nT
      println(f"[imi] $tag cph=$cph sl=$sl budget=$budget " +
        f"recall=$r%.3f t=${(System.nanoTime() - t0) / 1e9}%.1fs")
      graft.core.Blocks.releaseAll()
      spark.catalog.clearCache()
    }
    def runIters(tag: String, cph: Int, sl: Int, budget: Long, iters: Int): Unit = {
      val tr = graft.core.Blocks.checkpoint(
        S.bruteForceTopK(v, queries, "vec_id", "embedding", k)
          .select(col("query_id"), col("neighbor_id")))
      val nT = tr.count().toDouble
      val t0 = System.nanoTime()
      val approx = S.imiTopK(
        v, queries, "vec_id", "embedding", k,
        cellsPerHalf = cph, nProbeCells = sl * sl, halfShortlist = sl,
        kmeansIters = iters, corpusSize = Some(n),
        probeRowBudget = Some(budget))
      val r = tr.join(
        approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi").count() / nT
      println(f"[imi] $tag cph=$cph sl=$sl budget=$budget iters=$iters " +
        f"recall=$r%.3f t=${(System.nanoTime() - t0) / 1e9}%.1fs")
      graft.core.Blocks.releaseAll()
      spark.catalog.clearCache()
    }
    args.drop(1).headOption match {
      case Some("sweep") =>
        run("auto", cphA, slA, budA)
        runFresh("cph128", 128, 128, budA)
        runFresh("cph256", 256, 192, budA)
        runFresh("budget-half", cphA, slA, math.max(1L, budA / 2))
      case Some("sweep2") =>
        runIters("iters2", cphA, slA, budA, 2)
        runIters("iters3", cphA, slA, budA, 3)
        runIters("cph320-sl256", 320, 256, budA, 1)
        runIters("cph224-sl256", 224, 224, budA, 1)
      case Some("sweep3") =>
        runIters("cph448-sl256", 448, 256, budA, 1)
        runIters("cph512-sl256", 512, 256, budA, 1)
        runIters("cph448-sl320", 448, 320, budA, 1)
        runIters("cph448-sl256-it2", 448, 256, budA, 2)
      case _ =>
        run("auto", cphA, slA, budA)
    }
    spark.stop()
  }
}
