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
    val (cphA, slA, budA) = S.imiAutoParams(n, k)
    println(s"[imi] n=$n auto cph=$cphA shortlist=$slA budget=$budA " +
      s"(fraction=${budA.toDouble / n}) dispatch=${S.annAutoMethod(n, k)}")
    // every measurement rebuilds its own truth checkpoint: releaseAll at
    // the end of each run drops ALL tracked checkpoints, so a shared truth
    // frame would be dead for the second measurement
    def run(tag: String, cph: Int, sl: Int, budget: Long, iters: Int = 1): Unit = {
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
        run("cph128", 128, 128, budA)
        run("cph256", 256, 192, budA)
        run("budget-half", cphA, slA, math.max(1L, budA / 2))
      case Some("sweep2") =>
        run("iters2", cphA, slA, budA, iters = 2)
        run("iters3", cphA, slA, budA, iters = 3)
        run("cph320-sl256", 320, 256, budA)
        run("cph224-sl256", 224, 224, budA)
      case Some("sweep3") =>
        run("cph448-sl256", 448, 256, budA)
        run("cph512-sl256", 512, 256, budA)
        run("cph448-sl320", 448, 320, budA)
        run("cph448-sl256-it2", 448, 256, budA, iters = 2)
      case _ =>
        run("auto", cphA, slA, budA)
    }
    spark.stop()
  }
}
