package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall frontier probe for the r10 ANN work: margin-ranked multi-probe
  * LSH and sketch-rerank IVF vs the r9 auto paths, on one leg.
  * Usage: runMain graft.tools.AnnFrontier <dir>
  */
object AnnFrontier {
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
    val (bits, tables) = S.lshAutoParams(n, k)
    println(s"[frontier] n=$n auto bits=$bits tables=$tables")
    // r9 baseline: Hamming-1 blind probing, fraction = tables*(bits+1)/2^bits
    def t0ed(name: String, frac: Double)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = recall(mk)
      println(f"[frontier] $name recall=$r%.3f frac=$frac%.4f t=${(System.nanoTime() - t0) / 1e9}%.1fs")
      // no releaseAll here: the truth frame is a registry-tracked
      // checkpoint shared by every measurement
      spark.catalog.clearCache()
    }
    val mode = args.lift(1).getOrElse("lsh")
    if (mode == "lsh") {
      // fixed examined-fraction sweep: tables x ranked-budget combos all at
      // ~ tables*budget/2^bits = the r9 bound 0.156
      for ((b, tb, budget) <- Seq(
          (bits + 2, 8, 4 * (bits + 1)),     // r10 best so far
          (bits + 3, 8, 79),                 // all Hamming<=2 probes at 12 bits
          (bits + 2, 12, 27),
          (bits + 2, 10, 32),
          (bits + 3, 12, 53))) {
        val f = tb.toDouble * budget / (1L << b)
        t0ed(s"lsh_ranked(bits=$b,t=$tb,b=$budget)", f)(
          S.lshTopK(v, queries, "vec_id", "embedding", k, b, 64, true, tb,
            probeBudget = budget))
      }
    } else if (mode == "ivf") {
      // finer cells at the SAME exact-scored fraction: geometry is the
      // recall lever once assignment is codegen'd
      for ((cents, probe, iters) <- Seq(
          (6000, 600, 1), (8000, 800, 1))) {
        t0ed(s"ivf(c=$cents,p=$probe,it=$iters)", probe.toDouble / cents)(
          S.ivfTopK(v, queries, "vec_id", "embedding", k, cents, probe,
            kmeansIters = iters, corpusSize = Some(n)))
      }
    } else {
      // IMI: product cells — assignment cost 2·cellsPerHalf HALF-dots per
      // vector (vs `cells` full dots flat), cells = cellsPerHalf²
      for ((cph, probe, shortlist) <- Seq(
          (128, 1638, 96), (128, 819, 64), (256, 6554, 192))) {
        t0ed(s"imi(cph=$cph,p=$probe,sl=$shortlist)",
          probe.toDouble / (cph.toDouble * cph))(
          S.imiTopK(v, queries, "vec_id", "embedding", k,
            cellsPerHalf = cph, nProbeCells = probe, halfShortlist = shortlist,
            corpusSize = Some(n)))
      }
    }
    spark.stop()
  }
}
