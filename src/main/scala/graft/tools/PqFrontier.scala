package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: ivfpq recall on a hard leg with the refined (1-Lloyd-round)
  * quantizer + auto-sized pool — the configuration the bench recall
  * harness ships after the r12 frontier finding.
  */
object PqFrontier {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10f_probe")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val S = graft.ops.Similarity
    val v = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = v.count()
    val k = 10
    val (cents, probe) = S.ivfAutoParams(n, k)
    val qStep = math.max(1L, n / 200L)
    val queries = v.where(pmod(col("vec_id"), lit(qStep)) === 0)
    val truth = graft.core.Blocks.checkpoint(
      S.bruteForceTopK(v, queries, "vec_id", "embedding", k)
        .select(col("query_id"), col("neighbor_id")))
    val nTruth = truth.count().toDouble
    for (residual <- Seq(false, true)) {
      val (pf, probeRec) = graft.ops.Pq.autoPoolFactor(
        v, "vec_id", "embedding", k, nCentroids = cents, nProbe = probe,
        m = 8, ks = 256, recallTarget = 0.85, kmeansIters = 1, pqIters = 1,
        corpusSize = Some(n), residual = residual)
      val approx = graft.ops.Pq.ivfpqTopK(
        v, queries, "vec_id", "embedding", k,
        nCentroids = cents, nProbe = probe, m = 8, ks = 256, poolFactor = pf,
        kmeansIters = 1, pqIters = 1, corpusSize = Some(n), residual = residual)
      val rec = truth.join(
        approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi").count() / nTruth
      println(s"PQFRONTIER residual=$residual pool=$pf probe_recall=$probeRec measured=$rec")
    }
    spark.stop()
  }
}
