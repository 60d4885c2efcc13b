package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Parameter sweep for the ANN auto-sizing formulas: recall@10 (and pair
  * recall for semanticNearDups) on the UNREPLICATED honest leg, with the
  * examined-candidate fraction next to each number — the cost the recall
  * was bought at. Usage: runMain graft.tools.AnnSweep <dir>
  */
object AnnSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    val nq = queries.count()
    val truth = graft.core.Blocks.checkpoint(
      S.bruteForceTopK(v, queries, "vec_id", "embedding", k)
        .select(col("query_id"), col("neighbor_id")))
    val nTruth = truth.count().toDouble
    def recall(approx: org.apache.spark.sql.DataFrame): Double =
      truth.join(
        approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi").count() / nTruth

    println(s"[sweep] n=$n nq=$nq nTruth=${nTruth.toLong}")
    for (bits <- Seq(2, 3, 4, 5, 6, 8); tables <- Seq(1, 2, 4, 8)) {
      val t0 = System.nanoTime()
      val r = recall(S.lshTopK(v, queries, "vec_id", "embedding", k,
        bits = bits, nTables = tables))
      // examined fraction upper bound: probe set is (bits+1) buckets/table
      val frac = math.min(1.0, tables.toDouble * (bits + 1) / (1L << bits))
      println(f"[lsh] bits=$bits tables=$tables recall=$r%.3f fracBound=$frac%.3f t=${(System.nanoTime()-t0)/1e9}%.1fs")
    }
    for (cents <- Seq(10, 16, 32); probe <- Seq(4, 8, 11, 12, 14, 22)) {
      if (probe <= cents) {
        val t0 = System.nanoTime()
        val r = recall(S.ivfTopK(v, queries, "vec_id", "embedding", k,
          nCentroids = cents, nProbe = probe, corpusSize = Some(n)))
        println(f"[ivf] k=$cents probe=$probe recall=$r%.3f frac=${probe.toDouble/cents}%.2f t=${(System.nanoTime()-t0)/1e9}%.1fs")
      }
    }
    // semantic pair recall at the gate threshold on a bounded subsample
    val pairStep = math.max(10L, n / 2000L)
    val sub = v.where(pmod(col("vec_id"), lit(pairStep)) === 0)
    val subCount = sub.count()
    val thr = 0.3495
    val a = sub.select(col("vec_id").as("pid1"), col("embedding").as("e1"))
    val b = sub.select(col("vec_id").as("pid2"), col("embedding").as("e2"))
    val truthPairs = graft.core.Blocks.checkpoint(
      a.join(b, col("pid1") < col("pid2"))
        .where(S.cosineF(col("e1"), col("e2")) >= thr)
        .select(col("pid1"), col("pid2")))
    val nPairs = truthPairs.count().toDouble
    println(s"[sweep] subCount=$subCount nPairs=${nPairs.toLong}")
    for (probes <- Seq(1, 2, 4, 6, 8)) {
      val t0 = System.nanoTime()
      val pairs = S.semanticNearDups(
        sub, "vec_id", "embedding", thr,
        nClusters = S.semanticClusters(subCount),
        corpusSize = Some(subCount), probes = probes)
        .select(
          least(col("id1"), col("id2")).as("pid1"),
          greatest(col("id1"), col("id2")).as("pid2"))
      val r = truthPairs.join(pairs, Seq("pid1", "pid2"), "left_semi").count() / nPairs
      println(f"[sem] probes=$probes clusters=${S.semanticClusters(subCount)} recall=$r%.3f t=${(System.nanoTime()-t0)/1e9}%.1fs")
    }
    spark.stop()
  }
}
