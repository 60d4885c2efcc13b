package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15 scratch: literal vs kernel assignment path equality on real data. */
object SemEqCheck {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    for (p <- Seq(1, 2)) {
      def run(maxLit: Int) = {
        val r = graft.ops.Similarity.semanticNearDups(
          emb, "vec_id", "embedding", threshold = 0.3495,
          nClusters = 64, lloydIters = 0, corpusSize = Some(1), probes = p,
          maxLiteralCentroids = maxLit)
          .select(col("id1"), col("id2"), col("cluster"),
            round(col("cosine"), 9).as("c9"))
          .collect()
          .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
          .toSet
        graft.core.Blocks.releaseAll()
        r
      }
      val lit = run(512)
      val ker = run(0)
      println(s"[semeq] probes=$p lit=${lit.size} ker=${ker.size} equal=${lit == ker}")
      if (lit != ker) {
        (lit -- ker).take(5).foreach(x => println(s"[semeq]   only-lit $x"))
        (ker -- lit).take(5).foreach(x => println(s"[semeq]   only-ker $x"))
      }
    }
    spark.stop()
  }
}
