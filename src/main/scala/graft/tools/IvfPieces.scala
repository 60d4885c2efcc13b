package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Piece-wise timing of the ivfTopKRerank stages (scratch diagnostics). */
object IvfPieces {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/benchdata/sf10f")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val S = graft.ops.Similarity
    val v = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = v.count()
    def t[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[piece] $name ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }
    val qStep = math.max(1L, n / 200L)
    val queries = v.where(pmod(col("vec_id"), lit(qStep)) === 0)
    t("rerank(probe=100,pool=16)")(
      S.ivfTopKRerank(v, queries, "vec_id", "embedding", 10, 1000, 100,
        corpusSize = Some(n), poolFactor = 16).count())
    spark.stop()
  }
}
