package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro-profiler for the dedup subplans (not part of the library
  * surface; run with `sbt "runMain graft.tools.Probe <sfDir>"`).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"[probe] $label%-30s ${(System.nanoTime - t0) / 1e9}%8.2f s"); r
    }
    val df = spark.read.parquet(s"$dir/documents.parquet")
    val signed = graft.ops.Dedup.minhashed(df, "text", "doc_id").cache()
    time("signature materialize")(signed.count())
    val buckets = graft.ops.Dedup.lshBuckets(signed, "doc_id", 16)
    time("buckets count")(buckets.count())
    val cands = graft.ops.Dedup.lshCandidatePairs(buckets, "doc_id")
    val nc = time("candidates count")(cands.count())
    println(s"[probe] n candidates = $nc")
    import graft.functions.LongArraySim.{jaccardSorted, matchingFraction}
    val sides = signed.select(col("doc_id"), col("shingle_hashes"), col("signature"))
    val joined = cands
      .join(sides.select(col("doc_id").as("id1"), col("shingle_hashes").as("sh1"),
        col("signature").as("sig1")), "id1")
      .join(sides.select(col("doc_id").as("id2"), col("shingle_hashes").as("sh2"),
        col("signature").as("sig2")), "id2")
    time("verification join only")(joined.count())
    val withEst = joined
      .where(matchingFraction(col("sig1"), col("sig2")) >= 0.35)
    val ne = time("est prefilter")(withEst.count())
    println(s"[probe] n est survivors = $ne")
    val jac = withEst
      .withColumn("jaccard", jaccardSorted(col("sh1"), col("sh2")))
      .where(col("jaccard") >= 0.6)
    time("exact jaccard on survivors")(jac.count())
    val full = graft.ops.Dedup.minhashNearDups(df, "text", "doc_id")
    time("full minhashNearDups")(full.count())
    val nj = graft.ops.Dedup.ngramJaccardPairs(df, "text", "doc_id")
    time("full ngramJaccardPairs")(nj.count())
    spark.stop()
  }
}
