package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"[probe] $label%-34s ${(System.nanoTime - t0) / 1e9}%8.2f s"); r
    }
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    println(s"[probe] input partitions = ${df.rdd.getNumPartitions}")
    val rep = df.select(col("doc_id"), col("text")).repartition(32)
    println(s"[probe] repartitioned = ${rep.rdd.getNumPartitions}")
    val sh = rep.select(col("doc_id"),
      graft.ops.Dedup.charShingles(graft.ops.TextAnalysis.normalize(col("text")), 5).as("shingles"))
    time("shingles only")(sh.count())
    val hashed = sh.withColumn("dj_hashes", transform(col("shingles"), s => xxhash64(s)))
    time("base hashes")(hashed.select(sum(size(col("dj_hashes")))).head())
    val sig16 = hashed.withColumn("sig", graft.ops.Dedup.minhashSignature(col("dj_hashes"), 16))
    time("signature 16 (no cache)")(sig16.select(sum(size(col("sig")))).head())
    val sig64 = hashed.withColumn("sig", graft.ops.Dedup.minhashSignature(col("dj_hashes"), 64))
    time("signature 64 (no cache)")(sig64.select(sum(size(col("sig")))).head())
    println(s"[probe] sig64 partitions = ${sig64.rdd.getNumPartitions}")
    spark.stop()
  }
}
