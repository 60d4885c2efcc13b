package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Probe3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"[probe] $label%-40s ${(System.nanoTime - t0) / 1e9}%8.2f s"); r
    }
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val rep = df.select(col("doc_id"), col("text")).repartition(32)
    val sh = rep.select(col("doc_id"),
      graft.ops.Dedup.charShingles(graft.ops.TextAnalysis.normalize(col("text")), 5).as("shingles"))
    val shc = sh.cache()
    time("materialize shingle cache")(shc.count())
    time("hash over CACHED shingles")(
      shc.select(sum(size(transform(col("shingles"), s => xxhash64(s))))).head())
    time("hash over tokens (no distinct)")(
      rep.select(sum(size(transform(split(col("text"), " "), s => xxhash64(s))))).head())
    val pos = rep.select(sum(size(transform(
      sequence(lit(0), greatest(length(col("text")) - 5, lit(0))),
      i => col("text").substr(i + 1, lit(5)))))).as("x")
    time("substr shingles, no distinct/filter")(pos.head())
    time("array_distinct only")(
      rep.select(sum(size(array_distinct(transform(
        sequence(lit(0), greatest(length(col("text")) - 5, lit(0))),
        i => col("text").substr(i + 1, lit(5))))))).head())
    spark.stop()
  }
}
