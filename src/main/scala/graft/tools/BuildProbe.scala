package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fine-grained decomposition of DedupIndex.build at sf0.1 (r14: ~14 s
  * where ~3 s looks right): minhash pass vs each bucketed write vs DDL.
  * Usage: runMain graft.tools.BuildProbe <dir>
  */
object BuildProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        graft.core.Tuning.wideStart(dir, cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") % 3 === 1)
    val path = java.nio.file.Files
      .createTempDirectory("graft_build_probe").toString
    def step[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[build] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    import graft.ops.Dedup
    val nBuckets = 32
    val payload = step("minhashed construct (checkpoint)")(
      Dedup.minhashed(docs, "text", "doc_id", 5, 64)
        .select(col("doc_id"), col("shingle_hashes"), col("signature")))
    step("payload count")(payload.count())
    step("payload write")(
      payload.repartition(nBuckets, col("doc_id")).write
        .mode("overwrite")
        .bucketBy(nBuckets, "doc_id")
        .sortBy("doc_id")
        .option("path", new java.io.File(s"$path/payload").getAbsolutePath)
        .saveAsTable("g_probe_payload"))
    val signed = spark.table("g_probe_payload")
      .select(col("doc_id"), col("signature"))
    val buckets = Dedup.lshBuckets(signed, "doc_id", 16)
      .where(col("doc_id").isNotNull)
    step("buckets write")(
      buckets.repartition(nBuckets, col("band"), col("bucket")).write
        .mode("overwrite")
        .bucketBy(nBuckets, "band", "bucket")
        .sortBy("band", "bucket")
        .option("path", new java.io.File(s"$path/buckets").getAbsolutePath)
        .saveAsTable("g_probe_buckets"))
    val bucketsDf = spark.table("g_probe_buckets")
    step("sizes write")(
      bucketsDf.groupBy("band", "bucket").agg(count(lit(1)).as("dj_bn"))
        .write
        .mode("overwrite")
        .bucketBy(nBuckets, "band", "bucket")
        .sortBy("band", "bucket")
        .option("path", new java.io.File(s"$path/sizes").getAbsolutePath)
        .saveAsTable("g_probe_sizes"))
    println("[build] files: payload=" +
      new java.io.File(s"$path/payload").listFiles().count(_.getName.endsWith(".parquet")) +
      " buckets=" +
      new java.io.File(s"$path/buckets").listFiles().count(_.getName.endsWith(".parquet")) +
      " sizes=" +
      new java.io.File(s"$path/sizes").listFiles().count(_.getName.endsWith(".parquet")))
    graft.core.Blocks.releaseAll()
    spark.stop()
  }
}
