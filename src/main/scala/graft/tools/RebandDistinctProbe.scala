package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r15: decompose the q_rebanded_dedup candidate-distinct (the 4.4 s step
  * RebandQueryProbe attributes to `distinct checkpoint`): print the
  * executed plan of the current spelling and time join-strategy variants
  * (SMJ as planned vs shuffle_hash-hinted candidate join) — all variants
  * compute the identical candidate set.
  * Usage: runMain graft.tools.RebandDistinctProbe <dir> <indexPath> [variant...]
  */
object RebandDistinctProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val path = args(1)
    val variants =
      if (args.length > 2) args.drop(2).toSet else Set("explain", "a", "b")
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
    def step[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[rd] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    import graft.ops.Dedup
    import graft.sources.DedupIndex
    val newShard = docs.where(col("doc_id") % 3 === 0)
    val idx = DedupIndex.open(spark, path)
    val m = idx.meta
    val idCol = m.idCol
    val maxBucketSize = 1000000
    val signedA = Dedup.minhashSignatures(
      newShard, "text", idCol, m.shingleK, m.numHashes)
    val bucketsA = step("bucketsA checkpoint")(graft.core.Blocks.checkpoint(
      Dedup.lshBuckets(signedA, idCol, m.bands).where(col(idCol).isNotNull)))
    def cappedASide(hint: Option[String]): DataFrame = {
      val sizesA = bucketsA.groupBy("band", "bucket")
        .agg(count(lit(1)).as("dj_bn"))
        .where(col("dj_bn") <= maxBucketSize)
        .select("band", "bucket")
      bucketsA.join(sizesA, Seq("band", "bucket"))
    }
    val cappedB = idx.buckets.join(
      idx.sizes.where(col("dj_bn") <= maxBucketSize)
        .select("band", "bucket"),
      Seq("band", "bucket"))
    def rawCand(aHint: Option[String]): DataFrame = {
      val a0 = cappedASide(aHint)
        .select(col("band"), col("bucket"), col(idCol).as("id1"))
      val a = aHint.fold(a0)(a0.hint(_))
      a.join(
        cappedB.select(col("band"), col("bucket"), col(idCol).as("id2")),
        Seq("band", "bucket"))
        .select("id1", "id2")
    }
    if (variants("explain")) {
      val d = rawCand(None).distinct()
      println("[rd] ==== current distinct plan (formatted) ====")
      println(d.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    // two timed reps each: first carries codegen warm-up
    for (rep <- 1 to 2) {
      if (variants("a")) {
        val c = step(s"A current distinct ckpt (rep $rep)")(
          graft.core.Blocks.checkpoint(rawCand(None).distinct()))
        step(s"A count (rep $rep)") {
          println(s"[rd]   n=${c.count()}")
        }
        graft.core.Blocks.release(c)
      }
      if (variants("b")) {
        val c = step(s"B shuffle_hash-A distinct ckpt (rep $rep)")(
          graft.core.Blocks.checkpoint(rawCand(Some("shuffle_hash")).distinct()))
        step(s"B count (rep $rep)") {
          println(s"[rd]   n=${c.count()}")
        }
        graft.core.Blocks.release(c)
      }
    }
    if (variants("explain")) {
      println("[rd] ==== shuffle_hash-hinted plan (formatted) ====")
      println(rawCand(Some("shuffle_hash")).distinct().queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
