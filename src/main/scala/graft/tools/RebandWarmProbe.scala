package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15: WARM stage decomposition of the full q_rebanded_dedup flow — two
  * full repetitions of incrementalNearDups' stages (rep 1 carries codegen
  * and parquet-footer warm-up, rep 2 is what the bench's timed runs see).
  * Usage: runMain graft.tools.RebandWarmProbe <dir> <indexPath>
  */
object RebandWarmProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val path = args(1)
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
    import graft.ops.Dedup
    import graft.sources.DedupIndex
    val newShard = docs.where(col("doc_id") % 3 === 0)
    for (rep <- 1 to 2) {
      def step[T](name: String)(body: => T): T = {
        val t0 = System.nanoTime()
        val r = body
        println(f"[rw$rep] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
        r
      }
      val tAll = System.nanoTime()
      val out = step("incrementalNearDups construct (eager stages)") {
        DedupIndex.incrementalNearDups(
          newShard, "text", path, threshold = 0.6, maxBucketSize = 1000000)
      }
      step("final action (noop-equivalent count of lazy verify)") {
        val n = out
          .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
          .count()
        println(s"[rw$rep]   pairs=$n")
      }
      println(f"[rw$rep] TOTAL: ${(System.nanoTime() - tAll) / 1e9}%.2fs")
      graft.core.Blocks.releaseAll()
    }
    // per-stage decomposition on a third warm rep, inlined
    val idx = DedupIndex.open(spark, path)
    val m = idx.meta
    val idCol = m.idCol
    val maxBucketSize = 1000000
    def step[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[rw3] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val signedA = Dedup.minhashSignatures(
      newShard, "text", idCol, m.shingleK, m.numHashes)
    val bucketsA = step("bucketsA ckpt (shingle+sig+band shard)")(
      graft.core.Blocks.checkpoint(
        Dedup.lshBuckets(signedA, idCol, m.bands).where(col(idCol).isNotNull)))
    val cappedA = bucketsA.join(
      bucketsA.groupBy("band", "bucket").agg(count(lit(1)).as("dj_bn"))
        .where(col("dj_bn") <= maxBucketSize)
        .select("band", "bucket"),
      Seq("band", "bucket"))
    val cappedB = idx.buckets.join(
      idx.sizes.where(col("dj_bn") <= maxBucketSize)
        .select("band", "bucket"),
      Seq("band", "bucket"))
    val candidates = step("candidate distinct ckpt")(graft.core.Blocks.checkpoint(
      cappedA
        .select(col("band"), col("bucket"), col(idCol).as("id1"))
        .join(
          cappedB.select(col("band"), col("bucket"), col(idCol).as("id2")),
          Seq("band", "bucket"))
        .select("id1", "id2")
        .distinct()))
    val nCand = step("candidate count")(candidates.count())
    println(s"[rw3] nCand=$nCand")
    val sidesA = Dedup.minhashed(newShard, "text", idCol, m.shingleK, m.numHashes)
      .select(col(idCol), col("shingle_hashes"), col("signature"))
    val sidesB = idx.payload
    val estCutoff = 0.35
    import graft.functions.LongArraySim.{jaccardSorted, matchingFraction}
    val survivors = step("stage1 sig-prefilter ckpt") {
      graft.core.Blocks.checkpoint(
        Dedup.verifyPairs(candidates, nCand,
          sidesA.select(col(idCol), col("signature")),
          sidesB.select(col(idCol), col("signature")),
          idCol, Seq("signature" -> "sig"))
          .where(matchingFraction(col("sig1"), col("sig2")) >= estCutoff)
          .select(col("id1"), col("id2")))
    }
    val nSurv = step("survivor count")(survivors.count())
    println(s"[rw3] nSurv=$nSurv")
    step("stage2 exact verify + action") {
      val n = Dedup.verifyPairs(survivors, nSurv,
        sidesA.select(col(idCol), col("shingle_hashes")),
        sidesB.select(col(idCol), col("shingle_hashes")),
        idCol, Seq("shingle_hashes" -> "sh"))
        .withColumn("jaccard", jaccardSorted(col("sh1"), col("sh2")))
        .where(col("jaccard") >= 0.6)
        .count()
      println(s"[rw3] pairs=$n")
    }
    spark.stop()
  }
}
