package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Inline decomposition of incrementalNearDups at the q_rebanded_dedup
  * geometry (bands=32, uncapped buckets): candidate volume, per-stage
  * seconds, survivor counts — pinpoints whether the 54-75 s query is
  * candidate generation, the distinct, or payload-carrying verification.
  * Usage: runMain graft.tools.RebandQueryProbe <dir> <indexPath>
  * (indexPath from a prior RebandProbe run, or rebuilt when absent)
  */
object RebandQueryProbe {
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
    val path = args.lift(1).getOrElse {
      val p = java.nio.file.Files
        .createTempDirectory("graft_rebandq_probe").toString
      graft.sources.DedupIndex.build(
        docs.where(col("doc_id") % 3 === 1), "text", "doc_id", p)
      graft.sources.DedupIndex.append(
        docs.where(col("doc_id") % 3 === 2), "text", p)
      graft.sources.DedupIndex.rebuild(spark, p, bands = 32)
      p
    }
    def step[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[rq] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    import graft.ops.Dedup
    import graft.sources.DedupIndex
    val newShard = docs.where(col("doc_id") % 3 === 0)
    val idx = DedupIndex.open(spark, path)
    val m = idx.meta
    val idCol = m.idCol
    val maxBucketSize = 1000000
    val signedA = step("signedA")(
      Dedup.minhashSignatures(newShard, "text", idCol, m.shingleK, m.numHashes))
    val bucketsA = step("bucketsA checkpoint")(graft.core.Blocks.checkpoint(
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
    val rawCand = cappedA
      .select(col("band"), col("bucket"), col(idCol).as("id1"))
      .join(
        cappedB.select(col("band"), col("bucket"), col(idCol).as("id2")),
        Seq("band", "bucket"))
      .select("id1", "id2")
    val nRaw = step("raw candidate join count")(rawCand.count())
    println(s"[rq] raw candidates (pre-distinct): $nRaw")
    val candidates = step("distinct checkpoint")(
      graft.core.Blocks.checkpoint(rawCand.distinct()))
    val nCand = step("count")(candidates.count())
    println(s"[rq] candidates: $nCand  broadcastCap=${Dedup.pairBroadcastCap(spark)}")
    import graft.functions.LongArraySim.{jaccardSorted, matchingFraction}
    // stage A: signatures only
    val sigs = idx.payload.select(col(idCol), col("signature"))
    val sigShard = Dedup.minhashSignatures(
      newShard, "text", idCol, m.shingleK, m.numHashes)
      .select(col(idCol), col("signature"))
    val estCutoff = 0.35
    val surv = step("sig-prefilter join")(
      candidates
        .join(sigShard.select(col(idCol).as("id1"), col("signature").as("sig1")), "id1")
        .join(sigs.select(col(idCol).as("id2"), col("signature").as("sig2")), "id2")
        .where(matchingFraction(col("sig1"), col("sig2")) >= estCutoff)
        .select("id1", "id2")
        .count())
    println(s"[rq] sig survivors: $surv")
    // current full verify for contrast
    val full = step("current verifyPairs path")(
      DedupIndex.incrementalNearDups(newShard, "text", path,
        threshold = 0.6, maxBucketSize = maxBucketSize).count())
    println(s"[rq] final pairs: $full")
    graft.core.Blocks.releaseAll()
    spark.stop()
  }
}
