package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15: same-JVM A/B of the staged-verify STAGE 1 (signature-agreement
  * prefilter over the candidate pairs) — full-width array<long> signatures
  * vs the low-16-bit array<smallint> narrowing. Alternating reps over the
  * same checkpointed candidate set so window drift hits both arms.
  * Usage: runMain graft.tools.RebandStage1AB <dir> <indexPath> [reps]
  */
object RebandStage1AB {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val path = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
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
    import graft.functions.LongArraySim.matchingFraction
    val newShard = docs.where(col("doc_id") % 3 === 0)
    val idx = DedupIndex.open(spark, path)
    val m = idx.meta
    val idCol = m.idCol
    val bucketsA = graft.core.Blocks.checkpoint(
      Dedup.lshBuckets(
        Dedup.minhashSignatures(newShard, "text", idCol, m.shingleK, m.numHashes),
        idCol, m.bands).where(col(idCol).isNotNull))
    val cappedA = bucketsA.join(
      bucketsA.groupBy("band", "bucket").agg(count(lit(1)).as("dj_bn"))
        .where(col("dj_bn") <= 1000000).select("band", "bucket"),
      Seq("band", "bucket"))
    val cappedB = idx.buckets.join(
      idx.sizes.where(col("dj_bn") <= 1000000).select("band", "bucket"),
      Seq("band", "bucket"))
    val candidates = graft.core.Blocks.checkpoint(
      cappedA.select(col("band"), col("bucket"), col(idCol).as("id1"))
        .join(cappedB.select(col("band"), col("bucket"), col(idCol).as("id2")),
          Seq("band", "bucket"))
        .select("id1", "id2").distinct())
    val nCand = candidates.count()
    println(s"[s1ab] nCand=$nCand")
    val sidesA = Dedup.minhashed(newShard, "text", idCol, m.shingleK, m.numHashes)
      .select(col(idCol), col("signature"))
    val sidesB = idx.payload.select(col(idCol), col("signature"))
    def narrowed(sides: org.apache.spark.sql.DataFrame) = sides.select(
      col(idCol),
      transform(col("signature"),
        x => (x.bitwiseAND(lit(0xFFFFL)) - lit(32768L)).cast("smallint"))
        .as("signature"))
    val estCutoff = 0.35
    def arm(name: String, a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val surv = Dedup.verifyPairs(candidates, nCand, a, b, idCol,
        Seq("signature" -> "sig"))
        .where(matchingFraction(col("sig1"), col("sig2")) >= estCutoff)
        .select(col("id1"), col("id2"))
      surv.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[s1ab] $name: $dt%.2fs")
    }
    // survivor-count sanity once per arm
    def survCount(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Long =
      Dedup.verifyPairs(candidates, nCand, a, b, idCol, Seq("signature" -> "sig"))
        .where(matchingFraction(col("sig1"), col("sig2")) >= estCutoff)
        .count()
    println(s"[s1ab] nSurv long=${survCount(sidesA, sidesB)} " +
      s"short=${survCount(narrowed(sidesA), narrowed(sidesB))}")
    // shuffled-hash variant: build side = the SIGNATURE side (per-partition
    // corpus slice, AQE-bounded), never the pair side (the r14 OOM)
    def armShj(name: String, a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      def side(s: org.apache.spark.sql.DataFrame, n: Int) = s.select(
        col(idCol).as(s"id$n"), col("signature").as(s"sig$n"))
      val surv = candidates
        .join(side(a, 1).hint("shuffle_hash"), "id1")
        .join(side(b, 2).hint("shuffle_hash"), "id2")
        .where(matchingFraction(col("sig1"), col("sig2")) >= estCutoff)
        .select(col("id1"), col("id2"))
      surv.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[s1ab] $name: $dt%.2fs")
    }
    for (r <- 1 to reps) {
      arm(s"long  rep$r", sidesA, sidesB)
      arm(s"short rep$r", narrowed(sidesA), narrowed(sidesB))
      armShj(s"shortshj rep$r", narrowed(sidesA), narrowed(sidesB))
    }
    spark.stop()
  }
}
