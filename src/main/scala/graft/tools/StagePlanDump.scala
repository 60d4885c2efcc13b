package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15 plan evidence for the stages not visible in gate-level explains:
  * the staged-verify stage-1 prefilter (full-width vs narrowed
  * signatures) and the semantic assignment projection (literal
  * transform+array_sort vs NearestCellsCos kernel). Writes
  * plans/r15/<name>.txt.
  * Usage: runMain graft.tools.StagePlanDump <dir> <rebandIndexPath>
  */
object StagePlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val path = args(1)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def write(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"plans/r15/$name.txt"),
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
      println(s"[dump] $name")
    }
    // ---- reband stage 1 arms ----
    import graft.ops.Dedup
    import graft.sources.DedupIndex
    import graft.functions.LongArraySim.matchingFraction
    val docs = spark.read.parquet(s"$dir/documents.parquet")
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
    val sidesA = Dedup.minhashed(newShard, "text", idCol, m.shingleK, m.numHashes)
      .select(col(idCol), col("signature"))
    val sidesB = idx.payload.select(col(idCol), col("signature"))
    def narrowed(sides: org.apache.spark.sql.DataFrame) = sides.select(
      col(idCol),
      transform(col("signature"),
        x => (x.bitwiseAND(lit(0xFFFFL)) - lit(32768L)).cast("smallint"))
        .as("signature"))
    def stage1(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame) =
      Dedup.verifyPairs(candidates, nCand, a, b, idCol,
        Seq("signature" -> "sig"))
        .where(matchingFraction(col("sig1"), col("sig2")) >= 0.35)
        .select(col("id1"), col("id2"))
    write("reband_stage1_long", stage1(sidesA, sidesB))
    write("reband_stage1_short", stage1(narrowed(sidesA), narrowed(sidesB)))
    // ---- semantic assignment arms ----
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .where(col("vec_id").isNotNull && col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding").as("vec"))
    val cents = graft.ops.Similarity.fitCentroids(
      emb, "vec_id", "vec", 64, 0, Some(1))
    val withNorms = cents.map { case (cid, v) =>
      (cid, v, math.sqrt(v.map(x => x * x).sum)) }
    import graft.functions.NearestCellsCos.nearestCellsCos
    val kernel = emb.select(col("vec_id"),
      element_at(nearestCellsCos(col("vec"),
        withNorms.map { case (cid, v, _) => (cid, v) },
        withNorms.map(_._3), 1, divideByRowNorm = true, round6 = true), 1)
        .as("cluster"))
    write("semantic_assign_kernel", kernel)
    import graft.functions.DotProductFloat.dotF
    val centroidArrN = array(withNorms.map { case (cid, v, nrm) =>
      struct(lit(cid).as("cid"), array(v.map(x => lit(x.toFloat)): _*).as("cvec"),
        lit(nrm).as("cnorm")) }: _*)
    val sortedCids = transform(
      array_sort(transform(centroidArrN, c => struct(
        (-round(dotF(col("vec"), c.getField("cvec")) /
          (col("dj_nrm") * c.getField("cnorm")), 6)).as("neg"),
        c.getField("cid").as("cid")))),
      s => s.getField("cid"))
    val literal = emb
      .withColumn("dj_nrm", sqrt(aggregate(col("vec"),
        lit(0.0), (acc, x) => acc + x * x)))
      .select(col("vec_id"), element_at(sortedCids, 1).as("cluster"))
    write("semantic_assign_literal", literal)
    spark.stop()
  }
}
