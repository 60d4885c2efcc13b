package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{AnnIndex, DedupIndex}

/** The rebuild-advisor (r11 verdict stretch 7): health reports that
  * recommend rebuild vs compact vs ok from recall, cell occupancy, hot-cell
  * mass, and file layering — spec'd on a deliberately drifted corpus.
  */
class HealthReportSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  private def freshPath(tag: String): String = {
    val p = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_health_spec_$tag")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) { val k = f.listFiles(); if (k != null) k.foreach(rm) }
      f.delete(): Unit
    }
    rm(p)
    p.getAbsolutePath
  }

  test("AnnIndex: fresh build reads ok; drifted append recommends rebuild") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val path = freshPath("ann")
    AnnIndex.build(vecs, "vec_id", "embedding", path,
      nCentroids = 8, kmeansIters = 0, nBuckets = 2)
    val healthy = AnnIndex.healthReport(spark, path, k = 3, nProbe = 8)
    assert(healthy.recommendation == "ok", healthy.toString)
    assert(healthy.recall >= 0.8, s"fresh exhaustive-probe recall: $healthy")
    // drift: a shard of IDENTICAL vectors 3x the corpus — they all land in
    // one cell, so the occupancy says the frozen quantizer no longer
    // matches the data
    val n = vecs.count()
    val dim = vecs.select(size(col("embedding"))).head().getInt(0)
    val constVec = Seq.tabulate(dim)(i => if (i == 0) 1.0f else 0.0f)
    val rows = (0L until 3 * n).map(i => Row(10000000L + i, constVec))
    val drifted = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType, containsNull = true)))))
    AnnIndex.append(drifted, path)
    val report = AnnIndex.healthReport(spark, path, k = 3, nProbe = 8)
    assert(report.maxCellFrac > 0.5, report.toString)
    assert(report.recommendation == "rebuild", report.toString)
  }

  test("AnnIndex: layered-but-healthy index recommends compact") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val path = freshPath("ann_layered")
    AnnIndex.build(vecs.where(col("vec_id") % 6 === 0), "vec_id", "embedding",
      path, nCentroids = 8, kmeansIters = 0, nBuckets = 1)
    (1 to 5).foreach { i =>
      AnnIndex.append(vecs.where(col("vec_id") % 6 === i), path)
    }
    val report = AnnIndex.healthReport(spark, path, k = 3, nProbe = 8)
    assert(report.filesPerBucket > 4.0, report.toString)
    assert(report.recommendation == "compact", report.toString)
    AnnIndex.compact(spark, path)
    assert(AnnIndex.healthReport(spark, path, k = 3, nProbe = 8)
      .recommendation == "ok")
  }

  test("AnnIndex.rebuild refits the drifted quantizer and restores health") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val path = freshPath("ann_rebuild")
    AnnIndex.build(vecs, "vec_id", "embedding", path,
      nCentroids = 8, kmeansIters = 0, nBuckets = 2, pq = Some((4, 16)), pqIters = 0)
    val n = vecs.count()
    val dim = vecs.select(size(col("embedding"))).head().getInt(0)
    val constVec = Seq.tabulate(dim)(i => if (i == 0) 1.0f else 0.0f)
    val rows = (0L until 3 * n).map(i => Row(10000000L + i, constVec))
    val drifted = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType, containsNull = true)))))
    AnnIndex.append(drifted, path)
    assert(AnnIndex.healthReport(spark, path, k = 3, nProbe = 8)
      .recommendation == "rebuild")
    val meta = AnnIndex.rebuild(spark, path, nCentroids = Some(16),
      kmeansIters = Some(1))
    assert(meta.pqM == 4, "rebuild dropped the PQ carriage")
    val report = AnnIndex.healthReport(
      spark, path, k = 3, nProbe = 16, maxCellFracLimit = 0.95)
    // the refit quantizer spreads the corpus again: every original vector
    // plus the drifted mass is indexed, and exhaustive probing is exact
    assert(report.nVectors == 4 * n, report.toString)
    assert(report.recall >= 0.8, report.toString)
    // content identical to building from scratch over the union
    val queries = vecs.where(col("vec_id") < 5)
    val got = AnnIndex
      .queryTopK(queries, "vec_id", "embedding", path, k = 3, nProbe = 16)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = graft.ops.Similarity
      .bruteForceTopK(
        vecs.select("vec_id", "embedding").unionByName(drifted),
        queries, "vec_id", "embedding", 3)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    graft.core.Blocks.releaseAll()
    assert(got === brute, "rebuilt index diverged from brute force at exhaustive probes")
  }

  test("DedupIndex.rebuild re-bands from the payload == fresh build at that banding") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val corpus = docs.where(col("doc_id") % 2 === 1)
    val shard = docs.where(col("doc_id") % 2 === 0)
    val rebuilt = freshPath("dedup_rebuild")
    val fresh = freshPath("dedup_fresh8")
    DedupIndex.build(corpus, "text", "doc_id", rebuilt, bands = 16, nBuckets = 2)
    val meta = DedupIndex.rebuild(spark, rebuilt, bands = 8)
    assert(meta.bands == 8)
    DedupIndex.build(corpus, "text", "doc_id", fresh, bands = 8, nBuckets = 2)
    def pairs(path: String) = {
      val r = DedupIndex
        .incrementalNearDups(shard, "text", path, threshold = 0.6)
        .select(col("id1"), col("id2"), round(col("jaccard"), 9).as("j"))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
      graft.core.Blocks.releaseAll()
      r
    }
    val a = pairs(rebuilt)
    assert(a === pairs(fresh),
      "re-banded-from-payload index diverged from a fresh build at the same banding")
    assert(a.nonEmpty)
  }

  test("index health as declarable constraints: pass when ok, fail with the recommendation") {
    import graft.requirements.WithinRequirement
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val annPath = freshPath("ann_constraint")
    AnnIndex.build(vecs, "vec_id", "embedding", annPath,
      nCentroids = 8, kmeansIters = 0, nBuckets = 2)
    val reqOk = WithinRequirement.fromDataFrame(vecs, "embeddings")
      .addAnnIndexHealthyConstraint(
        "vec_id", "embedding", annPath, minRecall = 0.8, k = 3, nProbe = 8)
    assert(reqOk.test(spark).forall(_.outcome), "healthy index must pass the gate")
    // starve the probes: nProbe = 1 over 8 cells tanks the operated recall
    val reqStarved = WithinRequirement.fromDataFrame(vecs, "embeddings")
      .addAnnIndexHealthyConstraint(
        "vec_id", "embedding", annPath, minRecall = 0.95, k = 3, nProbe = 1)
    val r = reqStarved.test(spark)
    assert(r.exists(!_.outcome), "starved probes must fail the gate")
    assert(r.filter(!_.outcome).forall(_.failureMessage.exists(_.contains("rebuild"))),
      r.flatMap(_.failureMessage).mkString("; "))
    // dedup flavor
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val dedupPath = freshPath("dedup_constraint")
    DedupIndex.build(docs, "text", "doc_id", dedupPath, nBuckets = 2)
    val dOk = WithinRequirement.fromDataFrame(docs, "documents")
      .addDedupIndexHealthyConstraint(dedupPath)
    assert(dOk.test(spark).forall(_.outcome))
    val dTight = WithinRequirement.fromDataFrame(docs, "documents")
      .addDedupIndexHealthyConstraint(dedupPath, maxHotCellMass = 0.0,
        maxBucketSize = 1)
    val dr = dTight.test(spark)
    assert(dr.exists(!_.outcome), "a 1-member cap must flag hot mass")
  }

  test("DedupIndex: hot-cell mass from degenerate text recommends rebuild") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val path = freshPath("dedup")
    DedupIndex.build(docs, "text", "doc_id", path, nBuckets = 2)
    val healthy = DedupIndex.healthReport(spark, path)
    assert(healthy.recommendation == "ok", healthy.toString)
    // drift: thousands of near-identical boilerplate docs — every band
    // cell they share blows past maxBucketSize, and that mass becomes
    // invisible to candidate generation
    import spark.implicits._
    val boiler = (0L until 3000L)
      .map(i => (1000000L + i, "the same boilerplate text repeated verbatim across the corpus"))
      .toDF("doc_id", "text")
    DedupIndex.append(boiler, "text", path)
    val report = DedupIndex.healthReport(spark, path, maxBucketSize = 1000)
    assert(report.cappedMassFrac > 0.1, report.toString)
    assert(report.recommendation == "rebuild", report.toString)
  }
}
