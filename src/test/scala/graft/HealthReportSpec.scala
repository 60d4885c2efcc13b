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
