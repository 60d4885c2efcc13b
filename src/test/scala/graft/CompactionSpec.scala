package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{AnnIndex, DedupIndex}

/** Index compaction (r11 verdict task: append grows one file-set per
  * ingest and nothing ever merged them): append→append→compact leaves
  * query/pair results bit-identical while the per-bucket file layering
  * drops back to the freshly-built shape.
  */
class CompactionSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  private def freshPath(tag: String): String = {
    val p = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_compaction_spec_$tag")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) { val k = f.listFiles(); if (k != null) k.foreach(rm) }
      f.delete(): Unit
    }
    rm(p)
    p.getAbsolutePath
  }

  test("DedupIndex: append x2 then compact — pairs unchanged, files per bucket -> 1") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val path = freshPath("dedup")
    DedupIndex.build(docs.where(col("doc_id") % 3 === 0), "text", "doc_id",
      path, nBuckets = 2)
    DedupIndex.append(docs.where(col("doc_id") % 3 === 1), "text", path)
    DedupIndex.append(docs.where(col("doc_id") % 3 === 2), "text", path)
    val shard = docs.where(col("doc_id") % 97 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    def pairs() = {
      val r = DedupIndex
        .incrementalNearDups(shard, "text", path, threshold = 0.6)
        .select(col("id1"), col("id2"), round(col("jaccard"), 9).as("j"))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
      graft.core.Blocks.releaseAll()
      r
    }
    val before = pairs()
    val layeredStats = DedupIndex.fileStats(path)
    // three file-sets (build + 2 appends) layered on buckets/payload
    assert(layeredStats.filter(_.table != "sizes").forall(_.filesPerBucket > 1.0),
      s"fixture not layered: $layeredStats")
    assert(DedupIndex.compactionAdvised(path, threshold = 1.5))
    DedupIndex.compact(spark, path)
    val after = pairs()
    assert(after === before, "compaction changed incremental pair results")
    val compactStats = DedupIndex.fileStats(path)
    assert(compactStats.forall(_.filesPerBucket <= 1.0),
      s"compaction left layered files: $compactStats")
    assert(!DedupIndex.compactionAdvised(path, threshold = 1.5))
  }

  test("AnnIndex: append x2 then compact — top-k unchanged, files per bucket -> 1") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val path = freshPath("ann")
    AnnIndex.build(vecs.where(col("vec_id") % 3 === 0), "vec_id", "embedding",
      path, nCentroids = 8, kmeansIters = 0, nBuckets = 2,
      pq = Some((4, 16)), pqIters = 0)
    AnnIndex.append(vecs.where(col("vec_id") % 3 === 1), path)
    AnnIndex.append(vecs.where(col("vec_id") % 3 === 2), path)
    val queries = vecs.where(col("vec_id") < 5)
    def topk() = {
      val r = AnnIndex
        .queryTopK(queries, "vec_id", "embedding", path, k = 3, nProbe = 8)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
      graft.core.Blocks.releaseAll()
      r
    }
    def topkPq() = {
      val r = AnnIndex
        .queryTopKPq(queries, "vec_id", "embedding", path, k = 3, nProbe = 8,
          poolFactor = Int.MaxValue)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
      graft.core.Blocks.releaseAll()
      r
    }
    val before = topk()
    val beforePq = topkPq()
    assert(AnnIndex.fileStats(path).filesPerBucket > 1.0)
    assert(AnnIndex.compactionAdvised(path, threshold = 1.5))
    AnnIndex.compact(spark, path)
    assert(topk() === before, "compaction changed uncompressed top-k")
    assert(topkPq() === beforePq, "compaction changed PQ top-k")
    assert(AnnIndex.fileStats(path).filesPerBucket <= 1.0)
    assert(!AnnIndex.compactionAdvised(path, threshold = 1.5))
    // the compacted index is still appendable and crash-safety holds
    AnnIndex.append(
      vecs.where(col("vec_id") % 3 === 0)
        .withColumn("vec_id", col("vec_id") + 5000000L), path)
    assert(AnnIndex.readMeta(path).pqM == 4)
  }
}
