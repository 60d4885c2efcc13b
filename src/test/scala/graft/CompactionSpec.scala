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

  // ---- generation-numbered file-sets (r12 verdict task 4): compact =
  // write generation N+1 + atomic meta flip + deferred GC, so a reader
  // holding an already-open plan keeps its file-set through the compact ----

  test("DedupIndex: a reader holding an open plan survives a concurrent compact") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val path = freshPath("gen_reader")
    DedupIndex.build(docs.where(col("doc_id") % 2 === 0), "text", "doc_id",
      path, nBuckets = 2)
    DedupIndex.append(docs.where(col("doc_id") % 2 === 1), "text", path)
    // the long-running reader: plans resolved BEFORE the compact
    val oldIdx = DedupIndex.open(spark, path)
    val nPayload = oldIdx.payload.count()
    val nBuckets = oldIdx.buckets.count()
    val m1 = DedupIndex.compact(spark, path)
    assert(m1.genPayload == 1 && m1.genBuckets == 1 && m1.genSizes >= 2,
      s"unexpected generations after compact: $m1") // append already bumped sizes
    // the old plan's file-set (previous generation) is deferred-deleted:
    // both counts complete and match, mid-compact and after
    assert(oldIdx.payload.count() === nPayload,
      "pre-compact payload plan broke after compact")
    assert(oldIdx.buckets.count() === nBuckets,
      "pre-compact buckets plan broke after compact")
    // a second compact retires the oldest generation, keeps the previous
    val m2 = DedupIndex.compact(spark, path)
    assert(m2.genPayload == 2)
    assert(!new java.io.File(path, "payload").exists(),
      "generation 0 should be GC'd after the second compact")
    assert(new java.io.File(path, "payload_g1").exists(),
      "the immediately-previous generation must survive for open readers")
    assert(new java.io.File(path, "payload_g2").exists())
    // vacuum drops everything but the current generation; queries still work
    DedupIndex.vacuum(path)
    assert(!new java.io.File(path, "payload_g1").exists())
    assert(DedupIndex.open(spark, path).payload.count() === nPayload)
  }

  test("DedupIndex: meta.json survives a compact (never deleted — crash leaves the old index readable)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val path = freshPath("gen_marker")
    DedupIndex.build(docs.where(col("doc_id") % 5 === 0), "text", "doc_id",
      path, nBuckets = 2)
    // a leftover partial next-generation dir (a crashed earlier compact)
    // must not break open() or the next compact
    val junk = new java.io.File(path, "payload_g1")
    junk.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(junk, "part-junk.parquet").toPath,
      Array[Byte](1, 2, 3))
    val before = DedupIndex.open(spark, path).payload.count()
    val meta = DedupIndex.compact(spark, path)
    assert(meta.genPayload == 1)
    assert(new java.io.File(path, "meta.json").exists())
    assert(DedupIndex.open(spark, path).payload.count() === before,
      "compact over a junk partial generation changed results")
  }

  test("DedupIndex: compact(maxRowsPerFile) splits a hot bucket at the cap, results unchanged") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val path = freshPath("gen_cap")
    // ONE storage bucket: the whole payload is one hot bucket — exactly
    // the skewed shape the cap bounds. An uncapped compact first: the
    // forced bucketed scan collapses the build's per-task file-sets to
    // exactly one file per bucket — the unbounded-file baseline
    DedupIndex.build(docs, "text", "doc_id", path, nBuckets = 1)
    DedupIndex.compact(spark, path)
    val uncapped = DedupIndex.fileStats(path)
      .find(_.table == "payload").get
    assert(uncapped.nFiles == 1L, s"fixture not single-file: $uncapped")
    val shard = docs.where(col("doc_id") % 97 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    def pairs() = {
      val r = DedupIndex
        .incrementalNearDups(shard, "text", path, threshold = 0.6)
        .select(col("id1"), col("id2")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      graft.core.Blocks.releaseAll()
      r
    }
    val before = pairs()
    DedupIndex.compact(spark, path, maxRowsPerFile = Some(10L))
    val capped = DedupIndex.fileStats(path).find(_.table == "payload").get
    assert(capped.nFiles > 1L,
      s"hot bucket did not split at the row cap: $capped")
    assert(capped.maxFileBytes > 0L && capped.maxFileBytes < uncapped.maxFileBytes,
      s"per-file byte ceiling did not drop: $capped vs $uncapped")
    assert(pairs() === before, "row-capped compaction changed pair results")
  }

  test("AnnIndex: reader survives compact; rebuild flips postings+quantizer generations together") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val path = freshPath("gen_ann")
    AnnIndex.build(vecs.where(col("vec_id") % 2 === 0), "vec_id", "embedding",
      path, nCentroids = 8, kmeansIters = 0, nBuckets = 2,
      pq = Some((4, 16)), pqIters = 0)
    AnnIndex.append(vecs.where(col("vec_id") % 2 === 1), path)
    val oldIdx = AnnIndex.open(spark, path)
    val nOld = oldIdx.postings.count()
    val m1 = AnnIndex.compact(spark, path)
    assert(m1.genPostings == 1 && m1.genQuant == 0,
      s"compact must bump postings only: $m1")
    assert(oldIdx.postings.count() === nOld,
      "pre-compact postings plan broke after compact")
    // rebuild: new quantizer + new postings land as one atomic flip; a
    // reader opened after the compact (the immediately-previous
    // generation — the one the deferred GC keeps) completes through it.
    // (The PRE-compact gen-0 reader above is now two generations back
    // and is legitimately retired — one lifecycle step of grace each.)
    val postCompactIdx = AnnIndex.open(spark, path)
    val m2 = AnnIndex.rebuild(spark, path, nCentroids = Some(4))
    assert(m2.genPostings == 2 && m2.genQuant == 2,
      s"rebuild must flip both generations together: $m2")
    assert(m2.nCentroids == 4 && m2.pqM == 4)
    assert(postCompactIdx.postings.count() === nOld,
      "pre-rebuild postings plan broke after rebuild")
    val queries = vecs.where(col("vec_id") < 5)
    val rebuilt = AnnIndex.queryTopK(
      queries, "vec_id", "embedding", path, k = 3, nProbe = 4)
    assert(rebuilt.count() > 0)
    graft.core.Blocks.releaseAll()
    AnnIndex.vacuum(path)
    assert(!new java.io.File(path, "postings_g1").exists())
    assert(new java.io.File(path, "postings_g2").exists())
    assert(new java.io.File(path, "centroids_g2").exists())
    assert(AnnIndex.open(spark, path).postings.count() === nOld)
  }

  test("AnnIndex: destructive build over an existing generational index resets to gen 0") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val path = freshPath("gen_ann_rebuild0")
    AnnIndex.build(vecs.where(col("vec_id") % 2 === 0), "vec_id", "embedding",
      path, nCentroids = 4, kmeansIters = 0, nBuckets = 2)
    AnnIndex.compact(spark, path) // now at generation 1
    assert(AnnIndex.readMeta(path).genPostings == 1)
    // a second full build on the same path (the overwrite contract):
    // lands at generation 0, retires every stale generation dir, and
    // answers for the NEW corpus only
    AnnIndex.build(vecs, "vec_id", "embedding",
      path, nCentroids = 4, kmeansIters = 0, nBuckets = 2)
    val m = AnnIndex.readMeta(path)
    assert(m.genPostings == 0 && m.genQuant == 0)
    assert(!new java.io.File(path, "postings_g1").exists(),
      "stale generation survived a destructive rebuild")
    assert(AnnIndex.open(spark, path).postings.count() === vecs.count())
  }

  test("AnnIndex: compact(maxRowsPerFile) splits hot buckets; PQ read path unchanged") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val path = freshPath("gen_ann_cap")
    AnnIndex.build(vecs, "vec_id", "embedding", path,
      nCentroids = 4, kmeansIters = 0, nBuckets = 1,
      pq = Some((4, 16)), pqIters = 0)
    val queries = vecs.where(col("vec_id") < 5)
    def topkPq() = {
      val r = AnnIndex
        .queryTopKPq(queries, "vec_id", "embedding", path, k = 3, nProbe = 4,
          poolFactor = Int.MaxValue)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
      graft.core.Blocks.releaseAll()
      r
    }
    val before = topkPq()
    AnnIndex.compact(spark, path, maxRowsPerFile = Some(16L))
    val st = AnnIndex.fileStats(path)
    assert(st.nFiles > 1L, s"hot bucket did not split at the row cap: $st")
    assert(topkPq() === before, "row-capped compaction changed PQ top-k")
  }
}
