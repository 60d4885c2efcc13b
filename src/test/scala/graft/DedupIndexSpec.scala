package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup
import graft.sources.DedupIndex

/** Pins the persisted/incremental dedup index contract:
  * `incrementalNearDups(shard, indexPath)` must equal the batch
  * `crossNearDups(shard, corpus)` row for row, the index must survive
  * catalog loss (external location-pinned tables, re-registered on open),
  * and the corpus-side cap join must plan exchange-free off the bucketed
  * layout.
  */
class DedupIndexSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  private def freshPath(tag: String): String = {
    val p = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_dedup_index_spec_$tag")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) { val k = f.listFiles(); if (k != null) k.foreach(rm) }
      f.delete(): Unit
    }
    rm(p)
    p.getAbsolutePath
  }

  test("incrementalNearDups matches the batch crossNearDups bit for bit") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val corpus = docs.where(col("doc_id") % 2 === 1)
    val shard = docs.where(col("doc_id") % 2 === 0)
    val path = freshPath("match")
    DedupIndex.build(corpus, "text", "doc_id", path, nBuckets = 4)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id1"), col("id2"), round(col("jaccard"), 9).as("j"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val batch = rows(Dedup.crossNearDups(shard, corpus, "text", "doc_id",
      threshold = 0.6))
    val incremental = rows(DedupIndex.incrementalNearDups(
      shard, "text", path, threshold = 0.6))
    graft.core.Blocks.releaseAll()
    assert(batch.nonEmpty, "fixture should produce at least one cross pair")
    assert(incremental === batch,
      s"incremental diverged: only-batch=${batch -- incremental} " +
        s"only-incremental=${incremental -- batch}")
  }

  test("index survives catalog loss: open() re-registers the external tables") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").limit(120)
    val path = freshPath("reopen")
    val meta = DedupIndex.build(docs, "text", "doc_id", path, nBuckets = 2)
    // simulate a new session's empty catalog: drop every registered table
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith("graft_dedup_idx_"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${t.name}"))
    val idx = DedupIndex.open(spark, path)
    assert(idx.meta === meta)
    val nIds = idx.payload.count()
    assert(nIds > 0 && nIds <= 120)
    assert(idx.buckets.count() === nIds * meta.bands)
    assert(idx.sizes.agg(sum("dj_bn")).head().getLong(0) === nIds * meta.bands)
  }

  test("corpus-side cap filter joins exchange-free off the bucketed layout") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").limit(200)
    val path = freshPath("plan")
    DedupIndex.build(docs, "text", "doc_id", path, nBuckets = 4)
    val idx = DedupIndex.open(spark, path)
    // merge hint on the build side keeps the join out of broadcast range:
    // the layout, not a broadcast, must be what removes the exchange
    val capped = idx.buckets.join(
      idx.sizes.where(col("dj_bn") <= 1000).select("band", "bucket")
        .hint("merge"),
      Seq("band", "bucket"))
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      s"cap join should plan as a sort-merge join under the hint:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"co-bucketed cap join must not shuffle the corpus cells:\n$plan")
  }

  test("append folds a shard in: next incremental == batch vs corpus ∪ shard") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val a = docs.where(col("doc_id") % 3 === 0) // initial corpus
    val b = docs.where(col("doc_id") % 3 === 1) // ingested shard
    val c = docs.where(col("doc_id") % 3 === 2) // the NEXT shard
    val path = freshPath("append")
    DedupIndex.build(a, "text", "doc_id", path, nBuckets = 4)
    val genBefore = DedupIndex.readMeta(path).genSizes
    DedupIndex.append(b, "text", path)
    // append keeps meta.json in place (readers stay live through
    // ingestion — r13 advice) and commits by flipping the sizes
    // generation pointer atomically at the end
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$path/meta.json")))
    assert(DedupIndex.readMeta(path).genSizes === genBefore + 1,
      "append must commit via an atomic sizes generation flip")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id1"), col("id2"), round(col("jaccard"), 9).as("j"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val batch = rows(Dedup.crossNearDups(
      c, a.union(b), "text", "doc_id", threshold = 0.6))
    val incremental = rows(DedupIndex.incrementalNearDups(
      c, "text", path, threshold = 0.6))
    graft.core.Blocks.releaseAll()
    assert(batch.nonEmpty, "fixture should produce at least one cross pair")
    assert(incremental === batch,
      s"post-append incremental diverged: only-batch=${batch -- incremental} " +
        s"only-incremental=${incremental -- batch}")
    // id-disjointness is loud: re-appending the same shard must raise
    val e = intercept[IllegalArgumentException] {
      DedupIndex.append(b, "text", path)
    }
    assert(e.getMessage.contains("already exists"))
    // ... and the failed append must not have poisoned the index
    assert(DedupIndex.readMeta(path).nBuckets === 4)
  }

  test("MaxIndexedNearDupFraction: the declarable rolling-ingestion gate") {
    import graft.core.{DataRef, FrameSource}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val corpus = docs.where(col("doc_id") % 2 === 1)
    val shard = docs.where(col("doc_id") % 2 === 0)
    val path = freshPath("constraint")
    DedupIndex.build(corpus, "text", "doc_id", path, nBuckets = 4)
    // ground truth from the batch recompute
    val contaminated = Dedup
      .crossNearDups(shard, corpus, "text", "doc_id", threshold = 0.6)
      .select(col("id1")).distinct().count()
    graft.core.Blocks.releaseAll()
    val total = shard.count()
    val trueFrac = contaminated.toDouble / total
    assert(trueFrac > 0, "fixture should have some contamination")
    val ref = DataRef(FrameSource(shard, "idx_gate_t"))
    assert(graft.constraints.MaxIndexedNearDupFraction(
      ref, "text", "doc_id", path, Some(trueFrac),
      jaccardThreshold = 0.6).test(spark).outcome)
    val failing = graft.constraints.MaxIndexedNearDupFraction(
      ref, "text", "doc_id", path, Some(trueFrac / 2),
      jaccardThreshold = 0.6).test(spark)
    assert(!failing.outcome)
    assert(failing.failureMessage.exists(_.contains("indexed corpus")))
  }

  test("candidate join shuffles only the shard side: one Exchange, corpus bucketed") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").limit(200)
    val path = freshPath("candplan")
    DedupIndex.build(docs, "text", "doc_id", path, nBuckets = 4)
    val idx = DedupIndex.open(spark, path)
    import spark.implicits._
    // a stand-in for the shard's capped cells (tiny, NOT bucketed)
    val shardCells = Seq((0, 1L, 10L), (1, 2L, 20L))
      .toDF("band", "bucket", "id1")
    val cappedB = idx.buckets.join(
      idx.sizes.where(col("dj_bn") <= 1000).select("band", "bucket").hint("merge"),
      Seq("band", "bucket"))
    val candidates = shardCells.hint("merge")
      .join(
        cappedB.select(col("band"), col("bucket"), col("doc_id").as("id2")),
        Seq("band", "bucket"))
    val plan = candidates.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 1,
      s"corpus side must ride its bucketing — expected at most the shard-side " +
        s"exchange, found $exchanges:\n$plan")
  }

  test("centroid save/load round-trips the fitted quantizer exactly") {
    val path = freshPath("cents")
    val cents = Seq(
      3L -> Seq(0.25, -1.5, 3.0),
      7L -> Seq(1.0, 2.0, -0.125),
      1L -> Seq(-4.0, 0.0, 8.5))
    DedupIndex.saveCentroids(spark, path, cents)
    val loaded = DedupIndex.loadCentroids(spark, path)
    assert(loaded === cents.sortBy(_._1))
  }
}
