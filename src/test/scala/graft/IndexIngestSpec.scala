package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{AnnIndex, DedupIndex}
import graft.streaming.IndexIngest

/** Streaming → persisted-index ingestion (IndexIngest): a genuinely
  * multi-micro-batch file-stream replay appended through foreachBatch must
  * leave the index bit-identical to batch-appending the same rows — the
  * frozen-geometry append contract makes micro-batch boundaries invisible.
  */
class IndexIngestSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  private def freshDir(tag: String): java.io.File = {
    val p = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_index_ingest_$tag")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) { val k = f.listFiles(); if (k != null) k.foreach(rm) }
      f.delete(): Unit
    }
    rm(p)
    p
  }

  test("stream-ingested AnnIndex == batch-appended AnnIndex on the same rows") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = vecs.where(col("vec_id") % 2 === 0)
    val arriving = vecs.where(col("vec_id") % 2 === 1)
    val streamPath = freshDir("ann_stream").getAbsolutePath
    val batchPath = freshDir("ann_batch").getAbsolutePath
    AnnIndex.build(base, "vec_id", "embedding", streamPath,
      nCentroids = 8, kmeansIters = 0, nBuckets = 2, pq = Some((4, 16)), pqIters = 0)
    AnnIndex.build(base, "vec_id", "embedding", batchPath,
      nCentroids = 8, kmeansIters = 0, nBuckets = 2, pq = Some((4, 16)), pqIters = 0)
    AnnIndex.append(arriving, batchPath)
    // three files + maxFilesPerTrigger = 1 → a genuine multi-batch stream
    val feed = freshDir("ann_feed")
    arriving.repartition(3).write.parquet(feed.getAbsolutePath)
    val stream = spark.readStream
      .schema(arriving.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(feed.getAbsolutePath)
    val q = IndexIngest.annIngest(stream, streamPath)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val queries = vecs.where(col("vec_id") < 5)
    def topk(path: String) = {
      val r = AnnIndex
        .queryTopK(queries, "vec_id", "embedding", path, k = 3, nProbe = 8)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
      graft.core.Blocks.releaseAll()
      r
    }
    assert(topk(streamPath) === topk(batchPath),
      "micro-batch boundaries changed the ingested index's answers")
    // PQ codes were carried through each micro-batch append too
    val pqRows = AnnIndex.open(spark, streamPath).postings
      .where(col("pq_codes").isNull).count()
    assert(pqRows == 0, "stream-appended rows missing persisted PQ codes")
  }

  test("autoCompact ingestion keeps the layering bounded without changing answers") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = vecs.where(col("vec_id") % 8 === 0)
    val arriving = vecs.where(col("vec_id") % 8 =!= 0)
    val path = freshDir("ann_autocompact").getAbsolutePath
    AnnIndex.build(base, "vec_id", "embedding", path,
      nCentroids = 8, kmeansIters = 0, nBuckets = 1)
    val feed = freshDir("ann_ac_feed")
    arriving.repartition(7).write.parquet(feed.getAbsolutePath)
    val stream = spark.readStream
      .schema(arriving.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(feed.getAbsolutePath)
    val q = IndexIngest.annIngest(stream, path, autoCompact = true)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // 7 appends onto 1 bucket would layer ~8 file-sets; auto-compaction
    // must have kept it bounded by the advice threshold + one batch
    val layering = AnnIndex.fileStats(path).filesPerBucket
    assert(layering <= 5.0, s"auto-compaction did not run: $layering files/bucket")
    // and the ingested content is complete: exhaustive query == brute force
    val queries = vecs.where(col("vec_id") < 5)
    val fromIndex = AnnIndex
      .queryTopK(queries, "vec_id", "embedding", path, k = 3, nProbe = 8)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    val brute = graft.ops.Similarity
      .bruteForceTopK(vecs, queries, "vec_id", "embedding", 3)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    graft.core.Blocks.releaseAll()
    assert(fromIndex === brute)
  }

  test("autoVacuum bounds on-disk bytes across compactions; retiredStats prices the debt") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = vecs.where(col("vec_id") % 8 === 0)
    val arriving = vecs.where(col("vec_id") % 8 =!= 0)
    // contrast fixture first: a plain compact retires a generation, and
    // retiredStats must SEE those bytes (the accounting under test)
    val plainPath = freshDir("ann_retired").getAbsolutePath
    AnnIndex.build(base, "vec_id", "embedding", plainPath,
      nCentroids = 8, kmeansIters = 0, nBuckets = 1)
    AnnIndex.append(arriving, plainPath)
    AnnIndex.compact(spark, plainPath)
    val retired = AnnIndex.retiredStats(plainPath).map(_.bytes).sum
    assert(retired > 0,
      "compact must leave a retired generation and retiredStats must price it")
    AnnIndex.vacuum(plainPath)
    assert(AnnIndex.retiredStats(plainPath).map(_.bytes).sum == 0,
      "vacuum must reclaim every retired byte")
    // the streaming opt-in: same ingestion as the autoCompact case, with
    // autoVacuum reclaiming after each in-line compact — storage stays
    // bounded at ONE generation across N compactions
    val path = freshDir("ann_autovacuum").getAbsolutePath
    AnnIndex.build(base, "vec_id", "embedding", path,
      nCentroids = 8, kmeansIters = 0, nBuckets = 1)
    val feed = freshDir("ann_av_feed")
    arriving.repartition(7).write.parquet(feed.getAbsolutePath)
    val stream = spark.readStream
      .schema(arriving.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(feed.getAbsolutePath)
    val q = IndexIngest
      .annIngest(stream, path, autoCompact = true, autoVacuum = true)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(AnnIndex.retiredStats(path).map(_.bytes).sum == 0,
      "autoVacuum ingestion must not accumulate retired-generation bytes")
    // and reclaiming storage changed no answer: exhaustive == brute force
    val queries = vecs.where(col("vec_id") < 5)
    val fromIndex = AnnIndex
      .queryTopK(queries, "vec_id", "embedding", path, k = 3, nProbe = 8)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    val brute = graft.ops.Similarity
      .bruteForceTopK(vecs, queries, "vec_id", "embedding", 3)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    graft.core.Blocks.releaseAll()
    assert(fromIndex === brute)
  }

  test("stream-ingested DedupIndex == batch-appended DedupIndex on the same docs") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val base = docs.where(col("doc_id") % 2 === 1)
    val arriving = docs.where(col("doc_id") % 2 === 0 && col("doc_id") % 4 === 0)
    val probe = docs.where(col("doc_id") % 2 === 0 && col("doc_id") % 4 =!= 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val streamPath = freshDir("dedup_stream").getAbsolutePath
    val batchPath = freshDir("dedup_batch").getAbsolutePath
    DedupIndex.build(base, "text", "doc_id", streamPath, nBuckets = 2)
    DedupIndex.build(base, "text", "doc_id", batchPath, nBuckets = 2)
    DedupIndex.append(arriving, "text", batchPath)
    val feed = freshDir("dedup_feed")
    arriving.repartition(3).write.parquet(feed.getAbsolutePath)
    val stream = spark.readStream
      .schema(arriving.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(feed.getAbsolutePath)
    val q = IndexIngest.dedupIngest(stream, "text", streamPath)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    def pairs(path: String) = {
      val r = DedupIndex
        .incrementalNearDups(probe, "text", path, threshold = 0.6)
        .select(col("id1"), col("id2"), round(col("jaccard"), 9).as("j"))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
      graft.core.Blocks.releaseAll()
      r
    }
    val s = pairs(streamPath)
    val b = pairs(batchPath)
    assert(s.nonEmpty, "fixture should produce at least one cross pair")
    assert(s === b, "micro-batch boundaries changed the ingested index's pairs")
  }

  test("autoRebuild ingestion heals a drifted AnnIndex without an operator") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    // the DRIFT is GROWTH: the index is built for a 40-vector corpus
    // (2 coarse cells — the right geometry at that size), then ingestion
    // grows it 12×. Under the frozen 2-cell quantizer at least half the
    // corpus shares one cell (maxCellFrac ≥ 0.5 — the healthReport
    // "rebuild" trigger); a refit re-auto-sizes the geometry to the
    // CURRENT corpus and the diverse vectors spread again
    val base = vecs.where(col("vec_id") < 40)
    val arriving = vecs.where(col("vec_id") >= 40)
    def ingest(tag: String, autoRebuild: Boolean): String = {
      val path = freshDir(s"ann_heal_$tag").getAbsolutePath
      AnnIndex.build(base, "vec_id", "embedding", path,
        nCentroids = 2, kmeansIters = 0, nBuckets = 2)
      val feed = freshDir(s"ann_heal_feed_$tag")
      arriving.repartition(3).write.parquet(feed.getAbsolutePath)
      val stream = spark.readStream
        .schema(arriving.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed.getAbsolutePath)
      val q = IndexIngest.annIngest(stream, path,
        autoRebuild = autoRebuild, healthEvery = 3)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(180000)
      path
    }
    val healed = ingest("on", autoRebuild = true)
    val control = ingest("off", autoRebuild = false)
    // the control proves the drift: frozen geometry concentrates the
    // ingested mass into a hot cell past the rebuild trigger
    val controlHealth = AnnIndex.healthReport(spark, control)
    assert(controlHealth.recommendation === "rebuild",
      s"fixture did not drift the control index: $controlHealth")
    // the healed index rebuilt in-line (both generations flipped) and its
    // refit geometry no longer calls for a rebuild
    val m = AnnIndex.readMeta(healed)
    assert(m.genQuant >= 1 && m.genPostings >= 1,
      s"autoRebuild never fired: $m")
    val healedHealth = AnnIndex.healthReport(spark, healed)
    assert(healedHealth.recommendation !== "rebuild",
      s"autoRebuild did not heal the drift: $healedHealth")
    assert(healedHealth.maxCellFrac < controlHealth.maxCellFrac,
      s"refit geometry did not spread the hot cell: " +
        s"${healedHealth.maxCellFrac} vs ${controlHealth.maxCellFrac}")
    // and nothing was lost: exhaustive probing equals brute force over
    // the full ingested corpus
    val corpus = base.unionAll(arriving)
    val queries = corpus.where(col("vec_id") < 5)
    def ids(df: org.apache.spark.sql.DataFrame) = df
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val fromIndex = ids(AnnIndex.queryTopK(
      queries, "vec_id", "embedding", healed, k = 3,
      nProbe = AnnIndex.readMeta(healed).nCells))
    val brute = ids(graft.ops.Similarity.bruteForceTopK(
      corpus, queries, "vec_id", "embedding", 3))
    graft.core.Blocks.releaseAll()
    assert(fromIndex === brute,
      "healed index lost rows or changed exhaustive answers")
  }

  test("a reader opened pre-rebuild keeps answering bit-identically across the mid-stream flip") {
    // the end-to-end concurrent-maintenance pin the generation scheme
    // promises (r13 verdict stretch 7): a query PLAN resolved against the
    // pre-rebuild generation — file-set captured at analysis time, the
    // probe side checkpointed at call time — is held open while the
    // streaming ingester's autoRebuild refits the quantizer and flips both
    // generation pointers mid-stream. Deferred GC keeps the retired
    // file-set, so the held plan's second evaluation rescans the SAME
    // files and must reproduce its pre-flip answer bit for bit.
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = vecs.where(col("vec_id") < 40)
    val arriving = vecs.where(col("vec_id") >= 40)
    val path = freshDir("ann_live_reader").getAbsolutePath
    AnnIndex.build(base, "vec_id", "embedding", path,
      nCentroids = 2, kmeansIters = 0, nBuckets = 2)
    val queries = vecs.where(col("vec_id") < 5)
    val preOpened = AnnIndex.queryTopK(
      queries, "vec_id", "embedding", path, k = 3, nProbe = 2)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    // NO releaseAll between the two evaluations: the reader is live, its
    // query-side checkpoint is its own resource (a real long-lived reader
    // holds exactly this state across maintenance)
    val before = rows(preOpened)
    val feed = freshDir("ann_live_feed")
    arriving.repartition(3).write.parquet(feed.getAbsolutePath)
    val stream = spark.readStream
      .schema(arriving.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(feed.getAbsolutePath)
    val q = IndexIngest.annIngest(stream, path,
      autoRebuild = true, healthEvery = 3)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val m = AnnIndex.readMeta(path)
    assert(m.genQuant >= 1 && m.genPostings >= 1,
      s"fixture did not rebuild mid-stream: $m")
    assert(rows(preOpened) === before,
      "pre-rebuild reader's answers changed (or its file-set was lost) " +
        "across the generation flip")
    graft.core.Blocks.releaseAll()
    // and a FRESH open sees the refit, grown corpus: exhaustive probing
    // over the new generation equals brute force over corpus ∪ ingested
    val corpus = base.unionAll(arriving)
    def ids(df: org.apache.spark.sql.DataFrame) = df
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val fresh = ids(AnnIndex.queryTopK(
      queries, "vec_id", "embedding", path, k = 3, nProbe = m.nCells))
    val brute = ids(graft.ops.Similarity.bruteForceTopK(
      corpus, queries, "vec_id", "embedding", 3))
    graft.core.Blocks.releaseAll()
    assert(fresh === brute)
  }

  test("coarserBands steps to the next divisor; None below 1") {
    assert(IndexIngest.coarserBands(64, 16) === Some(8))
    assert(IndexIngest.coarserBands(64, 8) === Some(4))
    assert(IndexIngest.coarserBands(60, 6) === Some(5))
    assert(IndexIngest.coarserBands(64, 1) === None)
  }
}
