package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity
import graft.sources.AnnIndex

/** Pins the persisted IVF ANN index contract: `queryTopK` must equal the
  * live `ivfTopK` bit for bit at the same geometry, `nProbe = nCells` must
  * be EXACT (≡ brute force), the index must survive catalog loss, the
  * probed-cell filter must push into the postings scan, `append` must
  * equal a from-scratch assignment at the persisted geometry, a crashed
  * BUILD must be unreadable (commit-marker discipline), and `append` must
  * leave `meta.json` untouched end to end — readers stay live through
  * ingestion (r13 advice: the old delete-first marker failed every
  * concurrent open during each streaming micro-batch).
  */
class AnnIndexSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  private def freshPath(tag: String): String = {
    val p = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_ann_index_spec_$tag")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) { val k = f.listFiles(); if (k != null) k.foreach(rm) }
      f.delete(): Unit
    }
    rm(p)
    p.getAbsolutePath
  }

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    .toSet

  test("nProbe = nCells is exact: queryTopK == bruteForceTopK bit for bit") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = vecs.where(col("vec_id") < 5)
    val path = freshPath("exact")
    val meta = AnnIndex.build(vecs, "vec_id", "embedding", path,
      nCentroids = 8, kmeansIters = 0, nBuckets = 4)
    assert(meta.nCells === 8)
    val brute = rows(Similarity.bruteForceTopK(
      vecs, queries, "vec_id", "embedding", k = 3))
    val indexed = rows(AnnIndex.queryTopK(
      queries, "vec_id", "embedding", path, k = 3, nProbe = meta.nCells))
    graft.core.Blocks.releaseAll()
    assert(brute.nonEmpty)
    assert(indexed === brute,
      s"only-brute=${brute -- indexed} only-indexed=${indexed -- brute}")
  }

  test("queryTopK == live ivfTopK at the same geometry (approximate probes)") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = vecs.where(col("vec_id") < 5)
    val path = freshPath("livematch")
    // kmeansIters = 0 keeps the fit a pure function of the seed ids, so
    // the live call and the build fit IDENTICAL centroids independently
    AnnIndex.build(vecs, "vec_id", "embedding", path,
      nCentroids = 8, kmeansIters = 0, nBuckets = 4)
    val live = rows(Similarity.ivfTopK(
      vecs, queries, "vec_id", "embedding", k = 3,
      nCentroids = 8, nProbe = 2, kmeansIters = 0))
    val indexed = rows(AnnIndex.queryTopK(
      queries, "vec_id", "embedding", path, k = 3, nProbe = 2))
    graft.core.Blocks.releaseAll()
    assert(live.nonEmpty)
    assert(indexed === live,
      s"only-live=${live -- indexed} only-indexed=${indexed -- live}")
  }

  test("index survives catalog loss: open() re-registers the external table") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val path = freshPath("reopen")
    val meta = AnnIndex.build(vecs, "vec_id", "embedding", path,
      nCentroids = 4, kmeansIters = 0, nBuckets = 2)
    // simulate a new session's empty catalog: drop every registered table
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith("graft_ann_idx_"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${t.name}"))
    val idx = AnnIndex.open(spark, path)
    assert(idx.meta === meta)
    assert(idx.centroids.size === meta.nCells)
    val n = idx.postings.count()
    assert(n === vecs.where(col("vec_id").isNotNull).count())
    // every posting landed in a fitted cell
    val cells = idx.postings.select("cluster").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(cells.subsetOf(idx.centroids.map(_._1).toSet))
  }

  test("probed-cell filter pushes into the postings scan") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val path = freshPath("pushdown")
    AnnIndex.build(vecs, "vec_id", "embedding", path,
      nCentroids = 8, kmeansIters = 0, nBuckets = 4)
    val df = AnnIndex.queryTopK(
      vecs.where(col("vec_id") < 2), "vec_id", "embedding", path,
      k = 3, nProbe = 2)
    val plan = df.queryExecution.executedPlan.toString
    graft.core.Blocks.releaseAll()
    assert(plan.contains("PushedFilters: [In(cluster"),
      s"probed-cell isin must reach the parquet scan:\n$plan")
    // the cell-sorted bucketed layout must actually prune buckets
    assert(plan.contains("Bucketed: true"),
      s"postings must scan as a bucketed table:\n$plan")
    // the probe join must broadcast the (tiny) probe frame — the only
    // hash exchange allowed is the per-query ranking window's shuffle of
    // the already-probed candidate rows, never a cluster-keyed shuffle of
    // the postings
    assert(!plan.contains("Exchange hashpartitioning(cluster"),
      s"queryTopK must not shuffle the postings on the cell key:\n$plan")
    assert(plan.contains("BroadcastHashJoin [cluster"),
      s"probe frame must broadcast against the postings scan:\n$plan")
  }

  test("append == from-scratch assignment at the persisted geometry; clash is loud") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val corpus = vecs.where(col("vec_id") % 2 === 0)
    val shard = vecs.where(col("vec_id") % 2 === 1)
    val queries = vecs.where(col("vec_id") < 5)
    val path = freshPath("append")
    AnnIndex.build(corpus, "vec_id", "embedding", path,
      nCentroids = 6, kmeansIters = 0, nBuckets = 2)
    // append never takes meta.json down (no concurrent-reader window):
    // identical bytes before and after, and the file exists throughout —
    // pinned via content identity (a delete+rewrite would be observable
    // only by a racing reader; byte-identity plus the atomicWrite
    // discipline closes the window by construction)
    val metaFile = java.nio.file.Paths.get(s"$path/meta.json")
    val metaBefore = java.nio.file.Files.readAllBytes(metaFile)
    AnnIndex.append(shard, path)
    assert(java.nio.file.Files.exists(metaFile))
    assert(java.util.Arrays.equals(
      metaBefore, java.nio.file.Files.readAllBytes(metaFile)),
      "AnnIndex.append must not rewrite meta.json — geometry is frozen")
    val idx = AnnIndex.open(spark, path)
    // postings now equal assigning corpus ∪ shard to the SAME centroids
    val expected = Similarity
      .assignToCentroids(vecs, "vec_id", "embedding", idx.centroids)
      .select("neighbor_id", "cluster")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = idx.postings.select("neighbor_id", "cluster")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
    // exact-mode query over the grown index == brute force over the union
    val brute = rows(Similarity.bruteForceTopK(
      vecs, queries, "vec_id", "embedding", k = 3))
    val indexed = rows(AnnIndex.queryTopK(
      queries, "vec_id", "embedding", path, k = 3, nProbe = idx.meta.nCells))
    graft.core.Blocks.releaseAll()
    assert(indexed === brute)
    // id-disjointness is loud, and the failed append must not poison it
    val e = intercept[IllegalArgumentException] { AnnIndex.append(shard, path) }
    assert(e.getMessage.contains("already exists"))
    assert(AnnIndex.readMeta(path).nCells === 6)
  }

  test("a crashed build is unreadable, never stale-geometry-over-new-postings") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet").limit(50)
    val path = freshPath("crash")
    AnnIndex.build(vecs, "vec_id", "embedding", path,
      nCentroids = 4, kmeansIters = 0, nBuckets = 2)
    // the commit marker is the FIRST thing build/append removes — a crash
    // at any later point leaves exactly this state
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$path/meta.json"))
    val e = intercept[IllegalArgumentException] { AnnIndex.readMeta(path) }
    assert(e.getMessage.contains("build(...) it first"))
    intercept[IllegalArgumentException] { AnnIndex.open(spark, path) }
  }

  test("PQ index: exhaustive queryTopKPq == bruteForceTopK; codes survive append") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val corpus = vecs.where(col("vec_id") % 2 === 0)
    val shard = vecs.where(col("vec_id") % 2 === 1)
    val queries = vecs.where(col("vec_id") < 5)
    val n = vecs.count()
    val path = freshPath("pq")
    val meta = AnnIndex.build(corpus, "vec_id", "embedding", path,
      nCentroids = 4, kmeansIters = 0, nBuckets = 2,
      pq = Some((4, 8)), pqIters = 0)
    assert(meta.pqM === 4 && meta.pqKs === 8)
    AnnIndex.append(shard, path)
    // every posting (original + appended) carries codes
    val idx = AnnIndex.open(spark, path)
    assert(idx.postings.where(col("pq_codes").isNull).count() === 0)
    assert(idx.postings.count() === n)
    // exhaustive settings: every cell probed, pool covers the corpus —
    // the ADC prefilter cannot drop a true neighbor, the rerank is exact
    val brute = rows(Similarity.bruteForceTopK(
      vecs, queries, "vec_id", "embedding", k = 3))
    val indexed = rows(AnnIndex.queryTopKPq(
      queries, "vec_id", "embedding", path, k = 3,
      nProbe = meta.nCells, poolFactor = (n / 3 + 1).toInt))
    graft.core.Blocks.releaseAll()
    assert(indexed === brute,
      s"only-brute=${brute -- indexed} only-indexed=${indexed -- brute}")
  }

  test("PQ index: queryTopKPq == live ivfpqTopK at the same geometry") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = vecs.where(col("vec_id") < 5)
    val n = vecs.count()
    val path = freshPath("pqlive")
    AnnIndex.build(vecs, "vec_id", "embedding", path,
      nCentroids = 6, kmeansIters = 0, nBuckets = 2,
      pq = Some((4, 8)), pqIters = 0, corpusSize = Some(n))
    val live = rows(graft.ops.Pq.ivfpqTopK(
      vecs, queries, "vec_id", "embedding", k = 3,
      nCentroids = 6, nProbe = 2, m = 4, ks = 8, poolFactor = 3,
      kmeansIters = 0, pqIters = 0, corpusSize = Some(n)))
    val indexed = rows(AnnIndex.queryTopKPq(
      queries, "vec_id", "embedding", path, k = 3,
      nProbe = 2, poolFactor = 3))
    graft.core.Blocks.releaseAll()
    assert(live.nonEmpty)
    assert(indexed === live,
      s"only-live=${live -- indexed} only-indexed=${indexed -- live}")
  }

  test("PQ index: the ADC candidate scan reads codes, never the vectors") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val path = freshPath("pqplan")
    AnnIndex.build(vecs, "vec_id", "embedding", path,
      nCentroids = 8, kmeansIters = 0, nBuckets = 4, pq = Some((4, 8)))
    val df = AnnIndex.queryTopKPq(
      vecs.where(col("vec_id") < 2), "vec_id", "embedding", path,
      k = 3, nProbe = 2)
    val plan = df.queryExecution.executedPlan.toString
    graft.core.Blocks.releaseAll()
    // both scans prune to the probed cells
    assert("PushedFilters: \\[In\\(cluster".r.findAllIn(plan).size >= 2,
      s"both the ADC scan and the rerank scan must push the probed-cell filter:\n$plan")
    // the ADC stage's scan is code-only: some postings scan reads pq_codes
    // WITHOUT the float vectors
    val codeOnlyScan = "ReadSchema: [^\\n]*pq_codes[^\\n]*".r
      .findAllIn(plan)
      .exists(s => !s.contains("vec:array<float>"))
    assert(codeOnlyScan,
      s"the ADC candidate scan must not read the full vectors:\n$plan")
    // a non-PQ index refuses the compressed path loudly
    val plainPath = freshPath("pqplain")
    AnnIndex.build(vecs.limit(50), "vec_id", "embedding", plainPath,
      nCentroids = 4, kmeansIters = 0, nBuckets = 2)
    val e = intercept[IllegalArgumentException] {
      AnnIndex.queryTopKPq(
        vecs.where(col("vec_id") < 2), "vec_id", "embedding", plainPath, k = 3)
    }
    assert(e.getMessage.contains("carries no PQ codes"))
  }

  test("residual-PQ index: exhaustive == brute force across append; flavor persists") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val corpus = vecs.where(col("vec_id") % 2 === 0)
    val shard = vecs.where(col("vec_id") % 2 === 1)
    val queries = vecs.where(col("vec_id") < 5)
    val n = vecs.count()
    val path = freshPath("pqres")
    val meta = AnnIndex.build(corpus, "vec_id", "embedding", path,
      nCentroids = 4, kmeansIters = 0, nBuckets = 2,
      pq = Some((4, 8)), pqIters = 1, pqResidual = true)
    assert(meta.pqResidual)
    AnnIndex.append(shard, path)
    assert(AnnIndex.readMeta(path).pqResidual)
    val brute = rows(Similarity.bruteForceTopK(
      vecs, queries, "vec_id", "embedding", k = 3))
    val indexed = rows(AnnIndex.queryTopKPq(
      queries, "vec_id", "embedding", path, k = 3,
      nProbe = meta.nCells, poolFactor = (n / 3 + 1).toInt))
    graft.core.Blocks.releaseAll()
    assert(indexed === brute,
      s"only-brute=${brute -- indexed} only-indexed=${indexed -- brute}")
  }

  test("MinIndexedAnnRecall: the declarable index-operations gate") {
    import graft.core.{DataRef, FrameSource}
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val path = freshPath("constraint")
    AnnIndex.build(vecs, "vec_id", "embedding", path,
      nCentroids = 4, kmeansIters = 0, nBuckets = 2, pq = Some((4, 8)))
    // ground truth at the constraint's own sample: nQueries ≥ corpus size
    // makes the stride 1, so BOTH sides query every vector (a smaller
    // nQueries hash-strides a different subset than a naive first-N);
    // measure the true nProbe = 1 recall, pin pass exactly at it, fail
    // just above it
    val nq = 1000
    val queries = vecs.sort(col("vec_id")).limit(nq)
    val truth = graft.ops.Similarity
      .bruteForceTopK(vecs, queries, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = AnnIndex
      .queryTopK(queries, "vec_id", "embedding", path, 3, nProbe = 1)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.core.Blocks.releaseAll()
    val r = approx.count(truth.contains).toDouble / truth.size
    assert(r > 0 && r < 0.999,
      s"fixture should give a starved single-probe recall strictly inside (0,1): $r")
    val ref = DataRef(FrameSource(vecs, "ann_recall_gate_t"))
    def gate(target: Double, compressed: Boolean = false) =
      graft.constraints.MinAnnRecall(
        ref, "vec_id", "embedding", Some(target), k = 3, nQueries = nq,
        method = if (compressed) "indexed_pq" else "indexed",
        indexPath = Some(path), nProbe = 1)
    val atR = gate(r).test(spark)
    assert(atR.outcome, s"manual r=$r truth=${truth.size} " +
      s"constraint said: ${atR.failureMessage.getOrElse("")}")
    val failing = gate(math.min(1.0, r + 0.001)).test(spark)
    assert(!failing.outcome)
    assert(failing.failureMessage.exists(_.contains("recall")))
    // the compressed read path gates too (full probes; the default
    // 4k ADC pool still truncates, so pin a floor, not exactness)
    assert(graft.constraints.MinAnnRecall(
      ref, "vec_id", "embedding", Some(0.1), k = 3, nQueries = nq,
      method = "indexed_pq", indexPath = Some(path), nProbe = 4)
      .test(spark).outcome)
    // knob misuse is loud: indexed without a path / a path on lsh
    intercept[IllegalArgumentException] {
      graft.constraints.MinAnnRecall(
        ref, "vec_id", "embedding", Some(0.9), method = "indexed")
    }
    intercept[IllegalArgumentException] {
      graft.constraints.MinAnnRecall(
        ref, "vec_id", "embedding", Some(0.9), method = "lsh",
        indexPath = Some(path))
    }
  }

  test("empty corpus builds an empty-but-typed index; queries return empty") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val path = freshPath("empty")
    val meta = AnnIndex.build(
      vecs.where(lit(false)), "vec_id", "embedding", path,
      nCentroids = 4, kmeansIters = 0, nBuckets = 2)
    assert(meta.nCells === 0)
    val out = AnnIndex.queryTopK(
      vecs.where(col("vec_id") < 3), "vec_id", "embedding", path,
      k = 3, nProbe = 2)
    assert(out.count() === 0)
    assert(out.columns.toSeq === Seq("query_id", "neighbor_id", "cosine", "rank"))
  }
}
