package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Pq, Similarity}
import graft.sources.AnnIndex

/** Recall-targeted PQ pool sizing (r11 verdict task: poolFactor was a hand
  * knob) and the persisted-index tiers of `annTopKAuto`.
  */
class PqAutoSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"
  private lazy val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
  private lazy val n = vecs.count()
  private val k = 5

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
    }
    f.delete(): Unit
  }

  test("autoPoolFactor: chosen factor meets the target or is the ladder top") {
    val (pf, recall) = Pq.autoPoolFactor(
      vecs, "vec_id", "embedding", k,
      nCentroids = 8, nProbe = 8, m = 4, ks = 16,
      recallTarget = 0.9, corpusSize = Some(n))
    assert(Pq.PoolFactorLadder.contains(pf))
    assert(recall >= 0.9 || pf == Pq.PoolFactorLadder.last,
      s"pf=$pf recall=$recall neither meets 0.9 nor is the ladder top")
    // every cell probed → pool truncation is the ONLY approximation, so a
    // big enough pool must reach exact recall on the probe set
    val (pfAll, recallAll) = Pq.autoPoolFactor(
      vecs, "vec_id", "embedding", k,
      nCentroids = 8, nProbe = 8, m = 4, ks = 16,
      recallTarget = 1.0, corpusSize = Some(n))
    assert(recallAll == 1.0 || pfAll == Pq.PoolFactorLadder.last)
  }

  test("autoPoolFactor probe recall equals a direct ivfpqTopK measurement") {
    // re-derive the sizer's internal probe set (stride-sampled by id hash)
    // and check the one-pass pool-rank recall against an independent
    // end-to-end run at the chosen factor — pinning the "exact rerank
    // can't evict a true neighbor" argument the one-pass trick rests on
    val (pf, reported) = Pq.autoPoolFactor(
      vecs, "vec_id", "embedding", k,
      nCentroids = 8, nProbe = 2, m = 4, ks = 16,
      recallTarget = 0.95, corpusSize = Some(n))
    val step = math.max(1L, n / 64)
    val probes = vecs
      .where(col("vec_id").isNotNull && col("embedding").isNotNull &&
        pmod(xxhash64(col("vec_id")), lit(step)) === 0)
      .sort(col("vec_id"))
      .limit(64)
    val truth = Similarity
      .bruteForceTopK(vecs, probes, "vec_id", "embedding", k)
      .select(col("query_id"), col("neighbor_id"))
    val approx = Pq.ivfpqTopK(
      vecs, probes, "vec_id", "embedding", k,
      nCentroids = 8, nProbe = 2, m = 4, ks = 16, poolFactor = pf,
      kmeansIters = 0, pqIters = 1, corpusSize = Some(n))
      .select(col("query_id"), col("neighbor_id"))
    val nTruth = truth.count().toDouble
    val measured =
      truth.join(approx, Seq("query_id", "neighbor_id"), "left_semi").count() / nTruth
    assert(math.abs(measured - reported) < 1e-9,
      s"one-pass recall $reported != end-to-end recall $measured at pf=$pf")
  }

  test("annTopKAuto with indexPath: builds once, uncompressed tier below PqTierMinCorpus") {
    val path = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_pqauto_idx").getAbsolutePath
    rm(new java.io.File(path))
    try {
      val queries = vecs.where(col("vec_id") < 5)
      val auto = Similarity.annTopKAuto(
        vecs, queries, "vec_id", "embedding", k, corpusSize = n,
        indexPath = Some(path))
      assert(AnnIndex.exists(path), "auto dispatch did not build the index")
      assert(AnnIndex.readMeta(path).pqM == 8,
        "auto-built index should carry PQ codes for the future compressed tier")
      // n << PqTierMinCorpus → the uncompressed read path answers
      assert(Similarity.annAutoIndexedMethod(pqCarrying = true, n) == "indexed")
      val (_, nProbe) = Similarity.ivfAutoParams(n, k)
      val direct = AnnIndex.queryTopK(queries, "vec_id", "embedding", path, k, nProbe)
      val a = auto.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      val d = direct.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      assert(a == d, "indexed auto dispatch diverged from AnnIndex.queryTopK")
      // second call must NOT rebuild: mutate nothing, answer identical
      val again = Similarity.annTopKAuto(
        vecs.limit(0), queries, "vec_id", "embedding", k, corpusSize = n,
        indexPath = Some(path))
      assert(again.count() == auto.count(),
        "repeat indexed query re-read the (empty stand-in) corpus instead of the index")
    } finally {
      rm(new java.io.File(path))
      graft.core.Blocks.releaseAll()
    }
  }

  test("autoPoolFactorCached: sidecar round-trip, append invalidates the stamp") {
    val path = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_pqauto_cache").getAbsolutePath
    rm(new java.io.File(path))
    try {
      AnnIndex.build(vecs.where(col("vec_id") % 2 === 0), "vec_id", "embedding",
        path, nCentroids = 8, kmeansIters = 0, nBuckets = 2,
        pq = Some((4, 16)), pqIters = 0)
      val first = AnnIndex.autoPoolFactorCached(spark, path, k, nProbe = 8)
      val uncached = AnnIndex.autoPoolFactor(spark, path, k, nProbe = 8)
      assert(first == uncached, "cached first call diverged from the direct sizer")
      val sidecar = new java.io.File(path)
        .listFiles().filter(_.getName.startsWith("autopool_"))
      assert(sidecar.length == 1, "sizing sidecar not written")
      val t0 = System.nanoTime()
      val second = AnnIndex.autoPoolFactorCached(spark, path, k, nProbe = 8)
      val t = (System.nanoTime() - t0) / 1e9
      assert(second == first)
      assert(t < 0.5, s"repeat cached call took ${t}s — it re-probed instead of reading")
      // append changes the postings stamp: the entry must not be served stale
      val stale = new String(java.nio.file.Files.readAllBytes(sidecar.head.toPath))
      AnnIndex.append(vecs.where(col("vec_id") % 2 === 1), path)
      val third = AnnIndex.autoPoolFactorCached(spark, path, k, nProbe = 8)
      assert(Pq.PoolFactorLadder.contains(third._1))
      val refreshed = new String(java.nio.file.Files.readAllBytes(sidecar.head.toPath))
      assert(refreshed != stale, "sidecar not re-stamped after append")
    } finally {
      rm(new java.io.File(path))
      graft.core.Blocks.releaseAll()
    }
  }

  test("annTopKAuto pq tier: forced via pqMinCorpus, equals queryTopKPq at the auto pool") {
    val path = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_pqauto_idx2").getAbsolutePath
    rm(new java.io.File(path))
    try {
      val queries = vecs.where(col("vec_id") < 5)
      assert(
        Similarity.annAutoIndexedMethod(pqCarrying = true, n, pqMinCorpus = 1)
          == "indexed_pq")
      val auto = Similarity.annTopKAuto(
        vecs, queries, "vec_id", "embedding", k, corpusSize = n,
        indexPath = Some(path), pqMinCorpus = 1, recallTarget = 0.85)
      val (_, nProbe) = Similarity.ivfAutoParams(n, k)
      val (pf, probeRecall) =
        AnnIndex.autoPoolFactor(spark, path, k, nProbe, recallTarget = 0.85)
      assert(Pq.PoolFactorLadder.contains(pf))
      assert(probeRecall >= 0.85 || pf == Pq.PoolFactorLadder.last)
      val direct =
        AnnIndex.queryTopKPq(queries, "vec_id", "embedding", path, k, nProbe, pf)
      val a = auto.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      val d = direct.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      assert(a == d, "pq auto dispatch diverged from queryTopKPq at the auto pool factor")
    } finally {
      rm(new java.io.File(path))
      graft.core.Blocks.releaseAll()
    }
  }
}
