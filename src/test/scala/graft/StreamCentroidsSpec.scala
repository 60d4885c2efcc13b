package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity
import graft.streaming.StreamingCentroids

/** Pins the batch/streaming quantizer-geometry contract: a static feed
  * processed as one micro-batch reproduces exactly one Lloyd iteration of
  * the batch fitter (same seeds → same assignments), and the foreachBatch
  * sink absorbs a genuine multi-batch file stream into a valid quantizer.
  */
class StreamCentroidsSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  private def assignments(
      v: org.apache.spark.sql.DataFrame,
      cents: Seq[(Long, Seq[Double])]): Map[Long, Long] =
    Similarity.assignToCentroids(v, "vec_id", "embedding", cents)
      .select(col("neighbor_id"), col("cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("one static micro-batch == one batch Lloyd iteration (same assignments)") {
    val v = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = v.count()
    val seeds = Similarity.fitCentroids(
      v, "vec_id", "embedding", nCentroids = 16, lloydIters = 0,
      corpusSize = Some(n))
    val lloyd1 = Similarity.fitCentroids(
      v, "vec_id", "embedding", nCentroids = 16, lloydIters = 1,
      corpusSize = Some(n))
    val sc = new StreamingCentroids(seeds)
    sc.update(v, "vec_id", "embedding")
    assert(sc.absorbed === n)
    assert(sc.centroids.map(_._1) === seeds.map(_._1), "ids/order preserved")
    assert(assignments(v, sc.centroids) === assignments(v, lloyd1),
      "streaming one-batch refinement must assign identically to batch Lloyd-1")
  }

  test("empty-cluster rule: a cluster no row reaches keeps its seed") {
    import spark.implicits._
    // two tight groups at +1 and -1; a zero seed (id 99) loses every
    // dot-product argmax (0 < 4 on both groups) and must survive verbatim
    val vecs = ((1 to 5).map(i => (i.toLong, Array.fill(4)(1.0f))) ++
      (6 to 10).map(i => (i.toLong, Array.fill(4)(-1.0f))))
      .toDF("vec_id", "embedding")
    val seeds = Seq(
      1L -> Seq(1.0, 1.0, 1.0, 1.0),
      6L -> Seq(-1.0, -1.0, -1.0, -1.0),
      99L -> Seq(0.0, 0.0, 0.0, 0.0))
    val sc = new StreamingCentroids(seeds)
    sc.update(vecs, "vec_id", "embedding")
    val byId = sc.centroids.toMap
    assert(byId(99L) === Seq(0.0, 0.0, 0.0, 0.0), "untouched seed kept")
    assert(byId(1L) === Seq(1.0, 1.0, 1.0, 1.0), "mean of identical members")
    assert(byId(6L) === Seq(-1.0, -1.0, -1.0, -1.0))
  }

  test("foreachBatch sink absorbs a multi-batch file stream into a valid quantizer") {
    val v = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = v.count()
    val seeds = Similarity.fitCentroids(
      v, "vec_id", "embedding", nCentroids = 8, lloydIters = 0,
      corpusSize = Some(n))
    val sc = new StreamingCentroids(seeds)
    // the fixture is a single parquet file; the file SOURCE needs a
    // directory — re-write as three files so maxFilesPerTrigger = 1 yields
    // a genuine multi-batch stream
    val feedDir = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_stream_cents_feed")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) { val k = f.listFiles(); if (k != null) k.foreach(rm) }
      f.delete(): Unit
    }
    rm(feedDir)
    v.repartition(3).write.parquet(feedDir.getAbsolutePath)
    val stream = spark.readStream
      .schema(v.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(feedDir.getAbsolutePath)
    val q = stream.writeStream
      .foreachBatch(sc.sink("vec_id", "embedding"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(sc.absorbed === n, "every streamed row folds into the quantizer")
    val assigned = assignments(v, sc.centroids)
    assert(assigned.size.toLong === n)
    val seedIds = seeds.map(_._1).toSet
    assert(assigned.values.forall(seedIds.contains), "clusters stay in the seed set")
  }
}
