package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the persisted ANN index at a given dataset —
  * the diagnosis harness for the indexed-vs-live gap seen in the bench
  * profile (auto geometry probes most cells, so the probed-cell isin may
  * cost instead of pay). Usage:
  *   runMain graft.tools.AnnIndexProbe <dir-with-embeddings.parquet>
  */
object AnnIndexProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-ann-index-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft-probe-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // coarse sampling profiler: every 5 s, print the deepest frames of
    // the busiest RUNNABLE executor threads — enough to attribute a
    // 100-second mystery stage
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        Thread.sleep(5000)
        if (sampling) {
          import scala.jdk.CollectionConverters._
          val stacks = Thread.getAllStackTraces.asScala.toSeq
            .filter { case (t, st) =>
              t.getState == Thread.State.RUNNABLE && st.nonEmpty &&
                (t.getName.startsWith("Executor") || t.getName.contains("task"))
            }
          stacks.take(2).foreach { case (t, st) =>
            println(s"[stack] ${t.getName}: " +
              st.take(5).map(f => s"${f.getClassName}.${f.getMethodName}:${f.getLineNumber}")
                .mkString(" <- "))
          }
        }
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    def profiled[T](tag: String)(body: => T): T = {
      sampling = true
      try timed(tag)(body) finally { sampling = false }
    }
    val S = graft.ops.Similarity
    val v = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = v.count()
    val k = 10
    val (nCents, nProbe) = S.ivfAutoParams(n, k)
    println(s"[probe] n=$n nCents=$nCents nProbe=$nProbe")
    val queries = v.where(pmod(col("vec_id"), lit(math.max(1L, n / 200L))) === 0)
    val path = "/tmp/graft_probe_ann_index"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) { val kk = f.listFiles(); if (kk != null) kk.foreach(rm) }
      f.delete(): Unit
    }
    rm(new java.io.File(path))

    // build, decomposed
    val centroids = timed("fit")(
      S.fitCentroids(v, "vec_id", "embedding", nCents, 0, Some(n)))
    val assigned = S.assignToCentroids(
      v.where(col("vec_id").isNotNull), "vec_id", "embedding", centroids)
    timed("assign+count")(assigned.count())
    val cb = timed("pq train")(graft.ops.Pq.trainCodebooks(
      v, "vec_id", "embedding", 8, 256, 1, Some(n)))
    timed("saveCentroids")(graft.sources.DedupIndex.saveCentroids(
      spark, path, centroids))
    println("[plan] aggregate nodes in the assignment plan:")
    assigned.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Aggregate") || l.contains("Exchange") || l.contains("Scan parquet"))
      .take(12).foreach(l => println("[plan] " + l.trim.take(160)))
    timed("toRdd count (non-AQE)")(assigned.queryExecution.toRdd.count())
    val ckAssigned = profiled("checkpoint assigned")(
      graft.core.Blocks.checkpoint(assigned))
    timed("write ckpt bucketBy")(
      ckAssigned.write.mode("overwrite")
        .bucketBy(32, "cluster").sortBy("cluster")
        .option("path", s"$path/postings_probe1")
        .saveAsTable("graft_probe_postings1"))
    timed("write lazy bucketBy")(
      assigned.write.mode("overwrite")
        .bucketBy(32, "cluster").sortBy("cluster")
        .option("path", s"$path/postings_probe2")
        .saveAsTable("graft_probe_postings2"))
    timed("write lazy plain parquet")(
      assigned.write.mode("overwrite").parquet(s"$path/postings_probe3"))
    timed("full build (w/ pq)")(graft.sources.AnnIndex.build(
      v, "vec_id", "embedding", path,
      nCentroids = nCents, kmeansIters = 0, corpusSize = Some(n),
      pq = Some((8, 256)), pqIters = 1))
    timed("build no-pq (overwrite)")(graft.sources.AnnIndex.build(
      v, "vec_id", "embedding", path,
      nCentroids = nCents, kmeansIters = 0, corpusSize = Some(n)))

    // query, decomposed
    val idx = timed("open")(graft.sources.AnnIndex.open(spark, path))
    val probes = timed("probes+checkpoint")(graft.core.Blocks.checkpoint(
      S.ivfQueryProbes(queries, "vec_id", "embedding", idx.centroids,
        math.min(nProbe, idx.centroids.size))))
    val cells = timed("cells collect")(
      probes.select("cluster").distinct().collect().map(_.getLong(0)).toSeq)
    println(s"[probe] probed cells: ${cells.size} of ${idx.meta.nCells}")
    timed("rank WITH isin")(
      S.ivfRank(idx.postings.where(col("cluster").isin(cells: _*)), probes, k)
        .count())
    timed("rank NO isin")(
      S.ivfRank(idx.postings, probes, k).count())
    timed("rank isin 2nd run")(
      S.ivfRank(idx.postings.where(col("cluster").isin(cells: _*)), probes, k)
        .count())
    timed("queryTopK e2e")(graft.sources.AnnIndex.queryTopK(
      queries, "vec_id", "embedding", path, k, nProbe).count())
    timed("live ivfTopK e2e")(S.ivfTopK(
      v, queries, "vec_id", "embedding", k,
      nCentroids = nCents, nProbe = nProbe, kmeansIters = 0,
      corpusSize = Some(n)).count())
    graft.core.Blocks.releaseAll()
    rm(new java.io.File(path))
    spark.stop()
  }
}
