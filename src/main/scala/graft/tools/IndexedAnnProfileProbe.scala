package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off: run the bench's indexed-ANN profile (incl. the r12 auto-pool
  * fields) against a leg and print the JSON it would embed.
  */
object IndexedAnnProfileProbe {
  def main(args: Array[String]): Unit = {
    // the profile lives inside Bench.main's scope — replicate its essentials
    // by running the bench with only this profile enabled is impractical;
    // instead exercise the underlying pieces the profile composes
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val S = graft.ops.Similarity
    val v = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = v.count()
    val k = 10
    val (nCents, nProbe) = S.ivfAutoParams(n, k)
    val path = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_iap_probe").getAbsolutePath
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) { val kk = f.listFiles(); if (kk != null) kk.foreach(rm) }
      f.delete(): Unit
    }
    rm(new java.io.File(path))
    graft.sources.AnnIndex.build(v, "vec_id", "embedding", path,
      nCentroids = nCents, kmeansIters = 0, corpusSize = Some(n),
      pq = Some((8, 256)), pqIters = 1): Unit
    val (pf, probeRec) = graft.sources.AnnIndex.autoPoolFactorCached(
      spark, path, k, nProbe, recallTarget = 0.85)
    println(s"IAPPROBE pool=$pf probe_recall=$probeRec")
    val qStep = math.max(1L, n / 200L)
    val queries = v.where(pmod(col("vec_id"), lit(qStep)) === 0)
    val r = graft.sources.AnnIndex.queryTopKPq(
      queries, "vec_id", "embedding", path, k, nProbe, pf).count()
    println(s"IAPPROBE pq_rows=$r")
    rm(new java.io.File(path))
    spark.stop()
  }
}
