package graft.core

/** Session-sizing heuristics shared by Bench / Verify / TimeQuery. */
object Tuning {

  /** AQE wide-start (`spark.sql.adaptive.coalescePartitions.initialPartitionNum`)
    * sized to the input directory instead of a flat 512.
    *
    * The flat wide-start was scale-motivated (the sf10 leg went superlinear
    * when 100× shuffle volume funneled through `cpus` reducers) but costs
    * ~2× fixed overhead on small many-stage queries at sf0.1
    * (q_numeric_gaps 1.6→3.0 s, q_dedup_clusters ~8 s of 512-partition
    * stage scheduling). Size it to the data: the heaviest pipelines
    * (shingle/n-gram explodes) multiply input ~16×, and a shuffle
    * partition should stay ≈64 MB to avoid spill, so target
    * `inputBytes / 4 MB` reducers, clamped to [cpus, 512].
    *   sf0.1 (~17 MB)  → cpus    (no overhead on small queries)
    *   sf1  (~170 MB)  → ~42
    *   sf10 (~1.7 GB)  → ~425    (keeps the r5 spill fix)
    */
  def wideStart(dir: String, cpus: Int): Int = {
    def bytes(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles).map(_.map(bytes).sum).getOrElse(0L)
    val b = bytes(new java.io.File(dir))
    math.max(cpus, math.min(512, (b / (4L << 20)).toInt))
  }
}
