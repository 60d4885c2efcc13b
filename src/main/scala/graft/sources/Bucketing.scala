package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout for co-located joins — the storage-side half of
  * the 100 TB join strategy: two tables bucketed by the same join keys
  * into the same bucket count are ALREADY hash-partitioned on disk, so a
  * join between them plans with no shuffle exchange on either side (and,
  * when each bucket is a single sorted file, no sort either — a
  * SortMergeJoin degenerates to a streaming zip of pre-sorted buckets).
  *
  * This is the layout to pre-materialize for fact tables that are joined
  * repeatedly on the same keys (orders ⋈ lineitem every round of a
  * validation suite): pay one shuffle at write time, then every subsequent
  * join is exchange-free. `BucketingSpec` pins the exchange-free plan.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table. `sortCols` defaulting to the
    * bucket keys gives within-bucket ordering; Spark only exploits it at
    * read time when each bucket holds a single file, so writers aiming for
    * sort elimination should coalesce to one task per write (small dims)
    * or accept the re-sort (large facts — the shuffle elimination is the
    * big win, the sort is cheap and local).
    *
    * Bucket-count choice at scale: buckets are the unit of read
    * parallelism for the join, so pick ~2-4× the executor-core count, and
    * keep it IDENTICAL across every table that must co-locate — Spark
    * only elides the exchange when both sides' bucket specs match the
    * join keys exactly.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      nBuckets: Int,
      sortCols: Seq[String] = Nil,
      mode: String = "overwrite"): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must not be empty")
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    val sorted = if (sortCols.isEmpty) bucketCols else sortCols
    df.write
      .mode(mode)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorted.head, sorted.tail: _*)
      .saveAsTable(table)
  }
}
