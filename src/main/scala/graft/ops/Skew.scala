package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys. Spark's AQE skew-join handles most
  * cases at runtime; explicit salting remains the tool of choice when one
  * side must be replicated deterministically (e.g. a dimension joined
  * against a fact table where a handful of keys carry a large share of
  * rows — the classic 100 TB failure mode).
  */
object Skew {

  /** Salted inner equi-join: the skewed (large) side gets a salt in
    * [0, saltBuckets); the small side is replicated once per salt value.
    * The hot key's rows spread over `saltBuckets` reducers instead of one.
    *
    * Salt choice:
    *   - With `idCol` (any stable, reasonably-unique column): the salt is
    *     `pmod(xxhash64(idCol), buckets)` — fully DETERMINISTIC, so a stage
    *     recomputed after a shuffle-fetch failure reproduces the same
    *     mapping. Prefer this whenever an id exists.
    *   - Without: `monotonically_increasing_id % buckets`, which spreads
    *     even byte-identical duplicate rows of a hot key (the normal
    *     pre-dedup corpus state, where any content hash puts every copy in
    *     one bucket) and can't trip over unhashable column types (maps).
    *     CAVEAT: the id is Spark-NONDETERMINISTIC — if a map stage is
    *     recomputed after a fetch failure, re-salted rows can land in
    *     different buckets than already-fetched map output (the
    *     SPARK-23207 class of hazard), duplicating or dropping rows
    *     relative to a clean run. An INNER join's result set is the same
    *     either way only if the whole stage retries atomically; rely on
    *     the id salt only where the join output is re-derived
    *     idempotently, or pass `idCol`.
    */
  def saltedJoin(
      skewed: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltBuckets: Int = 16,
      idCol: Option[String] = None): DataFrame = {
    val saltExpr = idCol match {
      case Some(id) => pmod(xxhash64(col(id)), lit(saltBuckets.toLong)).cast("int")
      case None     => pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)).cast("int")
    }
    val saltedLeft = skewed.withColumn("dj_salt", saltExpr)
    val replicatedRight = small
      .withColumn("dj_salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft
      .join(replicatedRight, keys :+ "dj_salt")
      .drop("dj_salt")
  }

  /** Heavy-hitter keys: keys covering strictly more than `threshold` of all
    * rows — the diagnosis step before salting. The threshold compares
    * exactly — no floor/clamp, so a 50-row frame at 1% does not report
    * every key as hot.
    *
    * One input scan: the grouped counts are materialized by an eager
    * localCheckpoint (key-cardinality-sized, far smaller than the input),
    * the total reads that, and the returned frame filters it — the raw
    * input is never re-scanned. The returned frame is itself materialized
    * (strictly fewer than 1/threshold rows can exceed a `threshold` share,
    * so it is tiny by construction) and the key-cardinality-sized counts
    * checkpoint is released BEFORE returning — a long-lived session
    * diagnosing many corpora accumulates at most the hot-key rows, never
    * the count tables ([[graft.core.Blocks]] tracks the remainder).
    */
  def heavyHitters(
      df: DataFrame,
      keys: Seq[String],
      threshold: Double = 0.01): DataFrame = {
    val counts = graft.core.Blocks.checkpoint(
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_rows")))
    try {
      val total = counts.agg(coalesce(sum(col("n_rows")), lit(0L))).head().getLong(0)
      graft.core.Blocks.checkpoint(
        counts
          .where(col("n_rows") > lit(total * threshold))
          .withColumn("share", col("n_rows") / lit(total.toDouble)))
    } finally graft.core.Blocks.release(counts)
  }
}
