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
    * The salt is `monotonically_increasing_id % buckets` — correctness
    * never depends on WHICH salt a row gets (the small side carries every
    * salt value), so the id's retry/partitioning instability is harmless,
    * and unlike a full-row hash it spreads even a hot key made of
    * byte-identical duplicate rows (the normal pre-dedup corpus state,
    * where every copy would hash to the same bucket) and can't trip over
    * unhashable column types (maps).
    */
  def saltedJoin(
      skewed: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltBuckets: Int = 16): DataFrame = {
    val saltedLeft = skewed.withColumn(
      "dj_salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)).cast("int"))
    val replicatedRight = small
      .withColumn("dj_salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft
      .join(replicatedRight, keys :+ "dj_salt")
      .drop("dj_salt")
  }

  /** Heavy-hitter keys: keys covering strictly more than `threshold` of all
    * rows — the diagnosis step before salting. One scan of `df` (the
    * grouped counts are cached and the total derives from them), and the
    * threshold compares exactly — no floor/clamp, so a 50-row frame at 1%
    * does not report every key as hot.
    */
  def heavyHitters(
      df: DataFrame,
      keys: Seq[String],
      threshold: Double = 0.01): DataFrame = {
    val counts = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .cache()
    val total = counts.agg(coalesce(sum(col("n_rows")), lit(0L))).head().getLong(0)
    counts
      .where(col("n_rows") > lit(total * threshold))
      .withColumn("share", col("n_rows") / lit(total.toDouble))
  }
}
