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

  /** Salted inner equi-join: the skewed (large) side gets a random-but-
    * deterministic salt in [0, saltBuckets); the small side is replicated
    * once per salt value. The hot key's rows spread over `saltBuckets`
    * reducers instead of one.
    *
    * Deterministic salt: hash of the full row modulo buckets (no rand() —
    * reproducible across retries, which a failed-stage recompute requires).
    */
  def saltedJoin(
      skewed: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltBuckets: Int = 16): DataFrame = {
    val saltedLeft = skewed.withColumn(
      "dj_salt",
      pmod(xxhash64(skewed.columns.map(col).toSeq: _*), lit(saltBuckets)).cast("int"))
    val replicatedRight = small
      .withColumn("dj_salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft
      .join(replicatedRight, keys :+ "dj_salt")
      .drop("dj_salt")
  }

  /** Heavy-hitter keys: keys covering more than `threshold` of all rows —
    * the diagnosis step before salting (one aggregation, map-side combined).
    */
  def heavyHitters(
      df: DataFrame,
      keys: Seq[String],
      threshold: Double = 0.01): DataFrame = {
    val total = df.count()
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .where(col("n_rows") >= lit(math.max(1L, (total * threshold).toLong)))
      .withColumn("share", col("n_rows") / lit(total.toDouble))
  }
}
