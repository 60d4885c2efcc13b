package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance resampling for training-corpus selection (public
  * method: Xie et al., "Data Selection for Language Models via Importance
  * Resampling", NeurIPS 2023): hashed-n-gram bag features, per-bucket
  * target/raw distributions with additive smoothing, per-document
  * importance log-weights log(p_target(doc)/p_raw(doc)), and deterministic
  * Gumbel-top-k sampling ∝ the importance weights. Beyond-reference: the
  * reference has no corpus-selection surface at all.
  *
  * 100 TB posture: the feature space is FIXED at `nBuckets` regardless of
  * corpus size — each side's distribution is one map-side-combined hash
  * aggregate collapsing to ≤ nBuckets rows, the log-ratio table is
  * bucket-sized and broadcast to the per-document scoring join (never a
  * shuffle of the corpus against the vocabulary), and selection is one
  * top-k over doc-level rows. Nothing in the plan scales with the raw
  * corpus beyond the two aggregate scans and the per-doc aggregate.
  *
  * Hash flavors: `md5Flavor = false` (default) hashes grams with
  * `xxhash64` — codegen'd, no string materialization beyond the gram
  * itself; `md5Flavor = true` derives the bucket from the first 15 md5 hex
  * digits, reproducible in any engine (the DuckDB gate oracle computes the
  * identical buckets — same convention as the SimHash md5 gate flavor).
  */
object Dsir {

  /** Non-empty normalized tokens of `textCol` (the shared
    * [[TextAnalysis.tokens]] tokenization with empties dropped — the rule
    * both unigrams and bigram adjacency run over).
    */
  private def cleanTokens(textCol: Column): Column =
    filter(TextAnalysis.tokens(textCol), t => t =!= "")

  /** Per-document gram multiset (unigrams + space-joined bigrams over the
    * empty-filtered token list), exploded to one row per occurrence.
    */
  private[graft] def gramRows(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // spread BEFORE the per-row tokenize/explode/hash work (r15, guide
    // §2.5): a small parquet input arrives as 1-2 splits and the gram
    // kernel would run nearly serial; at scale the scan has plenty of
    // splits and this no-ops
    val base = Dedup
      .spread(df.where(col(textCol).isNotNull)
        .select(col(idCol), col(textCol)))
      .select(col(idCol), cleanTokens(col(textCol)).as("dj_toks"))
    val nBi = greatest(size(col("dj_toks")) - 1, lit(0))
    val grams = concat(
      col("dj_toks"),
      zip_with(
        slice(col("dj_toks"), lit(1), nBi),
        slice(col("dj_toks"), lit(2), nBi),
        (a, b) => concat(a, lit(" "), b)))
    base.select(col(idCol), explode(grams).as("dj_gram"))
  }

  /** Bucket of one gram: `hash(gram) mod nBuckets`, non-negative. */
  private[graft] def bucketOf(gram: Column, nBuckets: Int, md5Flavor: Boolean): Column =
    if (md5Flavor)
      // fused md5-prefix expression (r15): bit-identical to
      // conv(substring(md5(gram cast binary), 1, 15), 16, 10) cast long,
      // minus the hex-string render + substring + decimal-string parse
      pmod(
        graft.functions.Md5Lattice.md5PrefixLong(gram, 15),
        lit(nBuckets.toLong))
    else pmod(xxhash64(gram), lit(nBuckets.toLong))

  /** One side's hashed feature histogram: (dj_bucket, dj_cnt), ≤ nBuckets
    * rows out of one map-side-combined aggregate.
    */
  private def bucketCounts(
      df: DataFrame,
      textCol: String,
      idCol: String,
      nBuckets: Int,
      md5Flavor: Boolean): DataFrame =
    gramRows(df, textCol, idCol)
      .select(bucketOf(col("dj_gram"), nBuckets, md5Flavor).as("dj_bucket"))
      .groupBy(col("dj_bucket"))
      .agg(count(lit(1)).as("dj_cnt"))

  /** Collected bucket histogram: Map(bucket → count), ≤ `nBuckets` entries
    * — geometry-bounded (the centroid-collect class), safe to pull to the
    * driver at any corpus size.
    */
  private def countsMap(counts: DataFrame): Map[Long, Long] =
    counts.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** The full-spine (dj_bucket, dj_ct, dj_cr) frame as a LOCAL relation
    * from two collected histograms — exactly the rows the former
    * range-spine double left-join produced, with zero distributed work.
    */
  private def localSpine(
      spark: org.apache.spark.sql.SparkSession,
      nBuckets: Int,
      tgtM: Map[Long, Long],
      rwM: Map[Long, Long]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = (0L until nBuckets.toLong).map { b =>
      org.apache.spark.sql.Row(
        b,
        tgtM.get(b).map(java.lang.Long.valueOf).orNull,
        rwM.get(b).map(java.lang.Long.valueOf).orNull)
    }.asJava
    spark.createDataFrame(
      rows,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "dj_bucket", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField(
          "dj_ct", org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField(
          "dj_cr", org.apache.spark.sql.types.LongType, nullable = true))))
  }

  /** Per-bucket importance log-ratio table over the FULL bucket spine
    * (empty buckets carry their smoothed term — additive 0.5 smoothing,
    * p(b) = (c_b + 0.5) / (N + 0.5·nBuckets)):
    * (dj_bucket, dj_lr DECIMAL(20,12)). Exactly nBuckets rows, built as a
    * LOCAL relation from collected histograms: as a lazy subplan every
    * consumer (the eager totals AND the scoring join) re-ran both sides'
    * full gram-explode+hash scans — 3 corpus passes where 1 suffices
    * (r14, optimization guide §1.2/§2.4). Same Spark expressions over the
    * same values ⇒ bit-identical dj_lr.
    */
  private[graft] def logRatioTable(
      target: DataFrame,
      raw: DataFrame,
      textCol: String,
      idCol: String,
      nBuckets: Int,
      md5Flavor: Boolean): DataFrame =
    localLogRatio(
      raw.sparkSession, nBuckets,
      countsMap(bucketCounts(target, textCol, idCol, nBuckets, md5Flavor)),
      countsMap(bucketCounts(raw, textCol, idCol, nBuckets, md5Flavor)))

  private def localLogRatio(
      spark: org.apache.spark.sql.SparkSession,
      nBuckets: Int,
      tgtM: Map[Long, Long],
      rwM: Map[Long, Long]): DataFrame = {
    val denomT = tgtM.values.sum.toDouble + 0.5 * nBuckets
    val denomR = rwM.values.sum.toDouble + 0.5 * nBuckets
    localSpine(spark, nBuckets, tgtM, rwM)
      .select(
        col("dj_bucket"),
        // decimal(20,12), NOT (28,12): the per-doc scoring multiplies this
        // by a count — (20,12)·(17,0) fits precision 38 with the scale
        // intact, while a wider operand trips Spark's precision-loss rule
        // (allowPrecisionLoss clamps the product scale to 6, quantizing
        // every term; |ln ratio| < 40 needs only 2 integral digits anyway)
        log(
          ((coalesce(col("dj_ct"), lit(0L)) + 0.5) / lit(denomT)) /
            ((coalesce(col("dj_cr"), lit(0L)) + 0.5) / lit(denomR)))
          .cast("decimal(20,12)")
          .as("dj_lr"))
  }

  /** Per-document importance log-weight of each raw document against the
    * target distribution: (idCol, n_features BIGINT, logw DECIMAL(38,12)).
    * `logw = Σ_buckets count_b(doc) · lr_b` — the decimal sum is exact, so
    * the value is reproducible across engines and summation orders.
    * Documents with no features (NULL or token-free text) are absent.
    *
    * EAGER contract: CONSTRUCTING the frame runs the distribution
    * aggregates (the raw side's per-doc bucket counts are CHECKPOINTED —
    * one gram-explode+hash pass serves the raw histogram AND the scoring
    * join, where the lazy-lr spelling re-ran it three times; the target
    * side is one scan collapsing to ≤ nBuckets rows). Only the final
    * scoring join/aggregate stays lazy; release the tracked block with
    * `Blocks.releaseAll()` (or a `Blocks.scoped`) after consuming.
    */
  def importanceWeights(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      idCol: String,
      nBuckets: Int = 4096,
      md5Flavor: Boolean = false): DataFrame = {
    val docBuckets = graft.core.Blocks.checkpoint(
      gramRows(raw, textCol, idCol)
        .select(
          col(idCol),
          bucketOf(col("dj_gram"), nBuckets, md5Flavor).as("dj_bucket"))
        .groupBy(col(idCol), col("dj_bucket"))
        .agg(count(lit(1)).as("dj_cnt")))
    // raw-side histogram derived from the checkpoint (identical totals —
    // per-bucket counts of the same gram multiset), not a second corpus scan
    val rwM = countsMap(
      docBuckets.groupBy(col("dj_bucket")).agg(sum(col("dj_cnt")).as("dj_cnt")))
    val tgtM = countsMap(
      bucketCounts(target, textCol, idCol, nBuckets, md5Flavor))
    val lr = localLogRatio(raw.sparkSession, nBuckets, tgtM, rwM)
    docBuckets
      .join(broadcast(lr), Seq("dj_bucket"))
      .groupBy(col(idCol))
      .agg(
        sum(col("dj_cnt")).as("n_features"),
        // (17,0)·(20,12) → decimal(38,12) EXACTLY (no precision-loss
        // rescale); the sum is then an exact decimal in any order
        sum(col("dj_cnt").cast("decimal(17,0)") * col("dj_lr"))
          .cast("decimal(38,12)").as("logw"))
  }

  /** KL(raw ‖ target) over the smoothed hashed-feature distributions:
    * Σ_b p_raw(b) · ln(p_raw(b)/p_target(b)) with the same 0.5-additive
    * smoothing as [[logRatioTable]], summed over the FULL bucket spine —
    * the scalar text-distribution-drift measure behind the between-corpus
    * constraint (a hashed-n-gram sibling of the numeric PSI drift). Terms
    * are decimal-cast before the sum, so the value is deterministic across
    * partial-aggregation orders. Two bucket-sized aggregates; nothing
    * corpus-scaled beyond the scans.
    */
  def hashedNgramKl(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      nBuckets: Int = 4096,
      md5Flavor: Boolean = false): Double =
    hashedNgramKlFrame(raw, target, textCol, nBuckets, md5Flavor)
      .head().getDecimal(0).doubleValue()

  /** [[hashedNgramKl]] as a 1-row frame `(kl DECIMAL(38,12))` — the exact
    * decimal the gate oracle rebuilds. EAGER contract: constructing the
    * frame runs the two distribution aggregates (the totals size the
    * smoothing denominators).
    */
  def hashedNgramKlFrame(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      nBuckets: Int = 4096,
      md5Flavor: Boolean = false): DataFrame = {
    val spark = raw.sparkSession
    // ONE aggregate scan per side: collect the ≤ nBuckets histograms and
    // evaluate the KL sum over a local spine — the lazy-frame spelling ran
    // each side's gram scan twice (the eager total + the final aggregate).
    // Identical expressions over identical values ⇒ bit-identical kl.
    def counts(df: DataFrame) = countsMap(
      bucketCounts(df.withColumn("dj_kid", lit(0L)), textCol, "dj_kid",
        nBuckets, md5Flavor))
    val tgtM = counts(target)
    val rwM = counts(raw)
    val denomT = tgtM.values.sum.toDouble + 0.5 * nBuckets
    val denomR = rwM.values.sum.toDouble + 0.5 * nBuckets
    val pR = (coalesce(col("dj_cr"), lit(0L)) + 0.5) / lit(denomR)
    val pT = (coalesce(col("dj_ct"), lit(0L)) + 0.5) / lit(denomT)
    localSpine(spark, nBuckets, tgtM, rwM)
      .agg(sum((pR * log(pR / pT)).cast("decimal(20,12)"))
        .cast("decimal(38,12)").as("kl"))
  }

  /** Deterministic uniform in (0, 1) from a document id and seed: the
    * first 13 md5 hex digits (52 bits — exactly a double's mantissa, so
    * the dyadic fraction is exact in every engine) of `id:seed`, offset by
    * half a lattice step to keep u strictly inside (0, 1).
    */
  private[graft] def hashUniform(idCol: Column, seed: String): Column =
    // fused md5-prefix expression (r15) — same value as the former
    // conv(substring(md5(...), 1, 13), 16, 10) cast long chain
    (graft.functions.Md5Lattice.md5PrefixLong(
      concat(idCol.cast("string"), lit(":" + seed)), 13) + 0.5) /
      lit(4503599627370496.0) // 2^52

  /** Gumbel-top-k resampling ∝ exp(logw): per document the key is
    * `g = logw − ln(−ln(u))` with `u = hashUniform(id, seed)` — taking the
    * k largest keys samples k documents without replacement with
    * probability proportional to their importance weights (the Gumbel-max
    * trick), deterministically in the seed. Returns the selected rows:
    * (idCol, n_features, logw, gumbel DOUBLE, rank BIGINT), rank 1..k by
    * (gumbel desc, id asc).
    */
  def resample(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      idCol: String,
      k: Int,
      seed: String = "dsir",
      nBuckets: Int = 4096,
      md5Flavor: Boolean = false): DataFrame = {
    val w = importanceWeights(raw, target, textCol, idCol, nBuckets, md5Flavor)
    val g = w.withColumn(
      "gumbel",
      col("logw").cast("double") - log(-log(hashUniform(col(idCol), seed))))
    // distributed top-k FIRST (orderBy+limit collapses to
    // TakeOrderedAndProject — per-partition heaps, no global sort, no
    // corpus-wide single-reducer window); only the k selected rows then
    // pass through the rank window, whose single partition is k-bounded
    // by construction
    g.orderBy(col("gumbel").desc, col(idCol).asc)
      .limit(k)
      .withColumn(
        "rank",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("gumbel").desc, col(idCol).asc)))
  }
}
