package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches, Spark-first: the sketch is a TABLE (a
  * `depth × width` grouped-count frame), not an opaque aggregation buffer —
  * partial aggregation gives the map-side combine a custom
  * TypedImperativeAggregate would hand-roll, `cmsMerge` is a union+re-agg
  * (associative and commutative, so daily sketches roll up into monthly
  * ones), and estimates are a broadcast join against ≤ depth·width rows.
  * A 100 TB value stream folds to a frame bounded by the sketch geometry
  * — nothing scales with the data.
  *
  * Hashing is cross-engine recomputable on purpose (row-salted md5, first
  * 15 hex digits, mod width — the `q_simhash_md5` precedent), so the
  * DuckDB oracle rebuilds the sketch AND the estimates bit-for-bit.
  */
object Sketches {

  /** Row-`d` CMS bucket of a value: `md5("d:value")`'s first 15 hex digits
    * mod `width` (positive — 15 hex digits < 2^60).
    */
  def cmsBucket(value: Column, d: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"$d:"), value.cast("string"))), 1, 15), 16, 10)
      .cast("long") % width

  /** Build the Count-Min sketch of `valueCol`: one row per non-empty
    * (cms_row, cms_bucket) cell with its collision-summed count. NULL
    * values are not counted (SQL aggregate convention).
    */
  def cmsSketch(
      df: DataFrame,
      valueCol: String,
      depth: Int = 4,
      width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad sketch geometry: $depth x $width")
    val cells = (0 until depth).map { d =>
      struct(lit(d).as("cms_row"), cmsBucket(col(valueCol), d, width).as("cms_bucket"))
    }
    df.where(col(valueCol).isNotNull)
      .select(explode(array(cells: _*)).as("dj_cell"))
      .groupBy(col("dj_cell.cms_row").as("cms_row"), col("dj_cell.cms_bucket").as("cms_bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketches of the SAME geometry: union + re-sum. Counter cells are
    * sums, so merge order never matters.
    */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("cms_row", "cms_bucket")
      .agg(sum(col("cnt")).as("cnt"))

  // --- Bloom filter: the set-membership sibling. The sketch is the table
  // of SET BIT POSITIONS (≤ m rows, distinct) — merge is union-distinct,
  // membership is a broadcast join. ---

  /** Hash-`d` bit position of a value (same salted-md5 family as CMS). */
  def bloomBit(value: Column, d: Int, bits: Int): Column =
    conv(substring(md5(concat(lit(s"b$d:"), value.cast("string"))), 1, 15), 16, 10)
      .cast("long") % bits

  /** Build a Bloom filter of `valueCol`: the distinct set-bit positions for
    * `hashes` salted hash rows over a `bits`-wide bit space.
    */
  def bloomSketch(
      df: DataFrame,
      valueCol: String,
      hashes: Int = 4,
      bits: Int = 1024): DataFrame = {
    require(hashes >= 1 && bits >= 1, s"bad bloom geometry: $hashes x $bits")
    val pos = (0 until hashes).map(d => bloomBit(col(valueCol), d, bits))
    df.where(col(valueCol).isNotNull)
      .select(explode(array(pos: _*)).as("bloom_bit"))
      .distinct()
  }

  /** Merge Bloom filters of the same geometry: bit-OR = union-distinct. */
  def bloomMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).distinct()

  /** Membership test: `might_contain` is true iff EVERY probe bit is set —
    * no false negatives, false-positive rate set by the geometry. The bit
    * table is tiny — broadcast.
    */
  def bloomContains(
      sketch: DataFrame,
      probes: DataFrame,
      valueCol: String,
      hashes: Int = 4,
      bits: Int = 1024): DataFrame = {
    val pos = (0 until hashes).map(d => bloomBit(col(valueCol), d, bits))
    probes
      .where(col(valueCol).isNotNull)
      .select(col(valueCol), explode(array(pos: _*)).as("bloom_bit"))
      .join(broadcast(sketch.withColumn("dj_set", lit(1))), Seq("bloom_bit"), "left")
      .groupBy(valueCol)
      .agg((min(coalesce(col("dj_set"), lit(0))) === 1).as("might_contain"))
  }

  // --- HyperLogLog: mergeable cardinality registers. The sketch is the
  // (bucket → max leading-zero rank) table (≤ 2^b rows); merge is a
  // union+max; the estimate is the standard bias-corrected harmonic mean
  // with the linear-counting small-range branch. The rank uses the exact
  // integer trick `rank = maxRank - length(bin(suffix)) + 1` (bin() exists
  // in both Spark and DuckDB and never emits leading zeros), so the whole
  // register table is integer-exact and the oracle rebuilds it
  // bit-for-bit. ---

  /** Number of suffix bits carried by the 60-bit md5 hash after `b` bucket
    * bits. */
  private def hllSuffixBits(b: Int): Int = 60 - b

  /** HLL register table of `valueCol` for `2^b` buckets: one row per
    * non-empty bucket with the max rank (position of the first 1-bit in
    * the hash suffix, 1-based; an all-zero suffix ranks suffixBits+1).
    */
  def hllSketch(df: DataFrame, valueCol: String, b: Int = 8): DataFrame = {
    require(b >= 4 && b <= 16, s"bucket bits out of range: $b")
    val m = 1 << b
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val bucket = h % m
    // integer shift, NOT `/` (Column division is double — a 60-bit hash
    // would lose low bits past the 53-bit mantissa)
    val suffix = shiftright(h, b)
    val rank = when(suffix === 0, lit(hllSuffixBits(b) + 1))
      .otherwise(lit(hllSuffixBits(b)) - length(bin(suffix)) + 1)
    df.where(col(valueCol).isNotNull)
      .select(bucket.as("hll_bucket"), rank.cast("int").as("dj_rank"))
      .groupBy("hll_bucket")
      .agg(max(col("dj_rank")).as("hll_register"))
  }

  /** Merge HLL register tables of the same geometry: per-bucket max. */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("hll_bucket").agg(max("hll_register").as("hll_register"))

  /** Per-GROUP HLL distinct-count estimates: one register table per
    * `keyCol` value (≤ 2^b rows each), folded straight to the estimate —
    * the scalable spelling of `groupBy(key).agg(countDistinct(v))` when
    * the per-key distinct sets are large (countDistinct shuffles every
    * distinct (key, value) pair; this shuffles at most 2^b register rows
    * per key, a geometry bound independent of the data). Same estimator
    * arithmetic as [[hllEstimate]] (exact integer-scaled decimal harmonic
    * sum, linear-counting branch below 2.5·m). Returns one row per key:
    * (`keyCol`, `n_hit`, `estimate`).
    */
  def hllGroupedEstimate(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      b: Int = 8): DataFrame = {
    require(b >= 4 && b <= 16, s"bucket bits out of range: $b")
    val m = 1 << b
    val sb = hllSuffixBits(b)
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val suffix = shiftright(h, b)
    val rank = when(suffix === 0, lit(sb + 1))
      .otherwise(lit(sb) - length(bin(suffix)) + 1)
    val registers = df
      .where(col(valueCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol), (h % m).as("hll_bucket"), rank.cast("int").as("dj_rank"))
      .groupBy(col(keyCol), col("hll_bucket"))
      .agg(max(col("dj_rank")).as("hll_register"))
    registers
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_hit"),
        sum(pow(lit(2.0), lit(sb) - col("hll_register")).cast("decimal(38,0)"))
          .as("dj_hitsum"))
      .select(
        col(keyCol),
        col("n_hit"),
        (lit(m) - col("n_hit")).as("dj_zero"),
        ((lit(alpha * m.toDouble * m) * math.pow(2.0, sb)) /
          (col("dj_hitsum").cast("double") +
            (lit(m) - col("n_hit")).cast("double") * math.pow(2.0, sb)))
          .as("dj_raw"))
      .select(
        col(keyCol),
        col("n_hit"),
        when(
          col("dj_raw") <= lit(2.5 * m) && col("dj_zero") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("dj_zero")))
          .otherwise(col("dj_raw"))
          .as("estimate"))
  }

  /** Cardinality estimate from a register table: one row —
    * (n_buckets_hit, n_zero_buckets, estimate). The harmonic-mean sum
    * `Σ 2^-reg` is computed EXACTLY as an integer-scaled decimal
    * (`Σ 2^(suffixBits-reg)` — every term a power of two ≤ 2^56), so the
    * only floating-point steps are one multiply/divide on identical inputs
    * (bit-deterministic cross-engine) and the `ln` of the linear-counting
    * branch (rounded by callers). Standard constants: α_m = 0.7213/(1 +
    * 1.079/m); linear counting below 2.5·m when empty buckets remain.
    */
  def hllEstimate(sketch: DataFrame, b: Int = 8): DataFrame = {
    val m = 1 << b
    val sb = hllSuffixBits(b)
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val agg = sketch.agg(
      count(lit(1)).as("n_hit"),
      // exact: each term 2^(sb - reg) is an integer power of two
      sum(pow(lit(2.0), lit(sb) - col("hll_register")).cast("decimal(38,0)"))
        .as("dj_hitsum"))
    agg.select(
      col("n_hit"),
      (lit(m) - col("n_hit")).as("n_zero_buckets"),
      // Σ over all m buckets of 2^-reg, scaled by 2^sb: hit buckets from
      // the exact decimal sum, the (m - n_hit) empty ones contribute 2^sb
      ((lit(alpha * m.toDouble * m) * math.pow(2.0, sb)) /
        (col("dj_hitsum").cast("double") +
          (lit(m) - col("n_hit")).cast("double") * math.pow(2.0, sb)))
        .as("dj_raw"))
      .select(
        col("n_hit"),
        col("n_zero_buckets"),
        when(
          col("dj_raw") <= lit(2.5 * m) && col("n_zero_buckets") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("n_zero_buckets")))
          .otherwise(col("dj_raw"))
          .as("estimate"))
  }

  /** Point-frequency estimates for `probes`' `valueCol`: min over the
    * sketch rows of the probed cell (0 for a never-hit cell). The classic
    * CMS guarantee holds: estimate ≥ true count, with overshoot bounded by
    * collisions. The sketch side is tiny — Spark broadcasts it.
    */
  def cmsEstimate(
      sketch: DataFrame,
      probes: DataFrame,
      valueCol: String,
      depth: Int = 4,
      width: Int = 256): DataFrame = {
    val cells = (0 until depth).map { d =>
      struct(lit(d).as("cms_row"), cmsBucket(col(valueCol), d, width).as("cms_bucket"))
    }
    probes
      .where(col(valueCol).isNotNull)
      .select(col(valueCol), explode(array(cells: _*)).as("dj_cell"))
      .select(col(valueCol), col("dj_cell.cms_row"), col("dj_cell.cms_bucket"))
      .join(broadcast(sketch), Seq("cms_row", "cms_bucket"), "left")
      .groupBy(valueCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_count"))
  }

  /** KMV hash: the same cross-engine md5-15-hex-digit convention as
    * [[cmsBucket]] — a uniform draw from [0, 2^60), recomputable by the
    * DuckDB oracle bit-for-bit.
    */
  def kmvHash(value: Column): Column =
    conv(substring(md5(value.cast("string")), 1, 15), 16, 10).cast("long")

  /** KMV (k-minimum-values / bottom-k) sketch (Bar-Yossef et al. 2002,
    * Beyer et al. SIGMOD 2007): the `k` DISTINCT values of `valueCol` with
    * the smallest [[kmvHash]] — ≤ `k` rows of (`kmv_hash`, `kmv_value`).
    * One sketch serves three reads: an unbiased distinct-count estimate
    * ([[kmvDistinctEstimate]]), a UNIFORM sample of the distinct-value
    * population (the hash order is value-independent), and quantile
    * estimates over that population ([[kmvQuantiles]]) — the sketch-family
    * member CMS/Bloom/HLL don't cover.
    *
    * Like the other sketches it is a TABLE: [[kmvMerge]] = union +
    * re-bottom-k (associative, commutative, idempotent — daily sketches
    * roll up into monthly ones), so incremental maintenance needs no
    * special state. Scale shape: partial aggregation dedups map-side, the
    * one exchange carries per-partition-distinct values only (the same
    * bound as every distinct aggregate in the engine), and the bottom-k is
    * `TakeOrderedAndProject` — per-partition k-bounded heaps, never a full
    * sort.
    */
  def kmvSketch(df: DataFrame, valueCol: String, k: Int = 256): DataFrame = {
    require(k >= 2, s"kmv k must be >= 2: $k")
    df.where(col(valueCol).isNotNull)
      .select(col(valueCol).cast("string").as("kmv_value"))
      .distinct()
      .select(kmvHash(col("kmv_value")).as("kmv_hash"), col("kmv_value"))
      .orderBy("kmv_hash")
      .limit(k)
  }

  /** Merge KMV sketches built with the same `k`: union, re-dedup (the same
    * value may appear in both), re-bottom-k.
    */
  def kmvMerge(a: DataFrame, b: DataFrame, k: Int = 256): DataFrame =
    a.unionByName(b).distinct().orderBy("kmv_hash").limit(k)

  /** Distinct-count estimate from a KMV sketch: with the sketch full
    * (`n_sketch = k`), the classic unbiased estimator `(k-1) / U_(k)`
    * where `U_(k)` is the k-th smallest normalized hash (the k-th order
    * statistic of n uniform draws ≈ k/n); under-full sketches saw every
    * distinct value, so the count is exact. One row:
    * (`n_sketch`, `estimate`).
    */
  def kmvDistinctEstimate(sketch: DataFrame, k: Int = 256): DataFrame =
    sketch
      .agg(count(lit(1)).as("n_sketch"), max(col("kmv_hash")).as("dj_hmax"))
      .select(
        col("n_sketch"),
        when(col("n_sketch") < k, col("n_sketch").cast("double"))
          .otherwise(
            round(lit((k - 1).toDouble) * math.pow(2.0, 60) /
              col("dj_hmax").cast("double")))
          .as("estimate"))

  /** Theta-style set-operation estimates from two KMV sketches built with
    * the same `k` (Beyer et al. 2007, "On Synopses for Distinct-Value
    * Estimation Under Multiset Operations"): the union's bottom-k hash set
    * `L` is a uniform sample of the union's distinct values, so
    * `ρ = |L ∩ A ∩ B| / |L|` estimates the distinct Jaccard and
    * `ρ · |A ∪ B|` the distinct intersection — the cross-corpus overlap
    * number ("how much of corpus B is already in A") from two k-row
    * tables, never a scan of either corpus. Under-full union sketches saw
    * every distinct value, so all three outputs are exact.
    *
    * One row: (`n_union_sketch`, `n_common`, `jaccard_est`, `union_est`,
    * `intersect_est`). Every frame involved is ≤ k rows — sketch-geometry
    * bounded, broadcast-sized by construction.
    */
  def kmvSetEstimates(a: DataFrame, b: DataFrame, k: Int = 256): DataFrame = {
    val merged = kmvMerge(a, b, k).select(col("kmv_hash"))
    val common = merged
      .join(a.select(col("kmv_hash")), Seq("kmv_hash"), "left_semi")
      .join(b.select(col("kmv_hash")), Seq("kmv_hash"), "left_semi")
      .agg(count(lit(1)).as("n_common"))
    val stats = merged.agg(
      count(lit(1)).as("n_union_sketch"), max(col("kmv_hash")).as("dj_hmax"))
    val unionEst =
      when(col("n_union_sketch") < k, col("n_union_sketch").cast("double"))
        .otherwise(
          round(lit((k - 1).toDouble) * math.pow(2.0, 60) /
            col("dj_hmax").cast("double")))
    val jaccard =
      when(col("n_union_sketch") > 0,
        col("n_common").cast("double") / col("n_union_sketch"))
    stats
      .crossJoin(common)
      .select(
        col("n_union_sketch"), col("n_common"),
        jaccard.as("jaccard_est"),
        unionEst.as("union_est"),
        (jaccard * unionEst).as("intersect_est"))
  }

  /** Quantile estimates over the DISTINCT-value population from a KMV
    * sketch: the sketch rows are a uniform sample of the distinct values,
    * so the empirical quantiles of `kmv_value` (cast numeric) estimate the
    * population's. Discrete-rank selection (`ceil(q·n)`, the engine's
    * exact-percentile convention) over the ≤ k sketch rows — one row per
    * requested quantile: (`quantile`, `value`).
    */
  def kmvQuantiles(sketch: DataFrame, quantiles: Seq[Double]): DataFrame = {
    require(quantiles.nonEmpty && quantiles.forall(q => q > 0 && q <= 1),
      s"quantiles must lie in (0, 1]: $quantiles")
    import org.apache.spark.sql.expressions.Window
    // ≤ k rows: the single-partition window is over sketch-geometry-bounded
    // data, never over corpus-scaled data
    val ranked = sketch
      .select(col("kmv_value").cast("double").as("dj_v"))
      .withColumn("dj_r", row_number().over(Window.orderBy(col("dj_v"))))
    val qs = quantiles.map(q => struct(lit(q).as("quantile")))
    ranked
      .crossJoin(ranked.select(count(lit(1)).as("dj_n")))
      .select(col("dj_v"), col("dj_r"), explode(array(qs: _*)).as("dj_q"), col("dj_n"))
      .where(col("dj_r") === greatest(lit(1), ceil(col("dj_q.quantile") * col("dj_n"))))
      .select(col("dj_q.quantile").as("quantile"), col("dj_v").as("value"))
  }
}
