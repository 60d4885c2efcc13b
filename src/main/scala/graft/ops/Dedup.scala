package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard. All sketches are computed with codegen'd
  * higher-order functions (no UDFs); all candidate generation is
  * equi-join-shaped (shuffle on bucket keys), never O(n²) — the brute-force
  * pairwise variants exist only as small-scale verification oracles.
  *
  * 100 TB posture:
  *   - Signatures/sketches are one narrow projection per document — a single
  *     map-side pass over the corpus.
  *   - LSH candidate generation explodes B band keys per doc (linear blowup,
  *     B ≈ 16) and shuffles on (band, bucket): a standard hash join. Hot
  *     buckets (boilerplate docs) are capped via `maxBucketSize`.
  *   - Verification re-joins candidate pairs to per-doc shingle sets and
  *     evaluates Jaccard with array_intersect — per-pair work bounded by
  *     shingle-set size, no shuffle beyond the candidate join.
  */
object Dedup {

  /** Character k-shingles of `text` as a distinct array. */
  def charShingles(text: Column, k: Int): Column = {
    val positions = sequence(lit(0), greatest(length(text) - k, lit(0)))
    array_distinct(
      filter(
        transform(positions, i => text.substr(i + 1, lit(k))),
        s => length(s) === k))
  }

  /** Word n-grams of the token array as a distinct array. */
  def wordNgrams(tokensCol: Column, n: Int): Column = {
    val positions = sequence(lit(0), greatest(size(tokensCol) - n, lit(0)))
    array_distinct(
      filter(
        transform(positions, i => concat_ws(" ", slice(tokensCol, i + 1, lit(n)))),
        g => size(split(g, " ")) === n))
  }

  /** Exact-duplicate groups after normalization: md5-keyed groupBy — the
    * exact-dedup pass every pipeline runs first. One shuffle on the
    * fingerprint; map-side combine shrinks it to one row per distinct text.
    */
  def exactDupGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(
        TextAnalysis.fingerprintMd5(col(textCol)).as("fingerprint"),
        col(idCol))
      .groupBy("fingerprint")
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))
      .where(col("n_docs") > 1)

  /** Exact dedup: keep the minimum-id row per normalized-text fingerprint. */
  def dedupExact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = df
      .select(TextAnalysis.fingerprintMd5(col(textCol)).as("dj_fp"), col(idCol).as("dj_keep"))
      .groupBy("dj_fp")
      .agg(min(col("dj_keep")).as("dj_keep"))
    df.join(
        keep,
        TextAnalysis.fingerprintMd5(col(textCol)) === col("dj_fp") &&
          col(idCol) === col("dj_keep"))
      .drop("dj_fp", "dj_keep")
  }

  /** MinHash signature: for hash function h_i (i < numHashes), the minimum
    * xxhash64 over the shingle set with a per-function salt. Returns an
    * array<bigint> column of length `numHashes`.
    */
  def minhashSignature(shinglesCol: Column, numHashes: Int): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      h => array_min(transform(shinglesCol, s => xxhash64(s, h))))

  /** Per-document shingles + MinHash signature. */
  def minhashed(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleK: Int = 5,
      numHashes: Int = 64): DataFrame =
    df.select(
        col(idCol),
        charShingles(TextAnalysis.normalize(col(textCol)), shingleK).as("shingles"))
      .where(size(col("shingles")) > 0)
      .withColumn("signature", minhashSignature(col("shingles"), numHashes))

  /** LSH banding: explode the signature into `bands` band keys
    * (band index, xxhash64 of the band's rows); docs sharing any band key
    * are candidates. Returns (id, band, bucket).
    */
  def lshBuckets(signed: DataFrame, idCol: String, bands: Int): DataFrame = {
    val rowsPerBand = size(col("signature")) / bands
    signed.select(
      col(idCol),
      explode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b =>
            struct(
              b.as("band"),
              xxhash64(slice(col("signature"), b * rowsPerBand + 1, rowsPerBand), b)
                .as("bucket")))).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
  }

  /** Candidate pairs from LSH buckets (id1 < id2), hot buckets capped:
    * a bucket with more than `maxBucketSize` docs is dropped (boilerplate
    * guard — at scale those would be quadratic; they are better handled by
    * the exact-dedup pass that precedes MinHash).
    */
  def lshCandidatePairs(
      buckets: DataFrame,
      idCol: String,
      maxBucketSize: Int = 1000): DataFrame = {
    val sized = buckets
      .groupBy("band", "bucket")
      .agg(collect_list(col(idCol)).as("ids"))
      .where(size(col("ids")).between(2, maxBucketSize))
    sized
      .select(explode(col("ids")).as("id1"), col("ids"))
      .select(col("id1"), explode(col("ids")).as("id2"))
      .where(col("id1") < col("id2"))
      .distinct()
  }

  /** MinHash near-duplicates: LSH candidates verified with the exact Jaccard
    * over shingle sets. Output: (id1, id2, jaccard) with jaccard >= threshold.
    */
  def minhashNearDups(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleK: Int = 5,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.6): DataFrame = {
    val signed     = minhashed(df, textCol, idCol, shingleK, numHashes)
    val candidates = lshCandidatePairs(lshBuckets(signed, idCol, bands), idCol)
    val sh         = signed.select(col(idCol), col("shingles"))
    candidates
      .join(sh.select(col(idCol).as("id1"), col("shingles").as("sh1")), "id1")
      .join(sh.select(col(idCol).as("id2"), col("shingles").as("sh2")), "id2")
      .withColumn(
        "jaccard",
        size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))))
      .where(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** Brute-force n-gram Jaccard pairs via an inverted shingle index:
    * explode distinct shingles, self-join on shingle (skipping shingles in
    * more than `maxShingleDf` docs), count common shingles per pair, and
    * compute |A∩B| / (|A|+|B|−|A∩B|). Exact (no sketch), used as the
    * correctness oracle for the MinHash path and directly at moderate scale.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleK: Int = 5,
      threshold: Double = 0.6,
      maxShingleDf: Int = 10000): DataFrame = {
    val sh = df
      .select(
        col(idCol),
        charShingles(TextAnalysis.normalize(col(textCol)), shingleK).as("shingles"))
      .where(size(col("shingles")) > 0)
    val sizes = sh.select(col(idCol), size(col("shingles")).as("n_sh"))
    val inv = sh.select(col(idCol), explode(col("shingles")).as("shingle"))
    val filteredInv = inv
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("shingle")))
      .where(col("df") <= maxShingleDf)
      .drop("df")
    val common = filteredInv.as("a")
      .join(filteredInv.as("b"), col("a.shingle") === col("b.shingle") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col(idCol).as("id1"), col("n_sh").as("n1")), "id1")
      .join(sizes.select(col(idCol).as("id2"), col("n_sh").as("n2")), "id2")
      .withColumn(
        "jaccard",
        col("n_common").cast("double") / (col("n1") + col("n2") - col("n_common")))
      .where(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** 64-bit SimHash of the token multiset: per bit, sum +1/−1 over token
    * hashes, take the sign. Near-identical texts differ in few bits.
    */
  def simhash64(tokensCol: Column): Column = {
    val bitScores = transform(
      sequence(lit(0), lit(63)),
      b =>
        aggregate(
          tokensCol,
          lit(0L),
          (acc, t) => acc + when(call_function("shiftright", xxhash64(t), b).bitwiseAND(1) === 1, 1L).otherwise(-1L)))
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, b) =>
        acc + when(element_at(bitScores, b + 1) > 0, call_function("shiftleft", lit(1L), b)).otherwise(0L))
  }

  /** SimHash near-duplicates: band the 64-bit sketch into four 16-bit chunks
    * (any doc pair within Hamming distance 3 shares at least one chunk —
    * pigeonhole), bucket-join on (chunk index, chunk value), verify with
    * bit_count(xor) <= maxHamming.
    */
  def simhashNearDups(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sketched = df.select(
      col(idCol),
      simhash64(TextAnalysis.tokens(col(textCol))).as("simhash"))
    val chunked = sketched.select(
      col(idCol),
      col("simhash"),
      explode(
        transform(
          sequence(lit(0), lit(3)),
          c =>
            struct(
              c.as("chunk"),
              call_function("shiftright", col("simhash"), c * 16).bitwiseAND(0xFFFFL).as("value")))).as("cc"))
      .select(col(idCol), col("simhash"), col("cc.chunk"), col("cc.value"))
    chunked.as("a")
      .join(
        chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.value") === col("b.value") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        col(s"a.$idCol").as("id1"),
        col(s"b.$idCol").as("id2"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }
}
