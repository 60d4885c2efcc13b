package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and a random-hyperplane
  * LSH-bucketed variant as the scale path (sub-linear candidate generation).
  *
  * Dot products are computed with `zip_with` + `aggregate` higher-order
  * functions — codegen'd, no UDFs, deterministic summation order (list
  * order), so results are bit-reproducible across engines and runs.
  *
  * 100 TB posture: brute force is a broadcast-join of the (small) query set
  * against the corpus — one scan, no shuffle of the corpus. The LSH variant
  * buckets both sides on sign-bit keys; only same-bucket pairs are scored
  * (candidate volume ∝ corpus/2^bits per query), then verified exactly.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision — generic HOF form (any numeric arrays,
    * e.g. a float vector against double hyperplane literals).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Native codegen'd cosine for two `array<float>` columns — bit-identical
    * to the HOF form (same left-to-right double accumulation) but compiled
    * to a primitive loop (`graft.functions.DotProductFloat`); used on every
    * float-vector scoring path.
    */
  def cosineF(a: Column, b: Column): Column = {
    import graft.functions.DotProductFloat.dotF
    dotF(a, b) / (sqrt(dotF(a, a)) * sqrt(dotF(b, b)))
  }

  /** Exact top-k cosine neighbors for each query vector.
    *
    * `queries` (small: id + vector) is broadcast against `vectors`; per-query
    * ranking is a window over the query id — shuffle on query id only, the
    * corpus is scanned once. Self-matches are excluded.
    */
  def bruteForceTopK(
      vectors: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec")))
    val scored = vectors
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"))
      .join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosineF(col("query_vec"), col("vec")))
    scored
      .withColumn(
        "rank",
        row_number().over(
          Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplanes (LCG, fixed seed): `bits` planes
    * of dimension `dim` with components in {-1, +1}.
    */
  private[graft] def hyperplanes(bits: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    var state = seed
    def next(): Long = { state = state * 6364136223846793005L + 1442695040888963407L; state }
    Seq.fill(bits)(Seq.fill(dim)(if (next() > 0) 1.0 else -1.0))
  }

  /** Sign-bit LSH key: bit i = (v · plane_i > 0). Cosine-similar vectors
    * agree on most sign bits, so sharing the full key is a strong candidate
    * signal.
    *
    * Computed by the native `plane_sign_bits` kernel — one codegen'd
    * primitive loop per row instead of `bits` interpreted HOF dot products
    * (the round-2 `q_embedding_lsh` hotspot). `lshKeyHof` keeps the
    * declarative spelling; `SimilaritySpec` pins the two bit-identical.
    */
  def lshKey(vec: Column, planes: Seq[Seq[Double]]): Column =
    graft.functions.PlaneSignBits.planeSignBits(vec, planes)

  /** Declarative HOF spelling of `lshKey` — reference semantics for the
    * native kernel's equivalence spec; not used on any hot path.
    */
  private[graft] def lshKeyHof(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val bitCols = planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(vec, planeCol) > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }
    bitCols.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: bucket corpus and queries on the
    * sign-bit key (optionally probing neighbor buckets at Hamming distance 1
    * for recall), score only same-bucket pairs, rank per query.
    */
  def lshTopK(
      vectors: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      bits: Int = 8,
      dim: Int = 64,
      multiProbe: Boolean = true): DataFrame = {
    val planes = hyperplanes(bits, dim)
    val corpus = vectors.select(
      col(idCol).as("neighbor_id"),
      col(vecCol).as("vec"),
      lshKey(col(vecCol), planes).as("bucket"))
    val qBase = queries.select(
      col(idCol).as("query_id"),
      col(vecCol).as("query_vec"),
      lshKey(col(vecCol), planes).as("bucket"))
    // multi-probe: also look in the `bits` buckets at Hamming distance 1
    val q =
      if (!multiProbe) qBase
      else
        qBase.select(
          col("query_id"),
          col("query_vec"),
          explode(
            array_union(
              array(col("bucket")),
              transform(
                sequence(lit(0), lit(bits - 1)),
                b => col("bucket").bitwiseXOR(call_function("shiftleft", lit(1L), b))))).as("bucket"))
    val scored = corpus
      .join(broadcast(q), Seq("bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosineF(col("query_vec"), col("vec")))
    scored
      .withColumn(
        "rank",
        row_number().over(
          Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** IVF (inverted-file) approximate top-k — the coarse-quantizer scale
    * path: assign every corpus vector to its nearest of `nCentroids`
    * deterministic centroids (sampled from the corpus by id), then search
    * only the `nProbe` clusters nearest to each query.
    *
    * Plan shape: centroid assignment is a broadcast nested-loop over the
    * (tiny) centroid set — one corpus scan; the probe join is an equi-join
    * on cluster id. Candidate volume ≈ corpus · nProbe / nCentroids.
    */
  /** Deterministic coarse-centroid candidates: a hash sample of ~2×
    * `nCentroids` vectors, capped to `nCentroids` by ascending id.
    *
    * Scale shape: the sample predicate is a plain filter (scan-parallel, no
    * shuffle) and the id cap is a TakeOrderedAndProject (distributed top-k) —
    * never a `row_number` over an unpartitioned window, which would sort the
    * whole corpus into one partition (`PlanSpec` pins this).
    */
  def ivfCentroids(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int,
      corpusSize: Long): DataFrame = {
    val step = math.max(1L, corpusSize / (2L * nCentroids))
    vectors
      .where(pmod(xxhash64(col(idCol)), lit(step)) === 0)
      .sort(col(idCol))
      .limit(nCentroids)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec"))
  }

  def ivfTopK(
      vectors: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      kmeansIters: Int = 2,
      corpusSize: Option[Long] = None): DataFrame = {
    // deterministic hash-sampled seeds, refined with `kmeansIters` Lloyd
    // iterations — each iteration is ONE distributed HashAggregate (count +
    // per-dimension sums with map-side partials; no explode, no shuffle of
    // raw vectors) returning ≤ nCentroids rows to the driver.
    //
    // The corpus size only calibrates the seed-sample stride, so a caller
    // hint or a plan-stats estimate replaces the former full count() job.
    // The estimate must be biased LOW: underestimating shrinks the stride
    // and samples MORE rows — the distributed top-k still caps the seed set
    // at nCentroids, so recall never degrades — while overestimating could
    // under-fill it. Hence the deliberately large 64 KiB/row divisor: even a
    // 4096-dim float embedding row (~16 KiB) stays an underestimate, at the
    // cost of a slightly larger (still nCentroids-capped) top-k input.
    val n = corpusSize.getOrElse {
      val stats = vectors.queryExecution.optimizedPlan.stats
      stats.rowCount.map(_.toLong).getOrElse(
        math.max(1L, (stats.sizeInBytes / 65536).toLong))
    }
    val sampled =
      ivfCentroids(vectors, idCol, vecCol, nCentroids, n).collect()
    val seedRows =
      if (sampled.nonEmpty) sampled.toSeq
      else // degenerate corpus (hash sample empty): first nCentroids by id
        vectors
          .sort(col(idCol))
          .limit(nCentroids)
          .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec"))
          .collect()
          .toSeq
    var centroids: Seq[(Long, Seq[Double])] =
      seedRows
        .filterNot(_.isNullAt(1))
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq.map(_.toDouble))
    if (centroids.isEmpty)
      // empty corpus: no candidates, typed empty result
      return queries
        .select(
          col(idCol).as("query_id"),
          col(idCol).as("neighbor_id"),
          lit(0.0).as("cosine"),
          lit(0).as("rank"))
        .where(lit(false))
    val dim = centroids.head._2.length

    def centroidArrOf(cs: Seq[(Long, Seq[Double])]): Column =
      array(cs.map { case (cid, v) =>
        struct(lit(cid).as("cid"), array(v.map(lit): _*).as("cvec"))
      }: _*)

    def nearestClustersIn(arr: Column)(vec: Column, howMany: Int): Column =
      slice(
        transform(
          array_sort(
            transform(arr, c => struct(
              (-dot(vec, c.getField("cvec"))).as("negSim"),
              c.getField("cid").as("cid")))),
          s => s.getField("cid")),
        1, howMany)

    for (_ <- 0 until kmeansIters) {
      val arr = centroidArrOf(centroids)
      val assigned = vectors.select(
        col(vecCol).as("dj_vec"),
        element_at(nearestClustersIn(arr)(col(vecCol), 1), 1).as("dj_cluster"))
      val aggs = count(lit(1)).as("dj_n") +:
        (0 until dim).map(d =>
          sum(element_at(col("dj_vec"), d + 1).cast("double")).as(s"dj_s$d"))
      val rows = assigned.groupBy("dj_cluster").agg(aggs.head, aggs.tail: _*).collect()
      val updated: Map[Long, Seq[Double]] = rows.map { r =>
        val cnt = r.getLong(1).toDouble
        r.getLong(0) -> (0 until dim).map(d => r.getDouble(d + 2) / cnt)
      }.toMap
      // empty clusters keep their previous centroid
      centroids = centroids.map { case (cid, v) => cid -> updated.getOrElse(cid, v) }
    }

    val centroidArr = centroidArrOf(centroids)

    def nearestClusters(vec: Column, howMany: Int): Column =
      nearestClustersIn(centroidArr)(vec, howMany)

    val corpus = vectors.select(
      col(idCol).as("neighbor_id"),
      col(vecCol).as("vec"),
      element_at(nearestClusters(col(vecCol), 1), 1).as("cluster"))
    val q = queries.select(
      col(idCol).as("query_id"),
      col(vecCol).as("query_vec"),
      explode(nearestClusters(col(vecCol), nProbe)).as("cluster"))
    corpus
      .join(broadcast(q), Seq("cluster"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosineF(col("query_vec"), col("vec")))
      .withColumn(
        "rank",
        row_number().over(
          Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs (id1 < id2, cosine >= threshold)
    * via the LSH buckets — the embedding flavor of `Dedup.minhashNearDups`.
    * Exact within a bucket; multi-probe trades recall for candidate volume.
    */
  def embeddingNearDups(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      bits: Int = 8,
      dim: Int = 64): DataFrame = {
    val planes = hyperplanes(bits, dim)
    val keyed = vectors.select(
      col(idCol),
      col(vecCol).as("vec"),
      lshKey(col(vecCol), planes).as("bucket"))
    keyed.as("a")
      .join(keyed.as("b"), col("a.bucket") === col("b.bucket") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("cosine", cosineF(col("a.vec"), col("b.vec")))
      .where(col("cosine") >= threshold)
      .select(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"), col("cosine"))
  }
}
