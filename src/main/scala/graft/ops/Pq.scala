package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PqCodes.{pqAdc, pqEncode, pqLut}

/** Product quantization for embedding columns (Jégou, Douze & Schmid 2011)
  * — the compression tier of the ANN stack. A dim-64 float vector is 256
  * bytes; its PQ code at m=8 is 16 bytes. At 100 TB of embeddings that is
  * the difference between "the candidate scan streams codes through the
  * CPU cache" and "the candidate scan is IO-bound on full vectors" — the
  * sketch-prefilter idea of `ivfTopKRerank` taken to its standard
  * conclusion: approximate scores from codes (ADC), exact cosine only on
  * the short reranked pool.
  *
  * Flavors (the established split): [[seedCodebooks]] is bit-reproducible
  * (codewords = slices of the first-ks-by-id vectors — pure functions of
  * the data, re-derivable by the DuckDB oracle); [[trainCodebooks]]
  * hash-stride samples seeds and optionally Lloyd-refines per subspace
  * (deterministic up to summation order, like
  * [[Similarity.fitCentroids]] — the recall flavor, not the oracle one).
  *
  * Scale shape: codebooks are plan constants inside the native
  * [[graft.functions.PqCodes]] expressions (no join, no shuffle to score);
  * the ADC pool rank is a per-query window capped by WindowGroupLimit;
  * the exact rerank touches poolFactor·k rows per query, joined by
  * BROADCASTING the (tiny) pool against the corpus — never a corpus
  * shuffle.
  */
object Pq {

  /** Bit-reproducible codebooks: the first `ks` non-null vectors by id,
    * sliced into `m` contiguous subspaces. Returns m × (≤ks) × (dim/m)
    * doubles (float→double widening is exact). The gate/oracle flavor —
    * a DuckDB oracle re-derives it as `ORDER BY id LIMIT ks`.
    */
  def seedCodebooks(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      ks: Int): Seq[Seq[Seq[Double]]] = {
    require(m > 0, s"m must be positive: $m")
    require(ks > 0 && ks <= 256, s"ks must be in 1..256: $ks")
    // null ids excluded: Spark sorts NULLS FIRST ascending while DuckDB's
    // ORDER BY defaults NULLS LAST, so a null-id row with a non-null vector
    // would silently seed different codebooks than the oracle derivation
    val rows = vectors
      .where(col(vecCol).isNotNull && col(idCol).isNotNull)
      .sort(col(idCol))
      .limit(ks)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).toIndexedSeq)
    require(rows.nonEmpty, "cannot seed PQ codebooks from an empty corpus")
    val dim = rows.head.length
    require(dim % m == 0, s"vector dim $dim is not divisible by m=$m subspaces")
    require(rows.forall(_.length == dim),
      "cannot seed PQ codebooks from ragged vectors")
    val sub = dim / m
    (0 until m).map { s =>
      rows.toSeq.map(v => (0 until sub).map(j => v(s * sub + j).toDouble))
    }
  }

  /** Production codebooks: hash-stride sampled seed vectors (the
    * [[Similarity.ivfCentroids]] scheme — deterministic, no full sort)
    * refined with `iters` per-subspace Lloyd rounds. Each round is ONE
    * distributed aggregate over the posexploded vectors keyed by
    * (subspace, code, dim-in-subspace) — ≤ m·ks·sub result rows to the
    * driver — exactly the [[Similarity.fitCentroids]] shape. Refined
    * values are deterministic up to float summation order; use
    * `iters = 0` (or [[seedCodebooks]]) where bit-reproducibility
    * matters more than quantization error.
    */
  def trainCodebooks(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      ks: Int,
      iters: Int = 1,
      corpusSize: Option[Long] = None): Seq[Seq[Seq[Double]]] = {
    require(m > 0, s"m must be positive: $m")
    require(ks > 0 && ks <= 256, s"ks must be in 1..256: $ks")
    // null ids excluded for the same one-ordering reason as seedCodebooks
    val nonNull =
      vectors.where(col(vecCol).isNotNull && col(idCol).isNotNull)
    val n = corpusSize.getOrElse {
      val stats = nonNull.queryExecution.optimizedPlan.stats
      stats.rowCount.map(_.toLong).getOrElse(
        math.max(1L, (stats.sizeInBytes / 65536).toLong))
    }
    val step = math.max(1L, n / (2L * ks))
    val sampled = nonNull
      .where(pmod(xxhash64(col(idCol)), lit(step)) === 0)
      .sort(col(idCol))
      .limit(ks)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).toIndexedSeq)
    val seedRows =
      if (sampled.nonEmpty) sampled.toSeq
      else nonNull.sort(col(idCol)).limit(ks).select(col(vecCol))
        .collect().map(_.getSeq[Float](0).toIndexedSeq).toSeq
    require(seedRows.nonEmpty, "cannot seed PQ codebooks from an empty corpus")
    val dim = seedRows.head.length
    require(dim % m == 0, s"vector dim $dim is not divisible by m=$m subspaces")
    require(seedRows.forall(_.length == dim),
      "cannot seed PQ codebooks from ragged vectors")
    val sub = dim / m
    var cb: Seq[Seq[Seq[Double]]] = (0 until m).map { s =>
      seedRows.map(v => (0 until sub).map(j => v(s * sub + j).toDouble))
    }
    for (_ <- 0 until iters) {
      val enc = nonNull
        .select(pqEncode(col(vecCol), cb).as("dj_codes"), col(vecCol).as("dj_vec"))
        .where(col("dj_codes").isNotNull)
        .select(
          col("dj_codes"),
          posexplode(col("dj_vec")))
        .select(col("dj_codes"), col("pos"), col("col").cast("double").as("dj_x"))
      cb = refineOnce(enc, sub, cb)
    }
    cb
  }

  /** One per-subspace Lloyd round over pre-exploded rows
    * (dj_codes array<smallint>, pos, dj_x double): ONE
    * (subspace, code, dim-in-subspace)-keyed count+sum aggregate —
    * map-side partials, ≤ m·ks·sub rows to the driver (the
    * [[Similarity.fitCentroids]] aggregate shape). Empty cells keep their
    * previous codeword. Shared by the raw and residual training flavors.
    */
  private def refineOnce(
      exploded: DataFrame,
      sub: Int,
      cb: Seq[Seq[Seq[Double]]]): Seq[Seq[Seq[Double]]] = {
    val rows = exploded
      .select(
        (col("pos") / sub).cast("int").as("dj_s"),
        element_at(col("dj_codes"), (col("pos") / sub).cast("int") + 1).as("dj_c"),
        pmod(col("pos"), lit(sub)).as("dj_j"),
        col("dj_x"))
      .groupBy("dj_s", "dj_c", "dj_j")
      .agg(count(lit(1)).as("dj_n"), sum(col("dj_x")).as("dj_sum"))
      .collect()
    val updated: Map[(Int, Int, Int), (Long, Double)] = rows.map { r =>
      (r.getInt(0), r.getShort(1).toInt, r.getInt(2)) ->
        (r.getLong(3), r.getDouble(4))
    }.toMap
    cb.zipWithIndex.map { case (codewords, s) =>
      codewords.zipWithIndex.map { case (old, c) =>
        val cells = (0 until sub).map(j => updated.get((s, c, j)))
        if (cells.forall(_.isEmpty)) old // empty cell keeps its codeword
        else (0 until sub).map { j =>
          cells(j).map { case (nn, ss) => ss / nn }.getOrElse(0.0)
        }
      }
    }
  }

  /** Float-cast centroid frame (dj_cc_cid, dj_cc_cvec) for broadcast
    * joins — the residual paths' per-row centroid lookup.
    */
  private[graft] def centDfF(
      spark: org.apache.spark.sql.SparkSession,
      centroids: Seq[(Long, Seq[Double])]): DataFrame = {
    import spark.implicits._
    centroids.map { case (cid, v) => (cid, v.map(_.toFloat).toArray) }
      .toDF("dj_cc_cid", "dj_cc_cvec")
  }

  /** RESIDUAL codebooks (the IVFADC flavor, Jégou 2011 §IV): trained on
    * `vec − assigned coarse centroid` (float-cast centroid — the PQ
    * quantization error dwarfs the cast). Residuals concentrate around
    * zero, so the same (m, ks) budget quantizes them with materially less
    * error than raw vectors — recall at equal code bytes. `assigned` is
    * the (neighbor_id, vec, cluster) assignment frame; seeds are
    * hash-stride sampled residuals, refined with `iters` rounds of the
    * shared per-subspace Lloyd aggregate (no residual array materialized —
    * the encode fuses the subtraction, the aggregate subtracts
    * element-wise in-plan).
    */
  def trainResidualCodebooks(
      assigned: DataFrame,
      centroids: Seq[(Long, Seq[Double])],
      m: Int,
      ks: Int,
      iters: Int = 1,
      corpusSize: Option[Long] = None): Seq[Seq[Seq[Double]]] = {
    require(m > 0, s"m must be positive: $m")
    require(ks > 0 && ks <= 256, s"ks must be in 1..256: $ks")
    require(centroids.nonEmpty, "residual codebooks need a fitted quantizer")
    val spark = assigned.sparkSession
    import graft.functions.PqCodes.pqEncodeResidual
    val cents = broadcast(centDfF(spark, centroids))
    val joined = assigned
      .where(col("vec").isNotNull)
      .join(cents, col("cluster") === col("dj_cc_cid"))
      .select(col("neighbor_id"), col("vec"), col("dj_cc_cvec"))
    val n = corpusSize.getOrElse {
      val stats = joined.queryExecution.optimizedPlan.stats
      stats.rowCount.map(_.toLong).getOrElse(
        math.max(1L, (stats.sizeInBytes / 65536).toLong))
    }
    val step = math.max(1L, n / (2L * ks))
    val sampled = joined
      .where(pmod(xxhash64(col("neighbor_id")), lit(step)) === 0)
      .sort(col("neighbor_id"))
      .limit(ks)
      .select(col("vec"), col("dj_cc_cvec"))
      .collect()
    val seedSrc =
      if (sampled.nonEmpty) sampled.toSeq
      else joined.sort(col("neighbor_id")).limit(ks)
        .select(col("vec"), col("dj_cc_cvec")).collect().toSeq
    require(seedSrc.nonEmpty,
      "cannot seed residual PQ codebooks from an empty assignment")
    // residual seeds computed with the kernel's exact arithmetic:
    // float(vec) widened, float(centroid) widened, subtracted in double
    val seedRows = seedSrc.map { r =>
      val v = r.getSeq[Float](0)
      val c = r.getSeq[Float](1)
      require(v.length == c.length,
        "vector and centroid dimensions must agree for residual encoding")
      v.indices.map(i => v(i).toDouble - c(i).toDouble)
    }
    val dim = seedRows.head.length
    require(dim % m == 0, s"vector dim $dim is not divisible by m=$m subspaces")
    require(seedRows.forall(_.length == dim),
      "cannot seed residual PQ codebooks from ragged vectors")
    val sub = dim / m
    var cb: Seq[Seq[Seq[Double]]] = (0 until m).map { s =>
      seedRows.map(r => (0 until sub).map(j => r(s * sub + j)))
    }
    for (_ <- 0 until iters) {
      val enc = joined
        .select(
          pqEncodeResidual(col("vec"), col("dj_cc_cvec"), cb).as("dj_codes"),
          col("vec").as("dj_vec"),
          col("dj_cc_cvec").as("dj_cen"))
        .where(col("dj_codes").isNotNull)
        .select(col("dj_codes"), col("dj_cen"), posexplode(col("dj_vec")))
        .select(
          col("dj_codes"), col("pos"),
          (col("col").cast("double") -
            element_at(col("dj_cen"), col("pos") + 1).cast("double")).as("dj_x"))
      cb = refineOnce(enc, sub, cb)
    }
    cb
  }

  /** Attach PQ codes: `df` + `outCol array<smallint>` (null for null /
    * wrong-length vectors — filter or fail upstream as appropriate).
    */
  def withCodes(
      df: DataFrame,
      vecCol: String,
      codebooks: Seq[Seq[Seq[Double]]],
      outCol: String = "pq_codes"): DataFrame =
    df.withColumn(outCol, pqEncode(col(vecCol), codebooks))

  /** Pure-ADC top-k (no coarse index, no rerank): every corpus code is
    * scored with m table lookups against the broadcast per-query LUT and
    * ranked by the approximate dot product. The building block the gate
    * oracles directly; for production retrieval compose with a coarse
    * index and an exact rerank ([[ivfpqTopK]]).
    *
    * Output: (query_id, neighbor_id, adc_dot, rank) — `adc_dot` is the
    * query·reconstruction dot product, NOT a cosine.
    */
  def adcTopK(
      vectors: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      codebooks: Seq[Seq[Seq[Double]]]): DataFrame = {
    val corpus = vectors
      .select(col(idCol).as("neighbor_id"), pqEncode(col(vecCol), codebooks).as("dj_codes"))
      .where(col("neighbor_id").isNotNull && col("dj_codes").isNotNull)
    val q = broadcast(
      queries
        .select(col(idCol).as("query_id"), pqLut(col(vecCol), codebooks).as("dj_lut"))
        .where(col("query_id").isNotNull && col("dj_lut").isNotNull))
    corpus
      .join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("adc_dot", pqAdc(col("dj_codes"), col("dj_lut")))
      .withColumn(
        "rank",
        row_number().over(
          Window.partitionBy("query_id").orderBy(col("adc_dot").desc, col("neighbor_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("adc_dot"), col("rank"))
  }

  /** IVF-PQ with exact rerank — the standard at-scale retrieval shape
    * (IVFADC posture; `residual = false` codes raw vectors — ScaNN's
    * non-residual mode; `residual = true` codes `vec − coarse centroid`,
    * the Jégou 2011 §IV flavor): probe `nProbe`
    * coarse cells per query, score every candidate with m ADC lookups
    * (codes + broadcast LUT — the probe join carries 2·m bytes per row
    * instead of 4·dim), keep the `poolFactor·k` best per query, and
    * exact-cosine-rerank that pool against the full vectors. With
    * `nProbe ≥ nCentroids` and `poolFactor·k ≥ corpus size` the result
    * IS brute-force exact top-k (spec-pinned) — approximation enters
    * only through cell pruning and pool truncation, never the final
    * scoring.
    *
    * Output: (query_id, neighbor_id, cosine, rank) — exact cosines, the
    * [[Similarity.ivfTopK]] schema.
    */
  def ivfpqTopK(
      vectors: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      m: Int = 8,
      ks: Int = 256,
      poolFactor: Int = 4,
      kmeansIters: Int = 2,
      pqIters: Int = 1,
      corpusSize: Option[Long] = None,
      residual: Boolean = false): DataFrame =
    adcRankedPool(
      vectors, queries, idCol, vecCol, nCentroids, nProbe, m, ks,
      kmeansIters, pqIters, corpusSize, residual,
      rankCap = poolFactor.toLong * k) match {
      case None => Similarity.emptyTopK(queries, idCol)
      case Some(poolRk) =>
        exactRerank(
          vectors, queries, idCol, vecCol, k,
          poolRk.select(col("query_id"), col("neighbor_id")))
    }

  /** The ADC-prefilter pool with its ranks exposed: every probed-cell
    * candidate scored by the m-lookup ADC sum, ranked per query (desc,
    * ties to smallest neighbor), capped at `rankCap`. [[ivfpqTopK]] feeds
    * it to the exact rerank; [[autoPoolFactor]] reads the ranks of the
    * ground-truth neighbors directly — recall at ANY poolFactor falls out
    * of ONE pass because the exact rerank can never evict a true top-k
    * neighbor from the final answer (at most k−1 vectors beat it).
    * None ⇔ the corpus has no centroids (empty / all-null).
    */
  private[ops] def adcRankedPool(
      vectors: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int,
      nProbe: Int,
      m: Int,
      ks: Int,
      kmeansIters: Int,
      pqIters: Int,
      corpusSize: Option[Long],
      residual: Boolean,
      rankCap: Long): Option[DataFrame] = {
    val spark = vectors.sparkSession
    import graft.functions.PqCodes.pqEncodeResidual
    import graft.functions.DotProductFloat.dotF
    val centroids = Similarity.fitCentroids(
      vectors, idCol, vecCol, nCentroids, kmeansIters, corpusSize)
    if (centroids.isEmpty) return None
    val assigned = Similarity.assignToCentroids(
      vectors.where(col(idCol).isNotNull), idCol, vecCol, centroids)
    // corpus side: (neighbor_id, cluster, codes) — 2·m bytes of payload
    // per row through the probe join, never the full vector. Rows whose
    // vector cannot encode (null / off-dimension) drop here — unlike the
    // exact paths, where a null-cosine row could still fill a rank past
    // the non-null candidates; a malformed vector is index garbage, not
    // a neighbor. The residual flavor codes `vec − centroid` (the IVFADC
    // posture — residuals concentrate, same bytes buy less error) and
    // decomposes the approximate dot as q·centroid + q·residual̂: the
    // first term rides the probe frame per (query, cell), the second is
    // the same m-lookup ADC sum.
    val cents =
      if (residual) broadcast(centDfF(spark, centroids)) else null
    val cb =
      if (residual)
        trainResidualCodebooks(assigned, centroids, m, ks, pqIters, corpusSize)
      else trainCodebooks(vectors, idCol, vecCol, m, ks, pqIters, corpusSize)
    val corpus =
      if (residual)
        assigned
          .join(cents, col("cluster") === col("dj_cc_cid"))
          .select(
            col("neighbor_id"), col("cluster"),
            pqEncodeResidual(col("vec"), col("dj_cc_cvec"), cb).as("dj_codes"))
          .where(col("dj_codes").isNotNull)
      else
        assigned
          .select(
            col("neighbor_id"), col("cluster"),
            pqEncode(col("vec"), cb).as("dj_codes"))
          .where(col("dj_codes").isNotNull)
    // The LUT is m·ks doubles (~16 KB at 8×256) PER QUERY — it must ride a
    // per-query broadcast, never the per-(query, cell) probe frame: at the
    // auto geometry (8k cells, ~10% probed) a LUT-carrying probe frame is
    // nQueries·nProbe·16 KB ≈ GIGABYTES through the broadcast while the
    // de-duplicated LUT frame is nQueries·16 KB (measured: the fused
    // spelling aborted on driver maxResultSize at 200k vectors / 200
    // queries; this one broadcasts ~3 MB). dj_qc (residual q·centroid) is
    // one double per (query, cell) and stays on the cell frame.
    val probesBase =
      Similarity.ivfQueryProbes(queries, idCol, vecCol, centroids, nProbe)
    val cellProbes =
      if (residual)
        probesBase
          .join(cents, col("cluster") === col("dj_cc_cid"))
          .withColumn("dj_qc", dotF(col("query_vec"), col("dj_cc_cvec")))
          .select(col("query_id"), col("cluster"), col("dj_qc"))
      else
        probesBase
          .select(col("query_id"), col("cluster"), lit(0.0).as("dj_qc"))
    val luts = queries
      .select(
        col(idCol).as("query_id"),
        pqLut(col(vecCol), cb).as("dj_lut"))
      .where(col("dj_lut").isNotNull)
    Some(corpus
      .join(broadcast(cellProbes), Seq("cluster"))
      .where(col("neighbor_id") =!= col("query_id"))
      .join(broadcast(luts), Seq("query_id"))
      .withColumn("dj_adc", col("dj_qc") + pqAdc(col("dj_codes"), col("dj_lut")))
      .withColumn(
        "dj_rk",
        row_number().over(
          Window.partitionBy("query_id").orderBy(col("dj_adc").desc, col("neighbor_id"))))
      .where(col("dj_rk") <= rankCap)
      .select(col("query_id"), col("neighbor_id"), col("dj_rk")))
  }

  /** Exact-cosine rerank of a bounded (query_id, neighbor_id) pool:
    * broadcast the (nQueries·poolFactor·k) pool against the corpus — a
    * column-pruned scan, no corpus shuffle.
    */
  private def exactRerank(
      vectors: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      pool: DataFrame): DataFrame = {
    val qvec = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("dj_qvec")))
    vectors
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("dj_nvec"))
      .join(broadcast(pool), Seq("neighbor_id"))
      .join(qvec, Seq("query_id"))
      .withColumn("cosine", Similarity.cosineF(col("dj_qvec"), col("dj_nvec")))
      .withColumn(
        "rank",
        row_number().over(
          Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Candidate poolFactor ladder the auto-sizers walk (geometric — the
    * recall/cost curve is concave in the pool size, so doubling steps
    * bracket the knee within 2×). The top rung exact-scores 256·k rows
    * per query — ~1.3% of a 200k-cell probe set, still two orders below
    * the probed candidate volume, so walking high stays cheap; on
    * near-uniform embeddings (the hard fresh-content case) the ADC
    * ordering needs the high rungs.
    */
  private[graft] val PoolFactorLadder = Seq(1, 2, 4, 8, 16, 32, 64, 128, 256)

  /** Shared tail of the two auto-sizers (live corpus here, persisted index
    * in [[graft.sources.AnnIndex.autoPoolFactor]]): given the ground-truth
    * pairs and an ADC-ranked pool capped at ladder-top·k, pick the smallest
    * ladder value whose exact recall meets the target. One aggregate job.
    */
  private[graft] def pickPoolFactor(
      truth: DataFrame,
      pool: Option[DataFrame],
      k: Int,
      nTruth: Double,
      recallTarget: Double): (Int, Double) = {
    val pfCounts: Map[Int, Long] = pool match {
      case None => Map.empty
      case Some(p) =>
        val aggs = PoolFactorLadder.map(pf =>
          count(when(col("dj_rk") <= pf.toLong * k, 1)).as(s"pf_$pf"))
        val row = truth
          .join(p, Seq("query_id", "neighbor_id"))
          .agg(aggs.head, aggs.tail: _*)
          .head()
        PoolFactorLadder.zipWithIndex
          .map { case (pf, i) => pf -> row.getLong(i) }.toMap
    }
    def recallAt(pf: Int) = pfCounts.getOrElse(pf, 0L) / nTruth
    val chosen = PoolFactorLadder
      .find(pf => recallAt(pf) >= recallTarget)
      .getOrElse(PoolFactorLadder.last)
    (chosen, recallAt(chosen))
  }

  /** Recall-targeted poolFactor (the r11 verdict's missing PQ lever): the
    * smallest ladder value whose expected recall@k meets `recallTarget`,
    * measured on a deterministic stride-sampled probe set against exact
    * brute-force ground truth — all from ONE ADC-ranking pass: the exact
    * rerank can never evict a true top-k neighbor from the final answer
    * (at most k−1 other vectors beat it globally), so
    * `recall(pf) = |truth ∩ {ADC rank ≤ pf·k}| / |truth|` exactly.
    *
    * Returns (poolFactor, measured probe recall at that factor). When even
    * the ladder top misses the target the top is returned with its recall
    * — the caller sees the gap instead of an unbounded pool. Cost: one
    * brute-force pass for ~`nProbeQueries` queries + one ADC pool pass —
    * about two ivfpqTopK calls, paid once per sizing decision, not per
    * query batch.
    */
  def autoPoolFactor(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCentroids: Int,
      nProbe: Int,
      m: Int = 8,
      ks: Int = 256,
      recallTarget: Double = 0.85,
      nProbeQueries: Int = 64,
      kmeansIters: Int = 0,
      pqIters: Int = 1,
      corpusSize: Option[Long] = None,
      residual: Boolean = false): (Int, Double) = {
    require(recallTarget > 0 && recallTarget <= 1,
      s"recallTarget must be in (0, 1]: $recallTarget")
    val n = corpusSize.getOrElse(vectors.count())
    if (n == 0) return (PoolFactorLadder.head, 0.0)
    val step = math.max(1L, n / math.max(1, nProbeQueries))
    val probes = vectors
      .where(col(idCol).isNotNull && col(vecCol).isNotNull &&
        pmod(xxhash64(col(idCol)), lit(step)) === 0)
      .sort(col(idCol))
      .limit(nProbeQueries)
    val truth = graft.core.Blocks.checkpoint(
      Similarity.bruteForceTopK(vectors, probes, idCol, vecCol, k)
        .select(col("query_id"), col("neighbor_id")))
    try {
      val nTruth = truth.count().toDouble
      if (nTruth == 0) return (PoolFactorLadder.head, 0.0)
      val ranked = adcRankedPool(
        vectors, probes, idCol, vecCol, nCentroids, nProbe, m, ks,
        kmeansIters, pqIters, Some(n), residual,
        rankCap = PoolFactorLadder.last.toLong * k)
      pickPoolFactor(truth, ranked, k, nTruth, recallTarget)
    } finally graft.core.Blocks.release(truth)
  }

  /** Squared reconstruction error `‖vec − decode(encode(vec))‖²` as a
    * column — the quantization-quality diagnostic (per-subspace sequential
    * accumulation, same arithmetic as the encode distances). Implemented
    * as ADC algebra: ‖v−r‖² = v·v − 2·v·r + Σ_s ‖codeword_s‖², with v·r
    * and the norm term both m-lookup ADC sums — no reconstruction
    * materialized.
    */
  def reconstructionError2(
      vec: Column,
      codebooks: Seq[Seq[Seq[Double]]]): Column = {
    import graft.functions.DotProductFloat.dotF
    val ks = codebooks.head.size
    // norms "lut": entry (s, c) = ‖codeword(s)(c)‖² — a plan constant
    val norms: Seq[Double] = codebooks.flatMap(_.map { cw =>
      var acc = 0.0; cw.foreach(v => acc += v * v); acc
    })
    val normsLut = array(norms.map(lit): _*)
    val codes = pqEncode(vec, codebooks)
    dotF(vec, vec) - lit(2.0) * pqAdc(codes, pqLut(vec, codebooks).asInstanceOf[Column]) +
      pqAdc(codes, normsLut)
  }
}
