package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming mini-batch refinement of a coarse quantizer (the public
  * web-scale k-means posture — Sculley 2010, "Web-Scale K-Means
  * Clustering" — with CUMULATIVE count-weighted means instead of a decaying
  * learning rate): each micro-batch is assigned against the CURRENT
  * centroids ([[graft.ops.Similarity.assignToCentroids]] — the same
  * broadcast-argmin kernel every batch path uses), its per-cluster
  * per-dimension sums fold into running (sum, count) state, and each
  * centroid is its cumulative mean. Centroid state is quantizer-sized
  * (nCentroids · dim doubles) and lives on the driver — the only
  * distributed work per batch is one assignment scan and one
  * (cluster, dim)-keyed aggregate, both map-side-combining.
  *
  * Batch/streaming geometry contract (spec-pinned): seeded from
  * `fitCentroids(lloydIters = 0)` and fed a static corpus as ONE
  * micro-batch, [[centroids]] equals one Lloyd iteration of the batch
  * fitter over the same seeds — same assignment argmin, same
  * count-divided means, same empty-cluster-keeps-seed rule — so corpus
  * vectors assign to the SAME cells under either quantizer, and a
  * streaming embedding near-dup path can share index geometry (e.g. a
  * [[graft.sources.DedupIndex.saveCentroids]] snapshot) with batch
  * consumers. Over multiple micro-batches the refinement is the standard
  * mini-batch approximation: each batch is assigned under the centroids
  * current AT ITS ARRIVAL, so the result depends on batch boundaries
  * (exactly Sculley's trade — bounded per-batch work for a
  * slightly-stale assignment).
  *
  * Thread-safety: updates are serialized (foreachBatch delivers batches
  * sequentially per query); [[centroids]] reads the latest published
  * state.
  */
final class StreamingCentroids(initial: Seq[(Long, Seq[Double])]) {
  require(initial.nonEmpty, "StreamingCentroids needs at least one seed centroid")
  private val dim = initial.head._2.length
  require(initial.forall(_._2.length == dim),
    "seed centroids must share one dimensionality")

  // running per-centroid (sum vector, member-row count); centroid =
  // sum/count once count > 0, the seed until then (the empty-cluster rule)
  private val seeds: Map[Long, Seq[Double]] = initial.toMap
  private val order: Seq[Long] = initial.map(_._1)
  private var sums: Map[Long, Array[Double]] =
    initial.map { case (cid, _) => cid -> Array.fill(dim)(0.0) }.toMap
  private var counts: Map[Long, Long] =
    initial.map { case (cid, _) => cid -> 0L }.toMap
  @volatile private var published: Seq[(Long, Seq[Double])] = initial

  /** The current quantizer, in seed order — plug into
    * [[graft.ops.Similarity.assignToCentroids]] or persist via
    * [[graft.sources.DedupIndex.saveCentroids]].
    */
  def centroids: Seq[(Long, Seq[Double])] = published

  /** Rows absorbed so far (diagnostic surface). */
  def absorbed: Long = synchronized { counts.values.sum }

  /** Fold one micro-batch into the quantizer: assign under the current
    * centroids, accumulate per-cluster sums/counts, republish the means.
    * Null vectors sit out (they can neither be assigned nor averaged).
    */
  def update(batch: DataFrame, idCol: String, vecCol: String): Unit = synchronized {
    val assigned = graft.ops.Similarity.assignToCentroids(
      batch.where(col(vecCol).isNotNull), idCol, vecCol, published)
    // ONE (cluster, dim)-keyed aggregate over the exploded vectors — the
    // exact spelling of the batch fitter's Lloyd step (per-dimension sums
    // plus the cluster ROW count = max per-position count; a ragged
    // vector's missing position contributes 0, never throws)
    val rows = assigned
      .select(col("cluster"), posexplode(col("vec")))
      .groupBy(col("cluster"), col("pos"))
      .agg(count(lit(1)).as("dj_n"), sum(col("col").cast("double")).as("dj_s"))
      .collect()
    rows.groupBy(_.getLong(0)).foreach { case (cid, rs) =>
      sums.get(cid).foreach { acc =>
        // positions past the seed dimensionality are ignored, exactly like
        // the batch fitter's (0 until dim) fold — a single over-long
        // vector must not kill the sink (and must not diverge the parity)
        rs.foreach(r => if (r.getInt(1) < dim) acc(r.getInt(1)) += r.getDouble(3))
        counts = counts.updated(cid, counts(cid) + rs.map(_.getLong(2)).max)
      }
    }
    published = order.map { cid =>
      val n = counts(cid)
      cid -> (if (n == 0L) seeds(cid)
              else sums(cid).toSeq.map(_ / n))
    }
  }

  /** A foreachBatch sink folding every micro-batch into this quantizer —
    * `stream.writeStream.foreachBatch(sc.sink(idCol, vecCol))`.
    */
  def sink(idCol: String, vecCol: String): (DataFrame, Long) => Unit =
    (batch, _) => update(batch, idCol, vecCol)
}
