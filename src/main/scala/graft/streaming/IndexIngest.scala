package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

import graft.sources.{AnnIndex, DedupIndex}

/** Streaming ingestion into the persisted indexes — the write half of the
  * rolling-corpus story (r11 stretch): a Structured Streaming source of
  * arriving documents/embeddings `foreachBatch`-appends each micro-batch
  * into the on-disk [[graft.sources.DedupIndex]]/[[graft.sources.AnnIndex]],
  * so the NEXT shard (or the next query) sees corpus ∪ everything ingested
  * so far without any batch job in between.
  *
  * Semantics ride entirely on `append`'s contracts (spec-pinned there and
  * in IndexIngestSpec):
  *
  *   - assignment/fingerprinting uses the index's FROZEN geometry (the
  *     persisted quantizer / hash parameters), so a stream-ingested index
  *     is bit-identical to batch-appending the same rows — micro-batch
  *     boundaries are invisible;
  *   - ids must be unique across the stream AND disjoint from the index;
  *     a replayed batch (foreachBatch is at-least-once under recovery)
  *     RAISES on the id clash instead of double-ingesting — dedupe by id
  *     upstream (`dropDuplicatesWithinWatermark`) for exactly-once effect;
  *   - each append layers one file-set per bucketed table; a long-running
  *     ingestion should `compact(path)` when `compactionAdvised(path)`
  *     trips, or let `autoCompact` do it in-line.
  *
  * Maintenance in-line is CRASH-SAFE since the generation scheme (r13):
  * compact/rebuild write a NEW generation and flip the meta pointer
  * atomically — a crash mid-maintenance leaves the previous generation
  * fully readable, so a restarted stream re-opens the index and resumes
  * (the pre-generation layout deleted `meta.json` for the whole rewrite
  * window, and a crash inside it required a manual rebuild).
  *
  * Empty micro-batches (watermark flushes, no-data triggers) are skipped —
  * they would otherwise pay an index open + commit-marker cycle for
  * nothing.
  */
object IndexIngest {

  /** How often the `autoRebuild` health probe runs: every N non-empty
    * micro-batches. The probe costs a brute-force recall sample over the
    * postings, so it must not run per batch; N also acts as the rebuild
    * COOLDOWN — after a rebuild fires, at least N more batches land
    * before the next probe can fire another.
    */
  val DefaultHealthEvery: Int = 4

  /** foreachBatch writer appending each micro-batch of (idCol, vecCol)
    * rows into the ANN index at `path`. Start + awaitTermination (or a
    * trigger of your choice) like any other writer.
    *
    * `autoCompact`: after an append that trips `compactionAdvised` (file
    * layering past ~4 appends per bucket) the postings are compacted
    * in-line — between micro-batches, concurrent readers keep their
    * generation (see the class doc).
    *
    * `autoRebuild`: every [[DefaultHealthEvery]] (`healthEvery`)
    * non-empty batches an [[graft.sources.AnnIndex.healthReport]] runs;
    * a "rebuild" verdict (recall below `recallTarget`, or ingestion
    * drifted the corpus away from the frozen quantizer — hot/dead cells)
    * refits the geometry in-line via [[graft.sources.AnnIndex.rebuild]],
    * so a drifting ingested index heals without an operator. A "compact"
    * verdict compacts when `autoCompact` is also set. The batch counter
    * resets after a rebuild — `healthEvery` is the cooldown.
    *
    * `autoVacuum`: drop the retired generation right after any in-line
    * compact/rebuild, so a long-running stream's storage stays bounded at
    * ONE generation instead of accumulating a permanent ~2× debt
    * ([[graft.sources.AnnIndex.retiredStats]] prices it). Opt-in because
    * it trades away the deferred-GC grace window: a reader holding a plan
    * opened BEFORE the maintenance loses its file-set at the vacuum
    * instead of at the next compact — only enable when queries against
    * the index are short-lived relative to the compaction cadence.
    */
  def annIngest(
      stream: DataFrame,
      path: String,
      autoCompact: Boolean = false,
      autoRebuild: Boolean = false,
      autoVacuum: Boolean = false,
      healthEvery: Int = DefaultHealthEvery,
      recallTarget: Double = 0.8): DataStreamWriter[Row] = {
    require(healthEvery > 0, s"healthEvery must be positive: $healthEvery")
    // foreachBatch runs batches sequentially on the stream's single
    // maintenance thread — a plain var is the counter it needs
    var sinceHealth = 0
    def maintained(body: => Unit): Unit = {
      body
      if (autoVacuum) AnnIndex.vacuum(path)
    }
    stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (batch.head(1).nonEmpty) {
          AnnIndex.append(batch, path): Unit
          sinceHealth += 1
          if (autoRebuild && sinceHealth >= healthEvery) {
            sinceHealth = 0
            val health = AnnIndex.healthReport(
              batch.sparkSession, path, recallTarget = recallTarget)
            health.recommendation match {
              case "rebuild" =>
                maintained(AnnIndex.rebuild(batch.sparkSession, path): Unit)
              case "compact" if autoCompact =>
                maintained(AnnIndex.compact(batch.sparkSession, path): Unit)
              case _ => ()
            }
          } else if (autoCompact && AnnIndex.compactionAdvised(path))
            maintained(AnnIndex.compact(batch.sparkSession, path): Unit)
        }
      }
  }

  /** foreachBatch writer appending each micro-batch of documents into the
    * dedup index at `path`; `textCol` names the document text column (the
    * id column comes from the index's meta). `autoCompact` as
    * [[annIngest]].
    *
    * `autoRebuild`: every `healthEvery` non-empty batches a
    * [[graft.sources.DedupIndex.healthReport]] runs; a "rebuild" verdict
    * (hot-cell mass past the cap — the banding no longer discriminates on
    * the ingested corpus) re-bands to the next-coarser divisor of
    * `numHashes` (fewer bands = stricter collisions = smaller cells) via
    * [[graft.sources.DedupIndex.rebuild]]. Already at 1 band there is
    * nothing coarser — the verdict is left for the operator.
    *
    * `autoVacuum` as [[annIngest]]: reclaim the retired generation right
    * after in-line maintenance — bounded storage, at the price of the
    * deferred-GC grace window for long-lived concurrent readers.
    */
  def dedupIngest(
      stream: DataFrame,
      textCol: String,
      path: String,
      autoCompact: Boolean = false,
      autoRebuild: Boolean = false,
      autoVacuum: Boolean = false,
      healthEvery: Int = DefaultHealthEvery): DataStreamWriter[Row] = {
    require(healthEvery > 0, s"healthEvery must be positive: $healthEvery")
    var sinceHealth = 0
    def maintained(body: => Unit): Unit = {
      body
      if (autoVacuum) DedupIndex.vacuum(path)
    }
    stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (batch.head(1).nonEmpty) {
          DedupIndex.append(batch, textCol, path): Unit
          sinceHealth += 1
          if (autoRebuild && sinceHealth >= healthEvery) {
            sinceHealth = 0
            val health = DedupIndex.healthReport(batch.sparkSession, path)
            health.recommendation match {
              case "rebuild" =>
                val m = DedupIndex.readMeta(path)
                coarserBands(m.numHashes, m.bands).foreach(b =>
                  maintained(DedupIndex.rebuild(batch.sparkSession, path, b): Unit))
              case "compact" if autoCompact =>
                maintained(DedupIndex.compact(batch.sparkSession, path): Unit)
              case _ => ()
            }
          } else if (autoCompact && DedupIndex.compactionAdvised(path))
            maintained(DedupIndex.compact(batch.sparkSession, path): Unit)
        }
      }
  }

  /** The next-coarser banding: the largest divisor of `numHashes` strictly
    * below `bands` (None at 1 — nothing coarser exists).
    */
  private[graft] def coarserBands(numHashes: Int, bands: Int): Option[Int] =
    ((bands - 1) to 1 by -1).find(numHashes % _ == 0)
}
