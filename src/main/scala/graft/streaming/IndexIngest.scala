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
  *     ingestion should `compact(path)` when
  *     `compactionAdvised(path)` trips (the maintenance half of the
  *     lifecycle).
  *
  * Empty micro-batches (watermark flushes, no-data triggers) are skipped —
  * they would otherwise pay an index open + commit-marker cycle for
  * nothing.
  */
object IndexIngest {

  /** foreachBatch writer appending each micro-batch of (idCol, vecCol)
    * rows into the ANN index at `path`. Start + awaitTermination (or a
    * trigger of your choice) like any other writer. With `autoCompact` the
    * sink runs the maintenance half too: after an append that trips
    * `compactionAdvised` (file layering past ~4 appends per bucket) the
    * postings are compacted in-line — between micro-batches, so readers
    * never see a mid-rewrite index (the commit marker guards crashes).
    */
  def annIngest(
      stream: DataFrame,
      path: String,
      autoCompact: Boolean = false): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (batch.head(1).nonEmpty) {
          AnnIndex.append(batch, path): Unit
          if (autoCompact && AnnIndex.compactionAdvised(path))
            AnnIndex.compact(batch.sparkSession, path): Unit
        }
      }

  /** foreachBatch writer appending each micro-batch of documents into the
    * dedup index at `path`; `textCol` names the document text column (the
    * id column comes from the index's meta). `autoCompact` as
    * [[annIngest]].
    */
  def dedupIngest(
      stream: DataFrame,
      textCol: String,
      path: String,
      autoCompact: Boolean = false): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (batch.head(1).nonEmpty) {
          DedupIndex.append(batch, textCol, path): Unit
          if (autoCompact && DedupIndex.compactionAdvised(path))
            DedupIndex.compact(batch.sparkSession, path): Unit
        }
      }
}
