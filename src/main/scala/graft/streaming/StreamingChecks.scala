package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

import graft.core.TestResult
import graft.requirements.Requirement
import graft.runner.Runner

/** Structured-Streaming integration: run the same constraint surface over a
  * stream. The reference is batch-only; streams are a first-class extension
  * here because training-data pipelines ingest continuously.
  *
  * Two modes:
  *   1. `windowedProfile` — a declarative watermarked windowed aggregation
  *      producing per-window data-quality metrics (row counts, null
  *      fractions, numeric mins/maxes) as a streaming DataFrame the caller
  *      sinks anywhere. Pure `groupBy(window(...))` — incremental, state
  *      bounded by the watermark.
  *   2. `foreachBatchRunner` — evaluate an arbitrary `Requirement` on every
  *      micro-batch (each micro-batch is a normal DataFrame, so every
  *      constraint in the library applies unchanged).
  */
object StreamingChecks {

  /** Per-window quality profile of a stream:
    * (window, n_rows, null fraction + min/max per watched column).
    */
  def windowedProfile(
      stream: DataFrame,
      timeColumn: String,
      watermark: String,
      windowDuration: String,
      numericColumns: Seq[String]): DataFrame = {
    val aggs =
      count(lit(1)).as("n_rows") +:
        numericColumns.flatMap { c =>
          Seq(
            (count(when(col(c).isNull, 1)).cast("double") / count(lit(1)))
              .as(s"${c}_null_frac"),
            min(col(c)).as(s"${c}_min"),
            max(col(c)).as(s"${c}_max"))
        }
    stream
      .withWatermark(timeColumn, watermark)
      .groupBy(window(col(timeColumn), windowDuration))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Streaming exact deduplication on a fingerprint key with bounded state:
    * `dropDuplicatesWithinWatermark` keeps one row per key while the
    * watermark bounds how long a key's state lives — the streaming flavor of
    * the batch exact-dedup pass (`ops.Dedup.dedupExact`). `keyExprs`
    * typically includes a content fingerprint (e.g.
    * `TextAnalysis.fingerprintMd5`), so near-real-time ingestion dedups
    * continuously instead of re-scanning the corpus per batch.
    *
    * State scale: one small entry per distinct key inside the watermark
    * horizon, partitioned by key across executors — no global structure.
    */
  def streamingDedup(
      stream: DataFrame,
      timeColumn: String,
      watermark: String,
      keyColumns: Seq[String]): DataFrame =
    stream
      .withWatermark(timeColumn, watermark)
      .dropDuplicatesWithinWatermark(keyColumns)

  /** Evaluate a requirement over every micro-batch; `onResults` receives
    * (batchId, results). State: none beyond the source's own offsets —
    * constraints see one micro-batch at a time (the streaming analogue of
    * the reference's per-table spec run).
    */
  def foreachBatchRunner(
      stream: DataFrame,
      mkRequirement: DataFrame => Requirement,
      onResults: (Long, Seq[TestResult]) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val req = mkRequirement(batch)
        onResults(batchId, req.test(batch.sparkSession))
      }

  /** Convenience: run the windowed profile to an in-memory sink once
    * (processAllAvailable) and return the collected profile — used by tests
    * and ad-hoc inspection.
    */
  def profileOnce(
      spark: SparkSession,
      stream: DataFrame,
      timeColumn: String,
      watermark: String,
      windowDuration: String,
      numericColumns: Seq[String],
      queryName: String = "graft_profile"): DataFrame = {
    val q = windowedProfile(stream, timeColumn, watermark, windowDuration, numericColumns)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
