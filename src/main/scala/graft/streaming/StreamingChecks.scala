package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.core.TestResult
import graft.requirements.Requirement
import graft.runner.Runner

/** Structured-Streaming integration: run the same constraint surface over a
  * stream. The reference is batch-only; streams are a first-class extension
  * here because training-data pipelines ingest continuously.
  *
  * Three modes:
  *   1. `windowedProfile` — a declarative watermarked windowed aggregation
  *      producing per-window data-quality metrics (row counts, null
  *      fractions, numeric mins/maxes) as a streaming DataFrame the caller
  *      sinks anywhere. Pure `groupBy(window(...))` — incremental, state
  *      bounded by the watermark.
  *   2. `runningKeyProfile` — CUSTOM state via `flatMapGroupsWithState`:
  *      per-key running metrics that never reset at window boundaries, with
  *      event-time-timeout state eviction.
  *   3. `foreachBatchRunner` — evaluate an arbitrary `Requirement` on every
  *      micro-batch (each micro-batch is a normal DataFrame, so every
  *      constraint in the library applies unchanged).
  *   4. `streamingNearDups` — near-duplicate detection AT INGEST: the batch
  *      MinHash+LSH machinery (same codegen'd kernels) keyed into
  *      `flatMapGroupsWithState` per (band, bucket), state bounded by the
  *      watermark TTL and a hot-bucket cap.
  *   5. `streamingEmbeddingNearDups` — the embedding flavor of (4): the
  *      batch banded sign-bit LSH (`Similarity.embeddingNearDups`'
  *      geometry) with exact-cosine verification against the bucket's
  *      recent residents.
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

  /** Streaming sessionization: per-key session profiles via Spark's native
    * `session_window` (dynamic-gap windows merge as events arrive; state is
    * bounded by the watermark — closed sessions emit and evict). The
    * streaming flavor of `ops.Events.sessionize`+`sessionProfile`: same
    * gap semantics, incremental execution. Append mode emits each session
    * exactly once, when the watermark passes its close.
    */
  def streamingSessionProfile(
      stream: DataFrame,
      keyColumn: String,
      timeColumn: String,
      watermark: String,
      gap: String,
      valueColumn: String): DataFrame =
    stream
      .withWatermark(timeColumn, watermark)
      .groupBy(session_window(col(timeColumn), gap).as("session"), col(keyColumn))
      .agg(
        count(lit(1)).as("n_events"),
        avg(col(valueColumn)).as("avg_value"))
      .select(
        col(keyColumn),
        col("session.start").as("session_start"),
        col("session.end").as("session_end"),
        col("n_events"),
        col("avg_value"))

  /** Streaming Count-Min sketch: the batch sketch
    * ([[graft.ops.Sketches.cmsSketch]]) is a grouped count, so it is ALSO a
    * legal streaming aggregation — the state store holds at most
    * depth × width counter rows regardless of stream volume, and update
    * mode emits the revised cells each micro-batch. Continuous token/URL
    * frequency tracking at a fixed memory budget; snapshot the output and
    * [[graft.ops.Sketches.cmsEstimate]]/[[graft.ops.Sketches.cmsMerge]]
    * work on it unchanged (the sketch table is the interchange format).
    */
  def streamingCmsSketch(
      stream: DataFrame,
      valueCol: String,
      depth: Int = 4,
      width: Int = 256): DataFrame = {
    val cells = (0 until depth).map { d =>
      struct(
        lit(d).as("cms_row"),
        graft.ops.Sketches.cmsBucket(col(valueCol), d, width).as("cms_bucket"))
    }
    stream
      .where(col(valueCol).isNotNull)
      .select(explode(array(cells: _*)).as("dj_cell"))
      .groupBy(
        col("dj_cell.cms_row").as("cms_row"),
        col("dj_cell.cms_bucket").as("cms_bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Streaming HyperLogLog registers: the batch sketch
    * ([[graft.ops.Sketches.hllSketch]]) is a grouped MAX, so it too is a
    * legal streaming aggregation — ≤ 2^b register rows of state for a
    * running distinct-count over an unbounded stream;
    * [[graft.ops.Sketches.hllEstimate]] reads any snapshot.
    */
  def streamingHllSketch(
      stream: DataFrame,
      valueCol: String,
      b: Int = 8): DataFrame = {
    val m = 1 << b
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val suffix = shiftright(h, b)
    val sb = 60 - b
    val rank = when(suffix === 0, lit(sb + 1))
      .otherwise(lit(sb) - length(bin(suffix)) + 1)
    stream
      .where(col(valueCol).isNotNull)
      .select((h % m).as("hll_bucket"), rank.cast("int").as("dj_rank"))
      .groupBy("hll_bucket")
      .agg(max(col("dj_rank")).as("hll_register"))
  }

  /** Streaming equi-width histogram — the drift-monitor state for a live
    * stream: the batch histogram ([[graft.ops.Stats.histogram]]) is a
    * grouped count over clamped bucket indices, so it is ALSO a legal
    * streaming aggregation with ≤ `nBuckets` state rows regardless of
    * stream volume. Snapshot the complete-mode output and feed it
    * straight into [[graft.ops.Drift.psi]]'s bucket-table side (or eye
    * the shape) — continuous "is today's feed distributed like the
    * reference" monitoring at fixed memory.
    */
  def streamingHistogram(
      stream: DataFrame,
      valueCol: String,
      lo: Double,
      hi: Double,
      nBuckets: Int): DataFrame =
    graft.ops.Stats.histogram(stream, valueCol, lo, hi, nBuckets)

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

  /** Running state carried per key by `runningKeyProfile`. `nVal` counts
    * non-null values — the explicit "seen one yet" flag, so a genuine NaN
    * observation is not mistaken for the initial sentinel (it poisons
    * min/max to NaN, the IEEE answer, instead of vanishing); `maxEventMs`
    * is the largest event time EVER seen for the key (Long.MinValue before
    * the first one) — kept in state so late or null-event-time batches can
    * never move the eviction timeout earlier.
    *
    * STATE-SCHEMA COMPATIBILITY: this case class IS the state-store encoder
    * schema. Adding `nVal` was a breaking change — a `runningKeyProfile`
    * query restored from a checkpoint written before it will fail or
    * misread state; restart such queries from a fresh checkpoint. Any
    * future field change carries the same cost (version the class or map
    * the state forward explicitly if live-upgrade ever matters). */
  final case class KeyRunningState(
      n: Long,
      nNull: Long,
      nVal: Long,
      vMin: Double,
      vMax: Double,
      maxEventMs: Long)

  /** One emitted profile row per key per micro-batch. */
  final case class KeyProfile(
      key: String,
      n_rows: Long,
      null_frac: Double,
      v_min: Double,
      v_max: Double)

  /** Per-key RUNNING value profile with custom state
    * (`flatMapGroupsWithState`) — counts, null fraction, min and max
    * accumulate across micro-batches, something no windowed aggregation can
    * express because the state never resets at window boundaries. Emits the
    * updated profile for every key that saw data in the micro-batch.
    *
    * State scale: ONE small fixed-size entry per distinct key, partitioned
    * by key across executors; idle keys are evicted by an event-time timeout
    * `stateTtlMs` past the watermark, so the state store is bounded by the
    * number of keys active inside the horizon — the same posture as
    * `streamingDedup`.
    */
  def runningKeyProfile(
      stream: DataFrame,
      timeColumn: String,
      watermark: String,
      keyColumn: String,
      valueColumn: String,
      stateTtlMs: Long = 3600000L): Dataset[KeyProfile] = {
    require(stateTtlMs > 0,
      s"stateTtlMs must be positive (a timeout at or before the watermark fails the query): $stateTtlMs")
    val spark = stream.sparkSession
    import spark.implicits._
    // the watermarked event-time column must survive the projection for the
    // event-time timeout to be accepted (and it is what advances eviction) —
    // selected UNCAST: an alias keeps the watermark attribute metadata, a
    // cast would strip it. `timeColumn` must already be a TIMESTAMP.
    val rows = stream
      .withWatermark(timeColumn, watermark)
      .select(
        col(keyColumn).cast("string").as("_1"),
        col(valueColumn).cast("double").as("_2"),
        col(timeColumn).as("_3"))
      .as[(String, Option[Double], java.sql.Timestamp)]
    rows
      .groupByKey(_._1)
      .flatMapGroupsWithState[KeyRunningState, KeyProfile](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (key, it, state: GroupState[KeyRunningState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var s = state.getOption.getOrElse(
              KeyRunningState(0L, 0L, 0L, Double.NaN, Double.NaN, Long.MinValue))
            var maxEventMs = s.maxEventMs
            it.foreach { case (_, v, t) =>
              if (t != null) maxEventMs = math.max(maxEventMs, t.getTime)
              s = v match {
                case Some(x) =>
                  KeyRunningState(
                    s.n + 1,
                    s.nNull,
                    s.nVal + 1,
                    if (s.nVal == 0) x else math.min(s.vMin, x),
                    if (s.nVal == 0) x else math.max(s.vMax, x),
                    s.maxEventMs)
                case None =>
                  KeyRunningState(
                    s.n + 1, s.nNull + 1, s.nVal, s.vMin, s.vMax, s.maxEventMs)
              }
            }
            s = s.copy(maxEventMs = maxEventMs)
            state.update(s)
            // MONOTONE eviction timeout: both anchors only ever grow -- the
            // historical max event time lives in the state, so a late batch
            // (or one of only null event times) can never pull the timeout
            // earlier, while the watermark+TTL floor keeps an
            // actively-updating key alive even when its rows carry null
            // event times. On the first batch the watermark is 0, so the
            // event anchor dominates there.
            state.setTimeoutTimestamp(
              math.max(
                maxEventMs + stateTtlMs,
                state.getCurrentWatermarkMs() + stateTtlMs))
            Iterator(
              KeyProfile(key, s.n, if (s.n == 0) 0.0 else s.nNull.toDouble / s.n, s.vMin, s.vMax))
          }
      }
  }

  /** Evaluate a requirement over every micro-batch; `onResults` receives
    * (batchId, results). State: none beyond the source's own offsets —
    * constraints see one micro-batch at a time (the streaming analogue of
    * the reference's per-table spec run).
    */
  def foreachBatchRunner(
      stream: DataFrame,
      mkRequirement: DataFrame => Requirement,
      onResults: (Long, Seq[TestResult]) => Unit,
      outputMode: OutputMode = OutputMode.Append): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode(outputMode)
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
    // Complete, not Append: in a bounded one-shot run the final watermark
    // sits maxEventTime - delay, so Append would withhold every window not
    // yet closed (typically ALL of them) and return an empty table
    val q = windowedProfile(stream, timeColumn, watermark, windowDuration, numericColumns)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** One signature held in a bucket's state. */
  final case class BucketEntry(id: Long, sig: Seq[Long], eventMs: Long)

  /** State per (band, bucket): the signatures seen inside the TTL horizon
    * plus the monotone max event time (same eviction anchor discipline as
    * `runningKeyProfile`). */
  final case class BucketState(entries: Seq[BucketEntry], maxEventMs: Long)

  /** One emitted candidate pair (`id1 < id2`); `agreement` is the MinHash
    * signature agreement — an unbiased Jaccard estimate. The same true pair
    * can surface from several bands: downstream dedups with
    * `dropDuplicates("id1","id2")` (or a within-watermark variant). */
  final case class StreamDupPair(id1: Long, id2: Long, band: Int, agreement: Double)

  /** Near-duplicate detection AT INGEST — the streaming face of
    * `Dedup.minhashNearDups`, sharing its codegen'd kernels
    * (`ShingleHashes`, `MinHashSignature`) in the stateless projection:
    * each document's signature is banded exactly like the batch LSH, and
    * each (band, bucket) group holds the recent signatures in
    * `flatMapGroupsWithState` state. A new arrival compares against its
    * bucket's residents and emits a pair per resident whose signature
    * agreement reaches `threshold`; a bucket at `maxBucketSize` stops both
    * storing and pairing (boilerplate guard — the batch
    * `lshCandidatePairs` drops oversized buckets entirely; a stream can't
    * retract pairs already emitted below the cap, so it stops emitting
    * from the cap onward). Ids must cast to long; null/uncastable ids are
    * dropped, not fatal.
    *
    * State scale: one entry per document per band within the TTL horizon,
    * partitioned across executors by (band, bucket) — bounded by ingest
    * rate × TTL, NOT corpus size; idle buckets are evicted wholesale by the
    * event-time timeout. Exactly the bounded-state posture `streamingDedup`
    * has for exact duplicates, extended to near-duplicates.
    */
  def streamingNearDups(
      stream: DataFrame,
      timeColumn: String,
      watermark: String,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      shingleK: Int = 5,
      numHashes: Int = 64,
      bands: Int = 16,
      maxBucketSize: Int = 1000,
      stateTtlMs: Long = 3600000L): Dataset[StreamDupPair] = {
    require(stateTtlMs > 0, s"stateTtlMs must be positive: $stateTtlMs")
    require(bands > 0 && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")
    val spark = stream.sparkSession
    import spark.implicits._
    val rowsPerBand = numHashes / bands
    // stateless projection — the batch kernels are deterministic
    // expressions, so they run unchanged inside a streaming plan; the
    // event-time column is selected UNCAST to keep its watermark metadata
    val signed = stream
      .withWatermark(timeColumn, watermark)
      .select(
        col(idCol).cast("long").as("_id"),
        graft.functions.ShingleHashes
          .shingleHashes(graft.ops.TextAnalysis.normalize(col(textCol)), shingleK)
          .as("_sh"),
        col(timeColumn).as("_t"))
      // null ids (or ids that don't cast to long) are dropped, NOT fed to
      // the non-nullable tuple encoder — one dirty row must not kill a
      // continuous ingest query; same null-id policy as the Corpus ops
      .where(col("_id").isNotNull && size(col("_sh")) > 0)
      .select(
        col("_id"),
        graft.functions.MinHashSignature
          .minhashSignature(col("_sh"), numHashes).as("_sig"),
        col("_t"))
    val banded = signed
      .select(
        col("_id"),
        col("_sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("_band"),
        col("_t"))
      .select(
        col("_id"),
        col("_band"),
        xxhash64(
          slice(col("_sig"), col("_band") * rowsPerBand + 1, lit(rowsPerBand)),
          col("_band")).as("_bucket"),
        col("_sig"),
        col("_t"))
      .as[(Long, Int, Long, Seq[Long], java.sql.Timestamp)]
    banded
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState[BucketState, StreamDupPair](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (key, it, state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val wmMs = state.getCurrentWatermarkMs()
            val st = state.getOption.getOrElse(BucketState(Nil, Long.MinValue))
            // horizon eviction: entries older than watermark - TTL can no
            // longer legitimately pair with in-watermark arrivals
            var entries = st.entries.filter(_.eventMs >= wmMs - stateTtlMs).toList
            var maxEventMs = st.maxEventMs
            val out = Seq.newBuilder[StreamDupPair]
            it.foreach { case (id, band, _, sig, t) =>
              val eventMs = if (t == null) wmMs else t.getTime
              maxEventMs = math.max(maxEventMs, eventMs)
              val sigArr = sig.toArray
              // hot-bucket suppression: once a bucket hits the cap it stops
              // BOTH storing and pairing — a boilerplate bucket must not
              // keep emitting cap-sized pair bursts per arrival forever
              // (batch lshCandidatePairs drops such buckets entirely; a
              // stream can't retract pairs already emitted below the cap)
              if (entries.size < maxBucketSize) {
                entries.foreach { e =>
                  if (e.id != id) {
                    var agree = 0
                    var i = 0
                    while (i < numHashes) {
                      if (e.sig(i) == sigArr(i)) agree += 1
                      i += 1
                    }
                    val frac = agree.toDouble / numHashes
                    if (frac >= threshold)
                      out += StreamDupPair(
                        math.min(id, e.id), math.max(id, e.id), band, frac)
                  }
                }
                entries = BucketEntry(id, sigArr.toSeq, eventMs) :: entries
              }
            }
            state.update(BucketState(entries, maxEventMs))
            // monotone timeout anchor, as in runningKeyProfile
            state.setTimeoutTimestamp(
              math.max(maxEventMs, wmMs) + stateTtlMs)
            out.result().iterator
          }
      }
  }

  /** One emitted embedding pair (`id1 < id2`); `cosine` is the EXACT
    * verified similarity (banding only gates candidacy). The same true pair
    * can surface from several bands — downstream dedups on (id1, id2). */
  final case class StreamVecPair(id1: Long, id2: Long, band: Int, cosine: Double)

  final case class VecEntry(id: Long, vec: Seq[Float], eventMs: Long)

  final case class VecBucketState(entries: Seq[VecEntry], maxEventMs: Long)

  /** Embedding-cosine near-duplicate detection AT INGEST — the streaming
    * face of `Similarity.embeddingNearDups`, sharing its banded sign-bit
    * geometry: the stateless projection computes the same deterministic
    * hyperplane sign bits and splits them into `bands` sub-keys; each
    * (band, bucket) group holds its recent vectors in
    * `flatMapGroupsWithState` state, and a new arrival emits a pair per
    * resident whose EXACT cosine reaches `threshold`. A bucket at
    * `maxBucketSize` stops both storing and pairing (the batch path drops
    * oversized buckets entirely; a stream can't retract pairs already
    * emitted below the cap). Ids must cast to long; null/uncastable ids
    * and null vectors are dropped, not fatal.
    *
    * State scale: one dim-float vector per document per band within the
    * TTL horizon, partitioned by (band, bucket) — bounded by ingest rate ×
    * TTL, NOT corpus size; idle buckets are evicted wholesale by the
    * event-time timeout.
    */
  def streamingEmbeddingNearDups(
      stream: DataFrame,
      timeColumn: String,
      watermark: String,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.9,
      bits: Int = 32,
      dim: Int = 64,
      bands: Int = 4,
      maxBucketSize: Int = 1000,
      stateTtlMs: Long = 3600000L): Dataset[StreamVecPair] = {
    require(stateTtlMs > 0, s"stateTtlMs must be positive: $stateTtlMs")
    require(bands > 0 && bits % bands == 0,
      s"bits ($bits) must be a positive multiple of bands ($bands)")
    val width = bits / bands
    require(width * bands < 64, "banded key must fit a single long")
    val spark = stream.sparkSession
    import spark.implicits._
    val planes = graft.ops.Similarity.hyperplanes(bits, dim)
    val mask = (1L << width) - 1L
    val keyed = stream
      .withWatermark(timeColumn, watermark)
      .select(
        col(idCol).cast("long").as("_id"),
        col(vecCol).as("_vec"),
        graft.ops.Similarity.lshKey(col(vecCol), planes).as("_key"),
        col(timeColumn).as("_t"))
      .where(col("_id").isNotNull && col("_vec").isNotNull)
    val banded = keyed
      .select(
        col("_id"),
        col("_vec"),
        explode(sequence(lit(0), lit(bands - 1))).as("_band"),
        col("_key"),
        col("_t"))
      .select(
        col("_id"),
        col("_band"),
        call_function("shiftrightunsigned", col("_key"), col("_band") * lit(width))
          .bitwiseAND(lit(mask)).as("_bucket"),
        col("_vec"),
        col("_t"))
      .as[(Long, Int, Long, Seq[Float], java.sql.Timestamp)]
    banded
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState[VecBucketState, StreamVecPair](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (key, it, state: GroupState[VecBucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val wmMs = state.getCurrentWatermarkMs()
            val st = state.getOption.getOrElse(VecBucketState(Nil, Long.MinValue))
            var entries = st.entries.filter(_.eventMs >= wmMs - stateTtlMs).toList
            var maxEventMs = st.maxEventMs
            val out = Seq.newBuilder[StreamVecPair]
            it.foreach { case (id, band, _, vec, t) =>
              val eventMs = if (t == null) wmMs else t.getTime
              maxEventMs = math.max(maxEventMs, eventMs)
              val v = vec.toArray
              if (entries.size < maxBucketSize) {
                entries.foreach { e =>
                  if (e.id != id) {
                    val o = e.vec.toArray
                    // EXACTLY the batch cosineF arithmetic (Similarity):
                    // the dot product truncates to the shared prefix
                    // (DotProductFloat's contract) but each norm runs over
                    // its FULL vector — a dimension-mismatched pair scores
                    // LOW (missing mass stays in the denominator), never
                    // inflated as the old prefix-only norms had it
                    val n = math.min(v.length, o.length)
                    var dotAcc, na, nb = 0.0
                    var i = 0
                    while (i < n) {
                      dotAcc += v(i).toDouble * o(i)
                      i += 1
                    }
                    i = 0
                    while (i < v.length) { na += v(i).toDouble * v(i); i += 1 }
                    i = 0
                    while (i < o.length) { nb += o(i).toDouble * o(i); i += 1 }
                    val denom = math.sqrt(na) * math.sqrt(nb)
                    val cos = if (denom == 0.0) 0.0 else dotAcc / denom
                    if (cos >= threshold)
                      out += StreamVecPair(
                        math.min(id, e.id), math.max(id, e.id), band, cos)
                  }
                }
                entries = VecEntry(id, v.toSeq, eventMs) :: entries
              }
            }
            state.update(VecBucketState(entries, maxEventMs))
            state.setTimeoutTimestamp(
              math.max(maxEventMs, wmMs) + stateTtlMs)
            out.result().iterator
          }
      }
  }
}
