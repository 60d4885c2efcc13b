package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.FrameSource
import graft.requirements.WithinRequirement
import graft.streaming.StreamingChecks

/** Structured-Streaming checks: windowed quality profile + per-micro-batch
  * constraint evaluation.
  */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowedProfile aggregates per event-time window with watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, java.lang.Double)]
    val stream = input.toDF().toDF("event_time", "value")
    val query = StreamingChecks
      .windowedProfile(stream, "event_time", "10 seconds", "1 minute", Seq("value"))
      .writeStream
      .format("memory")
      .queryName("profile_test")
      .outputMode("append")
      .start()
    input.addData(
      (ts("2026-01-01 00:00:10"), 1.0),
      (ts("2026-01-01 00:00:20"), null),
      (ts("2026-01-01 00:01:10"), 5.0),
      (ts("2026-01-01 00:01:40"), 7.0))
    query.processAllAvailable()
    // advance the watermark past both target windows so append emits them
    input.addData((ts("2026-01-01 00:10:00"), java.lang.Double.valueOf(0.0)))
    query.processAllAvailable()
    query.stop()
    val rows = spark.table("profile_test")
      .select(col("window.start").cast("string"), col("n_rows"),
        col("value_null_frac"), col("value_min"), col("value_max"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.get(3), r.get(4)))
      .toMap
    assert(rows("2026-01-01 00:00:00") == ((2L, 0.5, 1.0, 1.0)))
    assert(rows("2026-01-01 00:01:00") == ((2L, 0.0, 5.0, 7.0)))
  }

  test("streamingSessionProfile merges gap-bounded sessions incrementally") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String, java.lang.Double)]
    val stream = input.toDF().toDF("event_time", "user", "value")
    val query = StreamingChecks
      .streamingSessionProfile(
        stream, "user", "event_time",
        watermark = "10 seconds", gap = "30 seconds", valueColumn = "value")
      .writeStream
      .format("memory")
      .queryName("session_test")
      .outputMode("append")
      .start()
    input.addData(
      (ts("2026-01-01 00:00:00"), "u1", 2.0),
      (ts("2026-01-01 00:00:20"), "u1", 4.0), // 20s gap → same session
      (ts("2026-01-01 00:02:00"), "u1", 9.0), // >30s gap → new session
      (ts("2026-01-01 00:00:05"), "u2", 1.0))
    query.processAllAvailable()
    // push the watermark far past every session close so append emits all
    input.addData((ts("2026-01-01 00:30:00"), "u3", java.lang.Double.valueOf(0.0)))
    query.processAllAvailable()
    query.stop()
    val rows = spark.table("session_test")
      .select(col("user"), col("session_start").cast("string"),
        col("n_events"), col("avg_value"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // u1's first two events merged into one session (avg 3.0), the third
    // opened a fresh one; u2 sessioned alone
    assert(rows(("u1", "2026-01-01 00:00:00")) == ((2L, 3.0)))
    assert(rows(("u1", "2026-01-01 00:02:00")) == ((1L, 9.0)))
    assert(rows(("u2", "2026-01-01 00:00:05")) == ((1L, 1.0)))
  }

  test("streamingDedup keeps one row per key with watermark-bounded state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input  = MemoryStream[(Timestamp, String, String)]
    val stream = input.toDF().toDF("event_time", "doc_id", "text")
    val deduped = StreamingChecks.streamingDedup(
      stream.withColumn("fp", graft.ops.TextAnalysis.fingerprintMd5(col("text"))),
      "event_time", "10 seconds", Seq("fp"))
    val query = deduped.writeStream
      .format("memory")
      .queryName("dedup_test")
      .outputMode("append")
      .start()
    input.addData(
      (ts("2026-01-01 00:00:01"), "a", "same text"),
      (ts("2026-01-01 00:00:02"), "b", "same text"),  // dup inside watermark
      (ts("2026-01-01 00:00:03"), "c", "other text"))
    query.processAllAvailable()
    input.addData((ts("2026-01-01 00:00:04"), "d", "Same  Text!")) // dup after normalization
    query.processAllAvailable()
    query.stop()
    val kept = spark.table("dedup_test").select("doc_id").as[String].collect().toSet
    assert(kept == Set("a", "c"), s"kept=$kept")
  }

  test("runningKeyProfile accumulates per-key state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input  = MemoryStream[(Timestamp, String, java.lang.Double)]
    val stream = input.toDF().toDF("event_time", "key", "value")
    val query = StreamingChecks
      .runningKeyProfile(stream, "event_time", "10 seconds", "key", "value")
      .writeStream
      .format("memory")
      .queryName("running_profile_test")
      .outputMode("update")
      .start()
    // batch 1: key a sees 2 values (one null), key b sees 1
    input.addData(
      (ts("2026-01-01 00:00:01"), "a", 4.0),
      (ts("2026-01-01 00:00:02"), "a", null),
      (ts("2026-01-01 00:00:03"), "b", 9.0))
    query.processAllAvailable()
    // batch 2: key a again — state must CARRY OVER (n=3, min stays 4.0)
    input.addData((ts("2026-01-01 00:00:30"), "a", java.lang.Double.valueOf(2.0)))
    query.processAllAvailable()
    query.stop()
    val byKeyLatest = spark.table("running_profile_test")
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .groupBy(_._1)
      .map { case (k, rows) => k -> rows.map(_._2).maxBy(_._1) } // latest = max n
    assert(byKeyLatest("a") == ((3L, 1.0 / 3, 2.0, 4.0)), s"a=${byKeyLatest("a")}")
    assert(byKeyLatest("b") == ((1L, 0.0, 9.0, 9.0)), s"b=${byKeyLatest("b")}")
  }

  test("streamingCmsSketch: incremental cells converge to the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[String]
    val query = StreamingChecks
      .streamingCmsSketch(input.toDF().toDF("v"), "v", depth = 3, width = 16)
      .writeStream
      .format("memory")
      .queryName("cms_stream_test")
      .outputMode("complete")
      .start()
    val batch1 = Seq("x", "y", "x", "z")
    val batch2 = Seq("x", "w", "y")
    input.addData(batch1: _*)
    query.processAllAvailable()
    input.addData(batch2: _*)
    query.processAllAvailable()
    query.stop()
    val streamed = spark.table("cms_stream_test")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the streaming state must equal the one-shot batch sketch of all data
    val batch = graft.ops.Sketches
      .cmsSketch((batch1 ++ batch2).toDF("v"), "v", depth = 3, width = 16)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed === batch)
  }

  test("streamingHllSketch: incremental registers converge to the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[String]
    val query = StreamingChecks
      .streamingHllSketch(input.toDF().toDF("v"), "v", b = 6)
      .writeStream
      .format("memory")
      .queryName("hll_stream_test")
      .outputMode("complete")
      .start()
    val batch1 = (1 to 40).map(i => s"u$i")
    val batch2 = (30 to 70).map(i => s"u$i") // overlap: dups must not move it
    input.addData(batch1: _*)
    query.processAllAvailable()
    input.addData(batch2: _*)
    query.processAllAvailable()
    query.stop()
    val streamed = spark.table("hll_stream_test")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val batch = graft.ops.Sketches
      .hllSketch((batch1 ++ batch2).toDF("v"), "v", b = 6)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(streamed === batch)
  }

  test("runningKeyProfile: idle keys are evicted after the event-time TTL") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input  = MemoryStream[(Timestamp, String, java.lang.Double)]
    val stream = input.toDF().toDF("event_time", "key", "value")
    val query = StreamingChecks
      .runningKeyProfile(stream, "event_time", "10 seconds", "key", "value",
        stateTtlMs = 60000L) // 1 minute TTL
      .writeStream
      .format("memory")
      .queryName("evict_test")
      .outputMode("update")
      .start()
    input.addData((ts("2026-01-01 00:00:01"), "a", java.lang.Double.valueOf(4.0)))
    query.processAllAvailable()
    // advance the watermark far past a's TTL via another key
    input.addData((ts("2026-01-01 02:00:00"), "b", java.lang.Double.valueOf(1.0)))
    query.processAllAvailable()
    // a's state must be gone: its running count restarts at 1
    input.addData((ts("2026-01-01 02:00:05"), "a", java.lang.Double.valueOf(9.0)))
    query.processAllAvailable()
    query.stop()
    val aRows = spark.table("evict_test")
      .where(col("key") === "a")
      .select("n_rows", "v_min")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(aRows.contains((1L, 4.0)), s"first profile: $aRows")
    assert(aRows.contains((1L, 9.0)), s"post-eviction profile must restart at n=1: $aRows")
    assert(!aRows.exists(_._1 == 2L), s"state survived past its TTL: $aRows")
  }

  test("file-source stream over the events table produces a full profile") {
    import org.apache.spark.sql.types._
    // stage a directory containing only the events file (file streams ingest
    // whole directories)
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType), // TIMESTAMP(NANOS) read as long
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    val stream = spark.readStream
      .schema(schema)
      .parquet(dir.toString)
      .withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
    val q = StreamingChecks
      .windowedProfile(stream, "ts", "1 minute", "1 hour", Seq("value"))
      .writeStream
      .format("memory")
      .queryName("events_profile_test")
      .outputMode("complete") // emit every window, open or closed
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val total = spark.table("events_profile_test")
      .agg(sum(col("n_rows"))).head().getLong(0)
    assert(total == 1000L) // all sf0.001 events accounted for across windows
  }

  test("foreachBatchRunner evaluates constraints per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Int]
    input.addData(1 to 19: _*)
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
    val writer = StreamingChecks.foreachBatchRunner(
      input.toDF().toDF("col_int"),
      batch => {
        val req = WithinRequirement.fromDataFrame(batch, "stream_batch")
        req.addNRowsEqualityConstraint(19)
        req.addNumericMaxConstraint("col_int", 19.0)
        req
      },
      (batchId, rs) => results.synchronized { rs.foreach(r => results += batchId -> r.outcome) })
    val q = writer
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(results.nonEmpty && results.forall(_._2))
  }

  test("profileOnce returns open windows in a bounded one-shot run") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, java.lang.Double)]
    // all events inside ONE still-open window: Append mode would withhold
    // it forever (final watermark = max event - delay < window end)
    input.addData(
      (ts("2026-01-01 00:00:05"), 1.0),
      (ts("2026-01-01 00:00:25"), 3.0))
    val profile = graft.streaming.StreamingChecks.profileOnce(
      spark, input.toDF().toDF("event_time", "value"),
      "event_time", "10 seconds", "1 minute", Seq("value"),
      queryName = "profile_once_test")
    assert(profile.count() == 1, "the open window must be emitted")
    assert(profile.select(col("n_rows")).head().getLong(0) == 2L)
  }

  test("runningKeyProfile: a genuine NaN observation poisons min/max, not vanishes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String, java.lang.Double)]
    val query = graft.streaming.StreamingChecks.runningKeyProfile(
      input.toDF().toDF("event_time", "key", "value"),
      "event_time", "10 seconds", "key", "value")
      .writeStream.format("memory").queryName("nan_profile").outputMode("update").start()
    input.addData(
      (ts("2026-01-01 00:00:01"), "a", java.lang.Double.valueOf(Double.NaN)),
      (ts("2026-01-01 00:00:02"), "a", java.lang.Double.valueOf(5.0)))
    query.processAllAvailable()
    query.stop()
    val r = spark.table("nan_profile")
      .orderBy(col("n_rows").desc).head()
    // NaN was the first value: IEEE poisoning keeps it visible in min/max
    // (the sentinel-NaN bug dropped the observation and reported 5.0/5.0)
    assert(r.getAs[Long]("n_rows") == 2L)
    assert(r.getAs[Double]("v_min").isNaN && r.getAs[Double]("v_max").isNaN)
  }

  test("streamingNearDups: LSH bucket state flags near-dups at ingest, TTL-bounded") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog while the cat " +
      "watches from the warm windowsill every single morning without fail"
    val near = base.replace("morning", "evening")
    val far = "completely different content about distributed query engines " +
      "and shuffle partitioning strategies at petabyte scale"
    val input = MemoryStream[(Timestamp, Long, String)]
    val pairs = graft.streaming.StreamingChecks.streamingNearDups(
      input.toDF().toDF("event_time", "doc_id", "text"),
      "event_time", "10 seconds", "doc_id", "text",
      threshold = 0.7, stateTtlMs = 60000L)
    val q = pairs.writeStream
      .format("memory").queryName("near_dups_stream").outputMode("update").start()
    input.addData(
      (ts("2026-01-01 00:00:01"), 1L, base),
      (ts("2026-01-01 00:00:02"), 2L, near),
      (ts("2026-01-01 00:00:03"), 3L, far))
    q.processAllAvailable()
    // cross-micro-batch: a near-dup of doc 1 arriving later still pairs
    input.addData((ts("2026-01-01 00:00:05"), 4L, base.replace("cat", "bird")))
    q.processAllAvailable()
    def found() = spark.table("near_dups_stream").select("id1", "id2")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val f1 = found()
    assert(f1.contains((1L, 2L)), s"near pair missed: $f1")
    assert(f1.exists(p => p._2 == 4L), s"cross-batch pair missed: $f1")
    assert(!f1.exists(p => p._1 == 3L || p._2 == 3L), s"unrelated doc paired: $f1")

    // advance the watermark far past the TTL (sentinel in a distinct
    // bucket family), then replay the base text: the old signatures are
    // evicted, so no pair forms with the fresh doc
    input.addData((ts("2026-01-01 02:00:00"), 99L,
      "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo nnn mmm lll kkk"))
    q.processAllAvailable()
    input.addData((ts("2026-01-01 02:00:01"), 5L, base))
    q.processAllAvailable()
    q.stop()
    val f2 = found()
    assert(!f2.exists(p => p._1 == 5L || p._2 == 5L),
      s"TTL-evicted state must not pair with a fresh arrival: $f2")
  }

  test("streamingEmbeddingNearDups: sign-bit bucket state flags cosine near-dups at ingest") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // 64-dim vectors matching the default hyperplane dim
    def vec(main: Int, bump: Double): Seq[Float] =
      (0 until 64).map(i => if (i == main) 1f else if (i == main + 1) bump.toFloat else 0f)
    val a     = vec(0, 0.05)  // base direction
    val aNear = vec(0, 0.10)  // cosine ~0.996 vs a
    val far   = vec(30, 0.0)  // orthogonal
    val input = MemoryStream[(Timestamp, Long, Seq[Float])]
    val pairs = graft.streaming.StreamingChecks.streamingEmbeddingNearDups(
      input.toDF().toDF("event_time", "vec_id", "embedding"),
      "event_time", "10 seconds", "vec_id", "embedding",
      threshold = 0.9, stateTtlMs = 60000L)
    val q = pairs.writeStream
      .format("memory").queryName("vec_dups_stream").outputMode("update").start()
    input.addData(
      (ts("2026-01-01 00:00:01"), 1L, a),
      (ts("2026-01-01 00:00:02"), 2L, aNear),
      (ts("2026-01-01 00:00:03"), 3L, far))
    q.processAllAvailable()
    // cross-micro-batch: a later near-dup of vec 1 still pairs
    input.addData((ts("2026-01-01 00:00:05"), 4L, vec(0, 0.08)))
    q.processAllAvailable()
    q.stop()
    val found = spark.table("vec_dups_stream")
      .select("id1", "id2", "cosine").distinct().collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val ids = found.map(_._1).toSet
    assert(ids.contains((1L, 2L)), s"near pair missed: $ids")
    assert(ids.exists(_._2 == 4L), s"cross-batch pair missed: $ids")
    assert(!ids.exists(p => p._1 == 3L || p._2 == 3L), s"orthogonal vec paired: $ids")
    // the emitted cosine is the EXACT similarity, not a banded estimate
    assert(found.forall { case (_, c) => c >= 0.9 && c <= 1.0 + 1e-9 })
  }

  test("streamingEmbeddingNearDups scores mismatched dims like batch cosineF (low, not inflated)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // a 16-dim prefix of a 64-dim vector: the shared prefix matches
    // perfectly, but 3/4 of the long vector's mass lies outside it — batch
    // cosineF (prefix dot / FULL norms) scores it 0.5, well under any
    // near-dup threshold; the old prefix-only norms scored it 1.0
    val long  = (0 until 64).map(_ => 0.5f)
    val short = (0 until 16).map(_ => 0.5f)
    val input = MemoryStream[(Timestamp, Long, Seq[Float])]
    val pairs = graft.streaming.StreamingChecks.streamingEmbeddingNearDups(
      input.toDF().toDF("event_time", "vec_id", "embedding"),
      "event_time", "10 seconds", "vec_id", "embedding",
      threshold = 0.9, stateTtlMs = 60000L)
    val q = pairs.writeStream
      .format("memory").queryName("vec_dims_stream").outputMode("update").start()
    input.addData(
      (ts("2026-01-01 00:00:01"), 1L, long),
      (ts("2026-01-01 00:00:02"), 2L, short))
    q.processAllAvailable()
    q.stop()
    val found = spark.table("vec_dims_stream").select("id1", "id2").collect()
    assert(found.isEmpty, s"dimension-mismatched pair must not reach 0.9: ${found.toSeq}")
    // and the exact score matches the batch kernel on the same inputs
    val batch = Seq((long, short)).toDF("a", "b")
      .select(graft.ops.Similarity.cosineF(col("a"), col("b")).as("c"))
      .head().getDouble(0)
    assert(math.abs(batch - 0.5) < 1e-9, s"batch cosineF on prefix pair: $batch")
  }

  test("corpus split/rate membership are stateless and run on streams") {
    // splitColumn / the weightedMix rate filter are pure row functions, so
    // they compose with any streaming source with no state and no
    // watermark — the ingest-time shape of split assignment and mix
    // sampling at 100 TB (tag on arrival, never re-shuffle)
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Long]
    val tagged = graft.ops.Corpus.assignSplits(
      input.toDF().toDF("doc_id"), "doc_id",
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    val query = tagged.writeStream
      .format("memory").queryName("split_stream").outputMode("append").start()
    input.addData(0L until 100L: _*)
    query.processAllAvailable()
    query.stop()
    val streamed = spark.table("split_stream")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // identical to the batch assignment (pure function of id)
    val batch = graft.ops.Corpus.assignSplits(
      spark.range(0, 100).select(col("id").as("doc_id")), "doc_id",
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamed == batch)
  }
}
