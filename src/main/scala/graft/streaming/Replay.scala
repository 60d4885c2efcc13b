package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Shared file-stream replay for the five `q_streaming_*` gates.
  *
  * Each gate replays the same parquet tables as a real file stream
  * (AvailableNow + memory sink). Run serially — one stream per gate call —
  * the five replays paid the fixed micro-batch setup (source listing,
  * offset log, per-query codegen) five times over: at sf0.1 the replay
  * overhead dominated the data cost (`q_streaming_sessions` alone read
  * 8.1 s, the most expensive "query" in the r11 primary leg). Here all
  * five streaming queries START CONCURRENTLY in one replay pass and are
  * awaited together, so a session pays max-of-five once; later gate calls
  * in the same (session, dir) reuse the finished memory-sink views — the
  * views are deterministic snapshots of a bounded replay, so reuse cannot
  * change any gate output.
  *
  * At 100 TB the analogous posture is one long-lived streaming job feeding
  * many monitors, not one job per monitor.
  */
object Replay {

  val SessionsView = "graft_stream_sessions"
  val CmsView = "graft_stream_cms"
  val HistogramView = "graft_stream_hist"
  val HllView = "graft_stream_hll"
  val DedupView = "graft_stream_dedup"

  private val AllViews =
    Seq(SessionsView, CmsView, HistogramView, HllView, DedupView)

  /** (session identity, data dir, content stamp) the current views were
    * built from. A recycled session, a different leg, or REGENERATED data
    * under the same dir (file count/bytes/mtime of the streamed tables
    * change — the autoPoolFactorCached stamp pattern) invalidates the
    * memo; the replay then re-runs from scratch (fresh-session bench
    * reruns therefore re-pay — and re-measure — the true replay cost).
    */
  private var validFor: Option[(SparkSession, String, String)] = None

  /** Cheap content stamp of the tables the replay streams: per-table file
    * count, total bytes, and max mtime. In-place regeneration of a leg's
    * parquet within one session must not serve stale memory-sink views.
    */
  private def contentStamp(dir: String): String = {
    def stat(table: String): String = {
      var n = 0L; var bytes = 0L; var mtime = 0L
      def walk(f: java.io.File): Unit =
        if (f.isDirectory) {
          val kids = f.listFiles(); if (kids != null) kids.foreach(walk)
        } else {
          n += 1; bytes += f.length(); mtime = math.max(mtime, f.lastModified())
        }
      walk(new java.io.File(s"$dir/$table.parquet"))
      s"$table=$n:$bytes:$mtime"
    }
    Seq("events", "documents").map(stat).mkString(";")
  }

  /** Watermarks accept TIMESTAMP only — normalize the NTZ parquet read
    * (and the long-micros flavor) identically on the stream and on any
    * batch recomputation, so session bounds compare like for like.
    */
  def normTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType =>
      df.withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
    case org.apache.spark.sql.types.TimestampNTZType =>
      df.withColumn("ts", col("ts").cast("timestamp"))
    case _ => df
  }

  /** Ensure the five replay views exist in `s` for `dir`, running the
    * shared concurrent replay if this (session, dir) hasn't yet.
    */
  def ensure(s: SparkSession, dir: String): Unit = synchronized {
    val stamp = contentStamp(dir)
    if (!validFor.exists { case (ss, d, st) => (ss eq s) && d == dir && st == stamp }) {
      AllViews.foreach(v => s.catalog.dropTempView(v): Unit)
      def pq(table: String) = s"$dir/$table.parquet"
      // the file-stream source lists DIRECTORIES — stream the data dir
      // with a glob pinned to one table
      def stream(table: String): DataFrame = s.readStream
        .schema(s.read.parquet(pq(table)).schema)
        .option("pathGlobFilter", s"$table.parquet")
        .parquet(dir)
      val events = () => normTs(stream("events"))
      val docTokens = () => stream("documents")
        .where(col("text").isNotNull)
        .select(explode(graft.ops.TextAnalysis.tokens(col("text"))).as("tok"))
      def start(df: DataFrame, view: String, mode: OutputMode) = df
        .writeStream
        .format("memory")
        .queryName(view)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      val queries = Seq(
        start(
          StreamingChecks.streamingSessionProfile(
            events(), "user_id", "ts", "2 hours", "1 hour", "value"),
          SessionsView, OutputMode.Append),
        start(
          StreamingChecks.streamingCmsSketch(docTokens(), "tok", depth = 4, width = 64),
          CmsView, OutputMode.Complete),
        start(
          StreamingChecks.streamingHistogram(
            events(), "value", lo = 0.0, hi = 500.0, nBuckets = 20),
          HistogramView, OutputMode.Complete),
        start(
          StreamingChecks.streamingHllSketch(docTokens(), "tok", b = 6),
          HllView, OutputMode.Complete),
        start(
          StreamingChecks
            .streamingDedup(events(), "ts", "2 hours", Seq("user_id", "event_type"))
            .select(col("user_id"), col("event_type")),
          DedupView, OutputMode.Append))
      // a failed stream must invalidate the whole memo (some views may be
      // missing/partial) and surface as the calling gate's error
      try queries.foreach(_.awaitTermination())
      catch {
        case e: Throwable =>
          queries.foreach(q => try q.stop() catch { case _: Throwable => })
          validFor = None
          throw e
      }
      validFor = Some((s, dir, stamp))
    }
  }
}
