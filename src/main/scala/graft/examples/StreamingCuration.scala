package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.requirements.WithinRequirement
import graft.streaming.StreamingChecks

/** Ingest-time curation example over a FILE stream — the streaming
  * counterpart of `CorpusPipeline`: documents arrive as files in a drop
  * directory and every micro-batch is simultaneously
  *
  *   1. constraint-checked (`foreachBatchRunner`: each micro-batch is a
  *      plain DataFrame, so any `WithinRequirement` from the batch library
  *      applies unchanged — here null-fraction, varchar length, and row
  *      count), and
  *   2. near-dup-screened AT INGEST (`streamingNearDups`: the batch
  *      MinHash+LSH kernels keyed into `flatMapGroupsWithState` per
  *      (band, bucket) — a new arrival pairs against everything inside the
  *      watermark TTL, state bounded by rate x TTL, never corpus size).
  *
  * The demo stages the driver's `documents` table into timestamped JSON
  * chunk files (one micro-batch each via maxFilesPerTrigger) with a planted
  * near-duplicate in a later chunk, then runs both sinks to completion.
  *
  * Run: `sbt "runMain graft.examples.StreamingCuration [sfDir]"`
  */
object StreamingCuration {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // --- stage the corpus as a drop directory of timestamped JSON chunks ---
    val dropDir = java.nio.file.Files.createTempDirectory("graft_stream_drop").toString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("text").isNotNull)
      .select(
        col("doc_id"),
        col("text"),
        // deterministic arrival times, one second apart per chunk
        (lit("2026-01-01 00:00:00").cast("timestamp") +
          expr("make_interval(0, 0, 0, 0, 0, 0, doc_id % 4)")).as("event_time"))
    docs.withColumn("chunk", col("doc_id") % 4)
      .repartition(1)
      .write.partitionBy("chunk").mode("overwrite").json(dropDir)
    // plant a near-duplicate of an early doc into the LAST chunk: the pair
    // must be caught ACROSS micro-batches via LSH bucket state
    val seed = docs.orderBy("doc_id").select("text").head().getString(0)
    val planted = Seq(
      s"""{"doc_id": 900001, "text": ${jsonStr(seed + " trailing edit")}, "event_time": "2026-01-01 00:00:03.500"}""")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dropDir/chunk=3/planted.json"),
      String.join("\n", planted: _*).getBytes("UTF-8"))

    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("event_time", TimestampType)))
    def fileStream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1") // one chunk = one micro-batch
      .json(dropDir)

    // --- sink 1: per-micro-batch constraint evaluation -------------------
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Boolean)]
    val checks = StreamingChecks.foreachBatchRunner(
      fileStream,
      batch => {
        val req = WithinRequirement.fromDataFrame(batch, "ingest_batch")
        req.addMaxNullFractionConstraint("text", 0.0)
        req.addVarcharMinLengthConstraint("text", 1)
        req.addNRowsMinConstraint(1)
        req
      },
      (batchId, rs) =>
        results.synchronized {
          rs.foreach(r => results += ((batchId, r.constraintDescription, r.outcome)))
        })
      .trigger(Trigger.AvailableNow())
      .start()

    // --- sink 2: near-dup detection at ingest -----------------------------
    val dups = StreamingChecks.streamingNearDups(
      fileStream,
      "event_time", watermark = "10 minutes", "doc_id", "text",
      threshold = 0.7, stateTtlMs = 3600000L)
    val dupQuery = dups.writeStream
      .format("memory").queryName("ingest_near_dups").outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()

    // --- sink 3: distribution monitoring -----------------------------------
    // a live text-length histogram (bounded state: <= nBuckets rows,
    // complete mode) whose snapshot feeds Drift.psiFromHistograms against
    // the reference corpus — "is today's feed distributed like the
    // reference", continuously, without ever re-scanning raw history
    val histQuery = StreamingChecks.streamingHistogram(
      fileStream.select(length(col("text")).cast("double").as("len")),
      "len", lo = 0.0, hi = 2000.0, nBuckets = 20)
      .writeStream
      .format("memory").queryName("ingest_len_hist").outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()

    checks.awaitTermination()
    dupQuery.awaitTermination()
    histQuery.awaitTermination()

    // monitoring verdicts off the live snapshot: PSI vs the reference
    // histogram, and the one-call drift report on the ingested columns
    val refHist = graft.ops.Stats.histogram(
      docs.select(length(col("text")).cast("double").as("len")),
      "len", 0.0, 2000.0, 20)
    val psiRow = graft.ops.Drift.psiFromHistograms(
      spark.table("ingest_len_hist"), refHist, 20).head()
    println(f"[stream] ingest-vs-reference length PSI=${psiRow.getDouble(2)}%.4f " +
      s"(n_stream=${psiRow.getLong(0)}, n_ref=${psiRow.getLong(1)})")
    val report = graft.ops.Drift.driftReport(
      spark.read.schema(schema).json(dropDir)
        .select(col("doc_id"), length(col("text")).cast("double").as("len")),
      docs.select(col("doc_id"), length(col("text")).cast("double").as("len")),
      numericCols = Seq("len"))
      .collect()
    report.foreach(r =>
      println(s"[stream] driftReport ${r.getString(0)}: ks_d=${r.get(4)} w1=${r.get(5)}"))
    // the planted near-dup is one extra doc: the feed matches the reference
    require(psiRow.getDouble(2) < 0.1,
      s"ingest length distribution drifted: psi=${psiRow.getDouble(2)}")

    val pairs = spark.table("ingest_near_dups")
      .select("id1", "id2").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val failed = results.filterNot(_._3)
    println(s"[stream] constraint evaluations=${results.size} " +
      s"failed=${failed.size} near_dup_pairs=${pairs.length}")
    results.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (b, rs) =>
      println(s"[stream] batch $b: ${rs.count(_._3)}/${rs.size} constraints pass")
    }
    require(results.nonEmpty, "constraints must have run on micro-batches")
    require(failed.isEmpty, s"ingest constraints failed: $failed")
    require(pairs.exists(_._2 == 900001L),
      s"planted cross-batch near-dup must be flagged at ingest, got ${pairs.toSeq}")
    println(s"[stream] planted near-dup flagged: " +
      pairs.filter(_._2 == 900001L).mkString(", "))
    spark.stop()
  }

  private def jsonStr(s: String): String = graft.core.JsonEscape.string(s)
}
