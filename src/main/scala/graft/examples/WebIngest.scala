package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{TextAnalysis, Warc, Web}
import graft.ops.Warc.WarcRecord

/** Web-crawl ingestion example: the front half of a pretraining pipeline —
  * `.warc.gz` blobs → WARC records → HTTP response payloads → HTML→text
  * extraction → per-document quality/language/script signals — everything
  * [[CorpusPipeline]] consumes. The crawl here is SYNTHESIZED from the
  * driver's `documents` table (each doc wrapped in HTML inside a gzip'd
  * 2-record WARC blob), so the example runs hermetically; point the parse
  * stage at real crawl bytes and nothing else changes.
  *
  * Run: `sbt "runMain graft.examples.WebIngest [sfDir]"`
  */
object WebIngest {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 0. synthesize the crawl: one .warc.gz blob per document
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("t"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        "doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField(
        "blob", org.apache.spark.sql.types.BinaryType)))
    val crawl = spark.createDataFrame(
      docs.rdd.map { r =>
        val id = r.getLong(0)
        val body =
          s"<html><head><script>track();</script></head><body><h1>Doc $id</h1>" +
            s"<p>${r.getString(1).replace("&", "&amp;").replace("<", "&lt;")}</p>" +
            "</body></html>"
        val recs = Seq(
          WarcRecord("request",
            Seq("WARC-Target-URI" -> s"http://site-${id % 37}.example/p/$id"),
            Array.emptyByteArray),
          WarcRecord("response",
            Seq("WARC-Target-URI" -> s"http://site-${id % 37}.example/p/$id"),
            body.getBytes("UTF-8")))
        org.apache.spark.sql.Row(id, Warc.encodeWarc(recs, gzip = true))
      }, schema)

    // 1. parse WARC, keep response records, decode payload bytes as text
    val responses = Warc.parseWarcRecords(crawl, "doc_id", "blob")
      .where(col("warc_type") === "response" && col("warc_valid"))
      .select(col("doc_id"), col("payload").cast("string").as("html"))
    val nResponses = responses.count()

    // 2. HTML → text, then the standard per-document signals
    val extracted = responses
      .select(col("doc_id"), Web.extractHtmlText(col("html")).as("text"))
    val profiled = TextAnalysis.analyze(extracted, "text")
      .join(TextAnalysis.scriptMix(extracted, "text")
        .select("doc_id", "latin_frac"), "doc_id")
    val kept = profiled
      .where(col("quality_score") >= 0.3 && col("latin_frac") >= 0.9)
    val nKept = kept.count()

    println(s"[ingest] blobs=${crawl.count()} responses=$nResponses " +
      s"kept=$nKept")
    require(nResponses > 0 && nKept > 0, "ingestion must produce documents")
    spark.stop()
  }
}
