package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Layout, TextAnalysis, Warc, Web}
import graft.ops.Warc.WarcRecord

/** Web-crawl ingestion example: the front half of a pretraining pipeline —
  * `.warc.gz` FILES → `spark.read.format("warc")` → robots.txt policy
  * filter → HTML→text extraction → quality/language/script/entropy
  * signals → eval-set substring decontamination → domain authority
  * (PageRank) → Z-ordered corpus write. The crawl is SYNTHESIZED from the
  * driver's `documents` table (each doc wrapped in HTML inside a 2-record
  * WARC; partition-concatenated gzip members land as real `.warc.gz`
  * files), so the example runs hermetically; point stage 1 at real crawl
  * files and nothing else changes.
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

    // 0. synthesize the crawl: HTML-wrapped docs, one request+response
    //    pair per doc, written as REAL .warc.gz files (one per partition —
    //    concatenated gzip members, the standard layout)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("t"))
    val crawlDir = java.nio.file.Files.createTempDirectory("graft_crawl")
    // closures ship to executors: capture the path as a String (Path holds
    // a non-serializable filesystem reference)
    val crawlPath = crawlDir.toString
    docs.rdd.mapPartitionsWithIndex { (idx, rows) =>
      val recs = rows.flatMap { r =>
        val id = r.getLong(0)
        val body =
          s"<html><head><script>track();</script></head><body><h1>Doc $id</h1>" +
            s"<p>${r.getString(1).replace("&", "&amp;").replace("<", "&lt;")}</p>" +
            "</body></html>"
        Seq(
          WarcRecord("request",
            Seq("WARC-Target-URI" -> s"http://site-${id % 37}.example/p/$id"),
            Array.emptyByteArray),
          WarcRecord("response",
            Seq("WARC-Target-URI" -> s"http://site-${id % 37}.example/p/$id"),
            body.getBytes("UTF-8")))
      }.toSeq
      if (recs.nonEmpty)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(crawlPath, f"part-$idx%05d.warc.gz"),
          Warc.encodeWarc(recs, gzip = true))
      Iterator.single(recs.size)
    }.count()

    // 1. the WARC connector: records as a table, one partition per file
    val records = spark.read.format("warc").load(crawlDir.toString)
    val responses = records
      .where(col("warc_type") === "response" && col("warc_valid"))
      .select(
        col("target_uri"),
        Web.host(col("target_uri")).as("site"),
        Web.path(col("target_uri")).as("url_path"),
        regexp_extract(col("target_uri"), "/p/([0-9]+)$", 1)
          .cast("long").as("doc_id"),
        col("payload").cast("string").as("html"))
    val nResponses = responses.count()

    // 2. robots.txt policy: every 5th site disallows /p/ for everyone —
    //    REAL group parsing + longest-match evaluation drops its pages
    val robots = spark.range(0, 37)
      .select(
        concat(lit("site-"), col("id"), lit(".example")).as("site"),
        when(col("id") % 5 === 0,
          lit("User-agent: *\nDisallow: /p/\n"))
          .otherwise(lit("User-agent: *\nDisallow: /private/\n"))
          .as("robots"))
    val allowed = Web
      .robotsAllowed(responses, robots, "doc_id", "site", "url_path",
        "site", "robots", agent = "graftbot")
      .where(col("allowed"))
      .join(responses.select("doc_id", "html"), Seq("doc_id"))
    val nAllowed = allowed.count()

    // 3. HTML → text + per-document signals (quality, script mix,
    //    character entropy)
    val extracted = allowed
      .select(col("doc_id"), Web.extractHtmlText(col("html")).as("text"))
    val profiled = TextAnalysis.analyze(extracted, "text")
      .join(TextAnalysis.scriptMix(extracted, "text")
        .select("doc_id", "latin_frac"), "doc_id")
      .join(
        extracted.select(col("doc_id"),
          TextAnalysis.charProfile(col("text")).as("cp")),
        "doc_id")
      .where(col("cp").isNotNull)
      .withColumn("entropy", col("cp.entropy"))
    val kept = profiled
      .where(col("quality_score") >= 0.3 && col("latin_frac") >= 0.9 &&
        col("entropy") >= 1.5)
    val nKept = kept.count()

    // 4. eval-set substring decontamination: winnowing-fingerprint
    //    containment vs the held-out slice (doc_id % 97 == 0)
    val evalSet = extracted.where(col("doc_id") % 97 === 0)
    val contaminated = Dedup
      .winnowContamination(
        extracted.join(kept.select("doc_id"), Seq("doc_id"), "left_semi"),
        evalSet, "text", "doc_id", k = 8, w = 4, minContainment = 0.8)
      .where(col("flagged"))
      .select(col("doc_id"))
    val clean = kept.join(contaminated, Seq("doc_id"), "left_anti")
    val nClean = clean.count()

    // 5. domain authority: PageRank over the synthesized site link graph
    //    (site i links to sites (3i+1)%37 and (5i+2)%37)
    val links = spark.range(0, 37).select(
      concat(lit("site-"), col("id"), lit(".example")).as("src"),
      explode(array(
        concat(lit("site-"), (col("id") * 3 + 1) % 37, lit(".example")),
        concat(lit("site-"), (col("id") * 5 + 2) % 37, lit(".example"))))
        .as("dst"))
    val authority = Web.pageRank(links, "src", "dst", iterations = 8)
      .select(col("node").as("site"), col("pagerank").cast("double").as("authority"))
    val ranked = clean
      .withColumn("site",
        concat(lit("site-"), col("doc_id") % 37, lit(".example")))
      .join(broadcast(authority), Seq("site"), "left")

    // 6. Z-ordered corpus write: cluster by (site hash, document length)
    //    so both per-site and per-length scans prune files
    val outDir = java.nio.file.Files.createTempDirectory("graft_corpus")
    val toWrite = ranked
      .withColumn("site_bucket", pmod(xxhash64(col("site")), lit(64)))
      .select("doc_id", "site", "site_bucket", "n_tokens", "authority")
    Layout.writeZOrdered(
      toWrite, Seq("site_bucket", "n_tokens"), outDir.toString,
      numFiles = 4, bits = 6)
    val written = spark.read.parquet(outDir.toString).count()

    println(s"[ingest] responses=$nResponses allowed=$nAllowed kept=$nKept " +
      s"clean=$nClean written=$written")
    require(nResponses > 0 && nAllowed < nResponses,
      "robots must drop the disallowing sites")
    require(nKept > 0 && nClean <= nKept && written == nClean,
      "pipeline must produce a written corpus")
    spark.stop()
  }
}
