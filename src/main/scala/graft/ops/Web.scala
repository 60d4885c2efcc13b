package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-provenance operators for crawl-derived corpora: URL parsing,
  * canonical normalization (the dedup key crawl pipelines group by), and
  * registered-domain rollups. Everything is codegen'd `regexp_extract` /
  * higher-order-function column work — one projection over the corpus, no
  * UDFs — and every regex stays inside the Java∩RE2 common subset so the
  * DuckDB oracle evaluates the identical pattern.
  *
  * (Spark's built-in `parse_url` exists but is Hive-compatibility surface
  * with engine-specific corner cases; explicit regexes keep the semantics
  * portable and auditable.)
  */
object Web {

  /** Lowercased URL scheme ('' when the value isn't a URL). */
  def scheme(url: Column): Column =
    lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))

  private def hostPort(url: Column): Column =
    regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)

  /** Lowercased host without the port. */
  def host(url: Column): Column =
    lower(regexp_extract(hostPort(url), "^([^:]+)", 1))

  /** Explicit port digits, '' when absent. */
  def port(url: Column): Column =
    regexp_extract(hostPort(url), ":([0-9]+)$", 1)

  /** Path component (no query/fragment), '' when absent. */
  def path(url: Column): Column =
    regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)

  /** Query string without the '?', '' when absent. */
  def query(url: Column): Column = regexp_extract(url, "[?]([^#]*)", 1)

  /** Fragment without the '#', '' when absent. */
  def fragment(url: Column): Column = regexp_extract(url, "#(.*)$", 1)

  /** Registered domain ≈ the last two dot-labels of the host (the
    * public-suffix-list-free approximation — exact for generic TLDs, folds
    * co.uk-style hosts one level too far; a production deploy swaps in a
    * broadcast PSL lookup at this one expression).
    */
  def registeredDomain(url: Column): Column =
    regexp_extract(host(url), "([^.]+[.][^.]+)$", 1)

  /** Query string with tracking parameters (`utm_*`) and empty params
    * dropped, original order preserved; '' when nothing survives.
    */
  def cleanQuery(url: Column): Column =
    array_join(
      filter(
        split(query(url), "&"),
        p => p =!= "" && !p.startsWith("utm_")),
      "&")

  /** Canonical URL: lowercased scheme/host, default ports stripped
    * (80/http, 443/https), trailing path slashes trimmed (bare host →
    * '/'), tracking params dropped, fragment dropped. The grouping key for
    * URL-level dedup and per-site rollups.
    */
  def normalizeUrl(url: Column): Column = {
    val s = scheme(url)
    val h = host(url)
    val p0 = port(url)
    val keepPort = p0 =!= "" &&
      !(s === "http" && p0 === "80") && !(s === "https" && p0 === "443")
    val pth0 = regexp_replace(path(url), "/+$", "")
    val pth = when(pth0 === "", "/").otherwise(pth0)
    val q = cleanQuery(url)
    concat(
      s, lit("://"), h,
      when(keepPort, concat(lit(":"), p0)).otherwise(""),
      pth,
      when(q =!= "", concat(lit("?"), q)).otherwise(""))
  }

  /** Per-document provenance frame: parsed parts + canonical URL. */
  def urlProfile(df: DataFrame, urlCol: String): DataFrame = {
    val u = col(urlCol)
    df.withColumn("url_scheme", scheme(u))
      .withColumn("url_host", host(u))
      .withColumn("url_domain", registeredDomain(u))
      .withColumn("url_path", path(u))
      .withColumn("url_norm", normalizeUrl(u))
  }

  /** Registered-domain rollup: doc count, distinct hosts, and corpus share
    * per domain — the "is one site dominating the corpus" balance check
    * (one partial-agg shuffle; the total rides along via a window-free
    * cross join of the 1-row count).
    */
  /** HTML → text extraction (the step after WARC ingestion): drop
    * `<script>`/`<style>`/`<!-- -->` blocks wholesale, turn
    * block-level closers/br into newlines, strip the remaining tags,
    * decode the common entities, and collapse runs of blanks — the
    * regex-pipeline flavor of boilerplate-free extraction (what a crawl
    * pipeline runs corpus-wide BEFORE the quality/dedup operators; a DOM
    * parser is per-document tooling, not a 100 TB scan). Pure codegen'd
    * column expressions, one projection, no UDF; every regex is in the
    * Java∩RE2 portable subset so the DuckDB oracle applies the identical
    * chain.
    */
  def extractHtmlText(html: Column): Column = {
    // (?s) DOTALL for multi-line blocks; (?i) case-insensitive tags
    val noScript =
      regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val blockBreaks = regexp_replace(
      noComment,
      "(?i)</(p|div|h[1-6]|li|ul|ol|table|tr|blockquote|section|article)>|<br[^>]*>",
      "\n")
    val noTags = regexp_replace(blockBreaks, "<[^>]*>", " ")
    // entity names contain no regex metacharacters — the patterns stay
    // literal (and textually identical in the oracle's RE2 chain)
    val entities = Seq(
      "&nbsp;" -> " ", "&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    // collapse horizontal whitespace, then blank-line runs, then trim
    val squashed = regexp_replace(entities, "[ \\t\\x0B\\f\\r]+", " ")
    val lines = regexp_replace(squashed, " ?\\n ?", "\n")
    trim(regexp_replace(lines, "\\n{2,}", "\n"))
  }

  def domainStats(df: DataFrame, urlCol: String): DataFrame = {
    val parts = df
      .select(
        registeredDomain(col(urlCol)).as("url_domain"),
        host(col(urlCol)).as("url_host"))
    val agg = parts
      .groupBy("url_domain")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("url_host")).as("n_hosts"))
    val total = agg.agg(sum("n_docs").as("dj_total"))
    agg.crossJoin(broadcast(total))
      .withColumn("doc_share", col("n_docs").cast("double") / col("dj_total"))
      .drop("dj_total")
  }
}
