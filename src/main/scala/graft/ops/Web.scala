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

  /** Robots Exclusion Protocol rules (RFC 9309): parse one robots.txt per
    * domain into the rule set governing `agent`. Declarative group
    * parsing — lines explode with position, comments strip, directives
    * classify, a group starts at a `User-agent` line whose previous
    * RELEVANT line is not a `User-agent` line (RFC's "group of
    * user-agent lines followed by rules"), and rules attach to their
    * group. Group selection per the RFC: if any group names `agent`
    * exactly (case-insensitive), ALL such groups' rules apply and `*`
    * groups are ignored; otherwise the `*` groups apply. Empty-pattern
    * rules are dropped (an empty Disallow means no restriction).
    *
    * Emits one row per applicable rule: (`domainCol`, `rule_allow`,
    * `pattern`, `pattern_len`, `pattern_regex`) — the regex is the RFC
    * pattern compiled in-plan (`*` → `.*`, trailing `$` → end anchor,
    * every other metacharacter escaped), anchored at the path start, in
    * the Java∩RE2 portable subset.
    *
    * Scale shape: everything is per-domain; the only window partitions by
    * domain over a robots file's own lines (robots.txt is capped at 500 KB
    * by the RFC — per-key state is bounded by spec).
    */
  def robotsRules(
      robots: DataFrame,
      domainCol: String,
      robotsTextCol: String,
      agent: String = "*"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    val lines = robots
      .where(col(robotsTextCol).isNotNull)
      .select(
        col(domainCol),
        posexplode(split(col(robotsTextCol), "\n")).as(Seq("dj_pos", "dj_raw")))
      .withColumn("dj_line", trim(regexp_replace(col("dj_raw"), "#.*$", "")))
      .withColumn("dj_lc", lower(col("dj_line")))
      .withColumn("dj_is_ua", col("dj_lc").rlike("^user-agent[ \\t]*:"))
      .withColumn("dj_is_allow", col("dj_lc").rlike("^allow[ \\t]*:"))
      .withColumn("dj_is_dis", col("dj_lc").rlike("^disallow[ \\t]*:"))
      .where(col("dj_is_ua") || col("dj_is_allow") || col("dj_is_dis"))
      .withColumn("dj_value",
        trim(regexp_extract(col("dj_line"), "^[^:]*:[ \\t]*(.*)$", 1)))
    val w = Window.partitionBy(col(domainCol)).orderBy(col("dj_pos"))
    val grouped = lines
      .withColumn("dj_prev_ua",
        coalesce(lag(col("dj_is_ua"), 1).over(w), lit(false)))
      .withColumn("dj_start",
        (col("dj_is_ua") && !col("dj_prev_ua")).cast("int"))
      .withColumn("dj_group",
        sum(col("dj_start")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .where(col("dj_group") > 0) // rules before any User-agent line: ignored
    // per-group agent applicability; then per-domain exact-beats-star
    val groupAgents = grouped
      .where(col("dj_is_ua"))
      .groupBy(col(domainCol), col("dj_group"))
      .agg(
        max(when(lower(col("dj_value")) === agentLc, lit(1)).otherwise(lit(0)))
          .as("dj_exact"),
        max(when(col("dj_value") === "*", lit(1)).otherwise(lit(0)))
          .as("dj_star"))
    val domainHasExact = groupAgents
      .groupBy(col(domainCol))
      .agg(max(col("dj_exact")).as("dj_has_exact"))
    val applicable = groupAgents
      .join(domainHasExact, Seq(domainCol))
      .where(
        (col("dj_has_exact") === 1 && col("dj_exact") === 1) ||
          (col("dj_has_exact") === 0 && col("dj_star") === 1))
      .select(col(domainCol), col("dj_group"))
    val pat = col("dj_value")
    val endsAnchor = pat.rlike("[$]$")
    val body = when(endsAnchor, expr("substring(dj_value, 1, length(dj_value) - 1)"))
      .otherwise(pat)
    val escaped = regexp_replace(body, "([.\\[\\]{}()+?^$|\\\\])", "\\\\$1")
    val wild = regexp_replace(escaped, "[*]", ".*")
    grouped
      .where(col("dj_is_allow") || col("dj_is_dis"))
      .where(length(col("dj_value")) > 0)
      .join(applicable, Seq(domainCol, "dj_group"), "left_semi")
      .select(
        col(domainCol),
        col("dj_is_allow").as("rule_allow"),
        col("dj_value").as("pattern"),
        length(col("dj_value")).cast("long").as("pattern_len"),
        concat(lit("^"), wild, when(endsAnchor, lit("$")).otherwise(lit("")))
          .as("pattern_regex"))
      .distinct()
  }

  /** Evaluate [[robotsRules]] over a URL table: for each row of `urls`
    * (identified by `idCol`, with `domainCol` and a `pathCol` starting
    * with '/'), RFC 9309 precedence — among matching rules the LONGEST
    * pattern wins, Allow beats Disallow on equal length, and no matching
    * rule (or no robots entry for the domain) means allowed.
    *
    * Scale shape: one equi-join on domain (rules-per-domain is a small
    * spec-bounded constant, so join output is linear in the URL count; the
    * rules side broadcasts when small), one per-id regroup. Returns
    * (`idCol`, `domainCol`, `pathCol`, `allowed`, `matched_pattern`).
    */
  def robotsAllowed(
      urls: DataFrame,
      robots: DataFrame,
      idCol: String,
      urlDomainCol: String,
      pathCol: String,
      robotsDomainCol: String,
      robotsTextCol: String,
      agent: String = "*"): DataFrame = {
    val rules = robotsRules(robots, robotsDomainCol, robotsTextCol, agent)
      .withColumnRenamed(robotsDomainCol, "dj_rdomain")
    urls
      .join(rules, urls(urlDomainCol) === rules("dj_rdomain"), "left")
      .withColumn("dj_hit",
        col("pattern").isNotNull &&
          regexp_like(col(pathCol), col("pattern_regex")))
      .groupBy(col(idCol), col(urlDomainCol), col(pathCol))
      .agg(max(when(col("dj_hit"),
        struct(col("pattern_len"), col("rule_allow"), col("pattern"))))
        .as("dj_best"))
      .select(
        col(idCol), col(urlDomainCol), col(pathCol),
        coalesce(col("dj_best.rule_allow"), lit(true)).as("allowed"),
        col("dj_best.pattern").as("matched_pattern"))
  }

  /** PageRank over a link graph (Brin/Page 1998; the non-redistributing
    * simplified form — dangling mass is not recycled, matching the common
    * within-crawl authority-signal spelling): `iterations` rounds of
    * `pr'(v) = (1-d)/N + Σ_{(u,v)∈E} d · pr(u) / outdeg(u)` from the
    * uniform start. The domain-authority signal a crawl-curation pipeline
    * ranks sources with, next to [[domainStats]]' volume counts.
    *
    * Determinism contract: per-edge contributions are doubles computed
    * from the previous round's exact decimal rank (`(pr·d)/outdeg`), cast
    * to `DECIMAL(28,18)` BEFORE the per-target sum — decimal addition is
    * associative, so ranks are bit-identical across partitionings and
    * engines; every round re-casts to `DECIMAL(28,18)` at the same points
    * the oracle does. Multi-edges contribute once per edge row (outdeg
    * counts edge rows).
    *
    * Scale shape: per round, ONE join of the rank table with the edge
    * list on source (shuffle on src) + one per-target aggregate; rank and
    * degree tables are node-sized. Rounds are checkpoint-bounded (each
    * round's table is eagerly materialized and its predecessor released —
    * the connected-components loop discipline), so the plan never grows
    * with iteration count. Returns (`node`, `pagerank` DECIMAL(28,18)).
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 5,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 1 && iterations <= 100, s"bad iterations: $iterations")
    require(damping > 0 && damping < 1, s"damping must lie in (0,1): $damping")
    val dec = "decimal(28,18)"
    // DISTINCT edges with multiplicity (r15): k duplicate (src, dst) rows
    // contribute k identical decimal terms, and a k-fold decimal sum is
    // exactly term × k — so the per-iteration joins run over distinct
    // edges only. (28,18) × (9,0) stays at precision 38 — exact, no
    // precision-loss clamp (multiplicities ≥ 1e9 would overflow the cast
    // loudly under ANSI, far past any real graph's duplicate-edge count).
    val e = graft.core.Blocks.checkpoint(
      edges
        .where(col(srcCol).isNotNull && col(dstCol).isNotNull)
        .select(col(srcCol).as("dj_src"), col(dstCol).as("dj_dst"))
        .groupBy(col("dj_src"), col("dj_dst"))
        .agg(count(lit(1)).as("dj_w")))
    // lazy checkpoints (r15): the node count materializes `nodes`; the
    // first iteration's job materializes outdeg/pr — the eager form paid
    // a dedicated job per frame
    val nodes = graft.core.Blocks.checkpointLazy(
      e.select(col("dj_src").as("node"))
        .union(e.select(col("dj_dst")))
        .distinct())
    val n = nodes.count()
    if (n == 0) return nodes.withColumn("pagerank", lit(null).cast(dec))
    // out-degree counts edge ROWS (duplicates included) = Σ multiplicity
    val outdeg = graft.core.Blocks.checkpointLazy(
      e.groupBy(col("dj_src")).agg(sum(col("dj_w")).as("dj_deg")))
    val base = (1.0 - damping) / n
    var pr = graft.core.Blocks.checkpointLazy(
      nodes.withColumn("pagerank", lit(1.0 / n).cast(dec)))
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(pr, e("dj_src") === pr("node"))
        .join(outdeg, Seq("dj_src"))
        .select(
          col("dj_dst").as("node"),
          (((col("pagerank").cast("double") * damping) /
            col("dj_deg").cast("double")).cast(dec) *
            col("dj_w").cast("decimal(9,0)")).as("dj_term"))
        .groupBy(col("node"))
        .agg(sum(col("dj_term")).cast(dec).as("dj_contrib"))
      val next = graft.core.Blocks.checkpoint(
        nodes
          .join(contrib, Seq("node"), "left")
          .select(
            col("node"),
            (lit(base).cast(dec) +
              coalesce(col("dj_contrib"), lit(0).cast(dec)))
              .cast(dec).as("pagerank")))
      graft.core.Blocks.release(pr)
      pr = next
    }
    pr
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
