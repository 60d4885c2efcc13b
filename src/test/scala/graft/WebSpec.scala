package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Web

/** URL parsing/normalization edge cases beyond what the corpus-wide gate
  * query exercises: missing components, default vs explicit ports, utm-only
  * queries, and non-URL payloads degrading to empty parts.
  */
class WebSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def norm(urls: String*): Seq[String] = {
    val df = urls.toDF("url")
    df.select(Web.normalizeUrl(col("url"))).as[String].collect().toSeq
  }

  test("normalizeUrl canonical forms") {
    assert(norm("HTTPS://Example.COM/") === Seq("https://example.com/"))
    assert(norm("https://example.com:443/a/") === Seq("https://example.com/a"))
    assert(norm("http://example.com:80/a") === Seq("http://example.com/a"))
    // non-default port survives; https on 80 is explicit, kept
    assert(norm("http://example.com:8080/a") === Seq("http://example.com:8080/a"))
    assert(norm("https://example.com:80/a") === Seq("https://example.com:80/a"))
    // bare host → root path; fragment dropped
    assert(norm("https://example.com#top") === Seq("https://example.com/"))
    // tracking params dropped, order preserved, empty query omitted
    assert(norm("https://e.com/p?utm_source=x&a=1&utm_b=2&b=2")
      === Seq("https://e.com/p?a=1&b=2"))
    assert(norm("https://e.com/p?utm_source=x") === Seq("https://e.com/p"))
  }

  test("parts of a URL with everything present") {
    val df = Seq("HTTP://User.Site.co:8080/x/y?a=1#f").toDF("url")
    val r = df.select(
      Web.scheme(col("url")), Web.host(col("url")), Web.port(col("url")),
      Web.path(col("url")), Web.query(col("url")), Web.fragment(col("url")),
      Web.registeredDomain(col("url"))).head()
    assert(r.getString(0) === "http")
    assert(r.getString(1) === "user.site.co")
    assert(r.getString(2) === "8080")
    assert(r.getString(3) === "/x/y")
    assert(r.getString(4) === "a=1")
    assert(r.getString(5) === "f")
    assert(r.getString(6) === "site.co")
  }

  test("non-URL and single-label hosts degrade to empty parts") {
    val df = Seq("not a url", "https://localhost/x").toDF("url")
    val r = df.select(Web.scheme(col("url")), Web.host(col("url")),
      Web.registeredDomain(col("url"))).collect()
    assert(r(0).getString(0) === "" && r(0).getString(1) === "")
    assert(r(1).getString(1) === "localhost")
    assert(r(1).getString(2) === "", "no dot → no registered domain")
  }

  test("domainStats shares sum to 1 and count hosts distinctly") {
    val df = Seq(
      "https://a.x.org/1", "https://b.x.org/2", "https://a.x.org/3",
      "https://y.net/4").toDF("url")
    val rows = Web.domainStats(df, "url")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows("x.org") === ((3L, 2L, 0.75)))
    assert(rows("y.net") === ((1L, 1L, 0.25)))
  }

  test("extractHtmlText strips scripts/styles/tags, decodes entities, keeps block structure") {
    import spark.implicits._
    import graft.ops.Web
    val html = """<html><head><title>T</title>
      |<style>p { color: red; }</style>
      |<script>if (a<b) { alert("x</p>"); }</script></head>
      |<body><h1>Big Title</h1>
      |<p>First &amp; foremost &lt;tag&gt; &quot;quoted&quot; &#39;q&#39;&nbsp;end</p>
      |<div>Second   block</div><!-- hidden comment -->
      |line<br/>break</body></html>""".stripMargin
    val out = Seq(html).toDF("h")
      .select(Web.extractHtmlText(col("h")).as("t")).head().getString(0)
    assert(!out.contains("color"))
    assert(!out.contains("alert"))
    assert(!out.contains("hidden"))
    // no markup survives (decoded &lt;tag&gt; content legitimately
    // reintroduces a literal '<tag>')
    assert(!out.contains("</") && !out.contains("<body") && !out.contains("<p>"))
    assert(out.contains("Big Title"))
    assert(out.contains("First & foremost <tag> \"quoted\" 'q' end"))
    assert(out.contains("Second block"))
    assert(out.contains("line\nbreak"))
    // block closers become single newlines; no blank-line runs survive
    assert(!out.contains("\n\n"))
    // empty / tag-only input extracts to empty
    val empty = Seq("<html><body><script>x()</script></body></html>").toDF("h")
      .select(Web.extractHtmlText(col("h"))).head().getString(0)
    assert(empty == "")
  }

  private val robotsTxt =
    """# corpus crawl policy
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/ok
      |Disallow: /tmp*.log$
      |Disallow:
      |
      |User-agent: GraftBot
      |User-agent: otherbot
      |Disallow: /bot-only/
      |""".stripMargin

  test("robotsRules: group structure, agent selection, pattern compilation") {
    val robots = Seq(("example.com", robotsTxt)).toDF("domain", "robots")
    val star = Web.robotsRules(robots, "domain", "robots", agent = "somebody")
      .collect().map(r => (r.getString(2), r.getBoolean(1))).toSet
    // '*' group only; the empty Disallow is dropped
    assert(star === Set(
      ("/private/", false), ("/private/ok", true), ("/tmp*.log$", false)))
    // exact agent (case-insensitive, shared group via stacked ua lines)
    // suppresses the '*' group entirely
    val bot = Web.robotsRules(robots, "domain", "robots", agent = "graftbot")
      .collect().map(r => (r.getString(2), r.getBoolean(1))).toSet
    assert(bot === Set(("/bot-only/", false)))
    // compiled regexes: '*' -> '.*', trailing '$' anchors, '.' escaped
    val rx = Web.robotsRules(robots, "domain", "robots", "x")
      .collect().map(r => r.getString(2) -> r.getString(4)).toMap
    assert(rx("/tmp*.log$") === "^/tmp.*\\.log$")
  }

  test("pageRank: fixed point, authority ordering, mass conservation, determinism") {
    // symmetric 2-cycle is a fixed point at 0.5 each
    val cyc = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val c = Web.pageRank(cyc, "src", "dst", iterations = 3)
      .collect().map(r => r.getString(0) -> r.getDecimal(1).doubleValue()).toMap
    assert(math.abs(c("a") - 0.5) < 1e-15 && math.abs(c("b") - 0.5) < 1e-15)
    // star + backlinks: the hub out-ranks every leaf; no dangling nodes ->
    // total mass stays 1
    val star = Seq(("l1", "hub"), ("l2", "hub"), ("l3", "hub"),
      ("hub", "l1"), ("hub", "l2"), ("hub", "l3")).toDF("src", "dst")
    val s = Web.pageRank(star, "src", "dst", iterations = 8)
      .collect().map(r => r.getString(0) -> r.getDecimal(1).doubleValue()).toMap
    assert(s("hub") > s("l1") * 2, s"hub must dominate: $s")
    assert(math.abs(s.values.sum - 1.0) < 1e-12, s"mass: ${s.values.sum}")
    // partitioning independence: bit-identical decimals
    val p1 = Web.pageRank(star.repartition(7), "src", "dst", iterations = 8)
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val p2 = Web.pageRank(star.coalesce(1), "src", "dst", iterations = 8)
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(p1 === p2)
    // dangling sink leaks mass (documented non-redistributing form)
    val dang = Seq(("a", "sink"), ("b", "sink"), ("a", "b")).toDF("src", "dst")
    val d = Web.pageRank(dang, "src", "dst", iterations = 5)
      .collect().map(r => r.getString(0) -> r.getDecimal(1).doubleValue()).toMap
    assert(d.values.sum < 1.0)
    assert(d("sink") > d("b"))
    graft.core.Blocks.releaseAll()
  }

  test("robotsAllowed: longest match wins, allow breaks ties, default allow") {
    val robots = Seq(("example.com", robotsTxt)).toDF("domain", "robots")
    val urls = Seq(
      (1L, "example.com", "/private/secret"),
      (2L, "example.com", "/private/ok/page"),
      (3L, "example.com", "/public/x"),
      (4L, "example.com", "/tmp123.log"),
      (5L, "example.com", "/tmp123.logs"), // '$' anchor must reject
      (6L, "other.org", "/private/secret") // no robots -> allowed
    ).toDF("id", "domain", "path")
    val out = Web
      .robotsAllowed(urls, robots, "id", "domain", "path",
        "domain", "robots", agent = "*")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out === Map(
      1L -> false, 2L -> true, 3L -> true, 4L -> false, 5L -> true, 6L -> true))
  }
}
