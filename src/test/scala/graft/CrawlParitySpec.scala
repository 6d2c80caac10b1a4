package graft

import graft.functions.{Html, UrlFunctions => U}
import graft.operators.Crawl
import org.scalatest.funsuite.AnyFunSuite

/** Parity tests for the reference's URL/HTML/robots scalar surface —
  * fixture values hand-derived from the C++ semantics (including its
  * quirks, which we replicate deliberately). */
class CrawlParitySpec extends AnyFunSuite {

  test("normalize_url: scheme fixup, lowercase, fragment, collapse quirk") {
    // the // collapse has no scheme exception → single slash after scheme
    assert(U.normalizeUrl("HTTP://Example.com/A//B") == "http:/example.com/a/b")
    // idempotent thanks to the http:/ fixup at entry
    assert(U.normalizeUrl("http:/example.com/a/b") == "http:/example.com/a/b")
    // schemeless → prepend http://
    assert(U.normalizeUrl("example.com/x") == "http:/example.com/x")
    // fragment stripped
    assert(U.normalizeUrl("http://a.com/p#frag") == "http:/a.com/p")
    // root trailing slash popped (only slash from index 8)
    assert(U.normalizeUrl("http://a.com/") == "http:/a.com")
    // deeper trailing slash kept (two slashes from index 8)
    assert(U.normalizeUrl("http://a.com/x/") == "http:/a.com/x/")
    // index file stripped, slash restored
    assert(U.normalizeUrl("http://a.com/index.html") == "http:/a.com/")
    assert(U.normalizeUrl("http://a.com/sub/index.php") == "http:/a.com/sub/")
    assert(U.normalizeUrl("http://a.com/default.html") == "http:/a.com/")
    // https variant of the single-slash fixup
    assert(U.normalizeUrl("https:/b.org/x") == "https:/b.org/x")
  }

  test("make_absolute_url: absolute, scheme-relative, root-relative quirk, sibling") {
    assert(U.makeAbsoluteUrl("http://a.com/x/y.html", "http://B.com/Z") == "http:/b.com/z")
    assert(U.makeAbsoluteUrl("https://a.com/x", "//cdn.com/f.js") == "https:/cdn.com/f.js")
    // sibling resolution into the base directory
    assert(U.makeAbsoluteUrl("http://a.com/dir/page.html", "other.html")
      == "http:/a.com/dir/other.html")
    // root-relative hits the reference quirk: the normalized base has a
    // single-slash scheme, "://" is not found, so the path is APPENDED
    assert(U.makeAbsoluteUrl("http://a.com/dir/page.html", "/root.html")
      == "http:/a.com/dir/page.html/root.html")
  }

  test("extract_domain / is_same_domain") {
    assert(U.extractDomain("http://www.Example.com:8080/x") == "Example.com")
    assert(U.extractDomain("http:/foo.bar.com/x") == "foo.bar.com")
    assert(U.extractDomain("") == "")
    assert(U.isSameDomain("http://sub.a.com/x", "a.com"))
    assert(U.isSameDomain("http://a.com/x", "a.com"))
    assert(!U.isSameDomain("http://notacom.com/x", "a.com"))
    assert(!U.isSameDomain("http://xa.com/x", "a.com")) // dot boundary required
  }

  test("url_contains_keyword: word boundaries are !isalnum") {
    assert(U.urlContainsKeyword("http://a.com/about/x", "about"))
    assert(U.urlContainsKeyword("http://a.com/x-about", "about"))
    assert(!U.urlContainsKeyword("http://a.com/aboutus", "about"))
    assert(!U.urlContainsKeyword("http://a.com/1about2", "about"))
    assert(U.urlContainsKeyword("http://ABOUT.com", "about"))
  }

  test("priority: keyword product, root bonus, depth, .org-first domain score") {
    // plain page, depth 0: kw 1.0 + depth 2.0 + domain 1.0
    assert(U.priority("http://a.com/page", 0) == 1.0 + 2.0 + 1.0)
    // root URL bonus ×1.5
    assert(U.priority("http://a.com", 0) == 1.5 + 2.0 + 1.0)
    // about keyword ×1.5 (not root: path present)
    assert(U.priority("http://a.com/about", 0) == 1.5 + 2.0 + 1.0)
    // .org checked before .gov → 1.2 even though .gov appears
    assert(U.domainScore("http://x.org.gov/a") == 1.2)
    assert(U.domainScore("http://x.gov/a") == 1.4)
    // depth floor
    assert(U.depthScore(100) == 0.1)
    assert(U.depthScore(1) == 1.0)
  }

  test("robots: parse, glob matching, allow-first precedence") {
    val rules = U.parseRobots(
      """User-agent: *
        |Disallow: /private/ # comment
        |Allow: /private/ok.html
        |Crawl-delay: 2
        |
        |User-agent: special
        |Disallow: /*.pdf
        |""".stripMargin)
    assert(rules("*").disallow == Seq("/private/"))
    assert(rules("*").allow == Seq("/private/ok.html"))
    assert(rules("*").crawlDelay == 2)
    // allow wins before disallow
    assert(U.isAllowed(rules, "*", "http://a.com/private/ok.html"))
    assert(!U.isAllowed(rules, "*", "http://a.com/private/no.html"))
    assert(U.isAllowed(rules, "*", "http://a.com/public"))
    // agent-specific rules take precedence over *
    assert(!U.isAllowed(rules, "special", "http://a.com/docs/x.pdf"))
    assert(U.isAllowed(rules, "special", "http://a.com/private/no.html"))
    // glob semantics
    assert(U.matchesPattern("/a/b.pdf", "/*.pdf"))
    assert(!U.matchesPattern("/a/b.pdfx", "/*.pdf")) // trailing x unmatched
    assert(U.matchesPattern("/a/b.pdfx", "/*.pdf*"))
    // '?' is only active when the pattern contains '*' (no-star patterns
    // are literal prefixes — robots_parser.cpp:207-209)
    assert(!U.matchesPattern("/tmp1", "/tmp?"))
    assert(U.matchesPattern("/tmp1/a", "/tmp?/*"))
    assert(U.matchesPattern("/anything", "/")) // prefix when no star
    // absent rules → allow
    assert(U.isAllowed(Map.empty, "*", "http://a.com/x"))
  }

  test("extract_links: quoted hrefs only, junk filtered, absolutized, deduped") {
    val html =
      """<a href="a.html">x</a> <a href='b.html'>y</a> <a href=c.html>unquoted</a>
        |<a href="#frag">f</a> <a href="javascript:void(0)">j</a>
        |<a href="mailto:a@b">m</a> <a href="a.html">dup</a> <a no-href>n</a>""".stripMargin
    val links = Html.extractLinks(html, "http://s.com/dir/page.html")
    assert(links == Seq("http:/s.com/dir/a.html", "http:/s.com/dir/b.html"))
    // without base: raw hrefs
    assert(Html.extractLinks("""<a href="x.html">""", "") == Seq("x.html"))
  }

  test("extract_text: tags → spaces, script/style dropped, whitespace collapsed") {
    val html = "<html><head><script>var   x;</script><style>.c{}</style></head>" +
      "<body><h1>Title</h1><p>hello\t\n  world</p></body></html>"
    assert(Html.extractText(html) == "Title hello world")
    assert(Html.extractText("<p>  </p>") == "")
    assert(Html.extractText("no tags  at\tall") == "no tags at all")
    // case-insensitive script detection
    assert(Html.extractText("<SCRIPT>secret</SCRIPT>visible") == "visible")
  }

  test("config-as-data: defaults, per-field overrides, domain_keywords, bad file") {
    import graft.sources.CrawlerConfig
    val spark = SparkFixture.spark
    val d = CrawlerConfig()
    assert(d.threadCount == 10 && d.maxLinks == 1000 && d.maxRetries == 3 &&
      d.userAgent == "MyWebCrawler/1.0" && d.domainKeywordWeight == 3.0 &&
      d.crossDomainKeywordWeight == 1.5 && d.retryDelaySec == 5)
    val path = java.nio.file.Files.createTempFile("graft_cfg", ".json")
    java.nio.file.Files.writeString(path,
      """{
        |  "thread_count": 4,
        |  "max_links": 16,
        |  "domain_keywords": {"a.example.com": ["news", "about"]},
        |  "domain_keyword_weight": 2.5,
        |  "unknown_field": "ignored"
        |}""".stripMargin)
    val c = CrawlerConfig.load(spark, path.toString)
    assert(c.threadCount == 4 && c.maxLinks == 16)
    assert(c.maxRetries == 3, "absent fields keep the reference defaults")
    assert(c.domainKeywords == Map("a.example.com" -> Seq("news", "about")))
    assert(c.domainKeywordWeight == 2.5 && c.crossDomainKeywordWeight == 1.5)
    // unreadable file → all-default config, like the reference
    assert(CrawlerConfig.load(spark, "/nonexistent/cfg.json") == CrawlerConfig())
    // ONE malformed field costs only that field's default — every other
    // validly-parsed field must survive (reference is_array()/is_string()
    // guards skip just the bad field; ADVICE r2)
    val bad = java.nio.file.Files.createTempFile("graft_cfg_bad", ".json")
    java.nio.file.Files.writeString(bad,
      """{
        |  "thread_count": 7,
        |  "max_links": 99,
        |  "domain_keywords": "not-an-object"
        |}""".stripMargin)
    val cb = CrawlerConfig.load(spark, bad.toString)
    assert(cb.threadCount == 7 && cb.maxLinks == 99,
      "valid fields must survive a malformed sibling field")
    assert(cb.domainKeywords.isEmpty, "the malformed field falls back alone")
  }

  test("config-driven crawl: non-default budget/batch change the wave structure") {
    import graft.sources.CrawlerConfig
    val spark = SparkFixture.spark
    val out = Crawl.crawlOrderConfigured(spark, SparkFixture.Sf0001,
      CrawlerConfig(maxLinks = 16, threadCount = 4))
    assert(out.count() == 16, "max_links budget from config")
    val waves = out.collect().groupBy(_.getAs[Int]("wave")).view.mapValues(_.length).toMap
    assert(waves.values.forall(_ <= 4), "thread_count bounds each wave")
    assert(waves.keySet == Set(0, 1, 2, 3))
  }

  test("fetch retry ladder: fail-fast 4xx, healing 5xx, budget exhaustion") {
    val spark = SparkFixture.spark
    val rows = Crawl.fetchWithRetry(spark, SparkFixture.Sf0001).collect()
    assert(rows.length == 500)
    for (r <- rows) {
      val id = r.getAs[Long]("docID")
      val st = r.getAs[Int]("final_status")
      val at = r.getAs[Int]("attempts")
      val ok = r.getAs[Boolean]("ok")
      (id % 23) match {
        case 1 => assert(st == 404 && at == 1 && !ok, s"doc $id: 404 must never retry")
        case 2 => assert(st == 200 && at == 3 && ok, s"doc $id: transient 503 heals at 3")
        case 3 => assert(st == 503 && at == Crawl.RetryMax && !ok, s"doc $id: budget")
        case 4 => assert(st == 404 && at == 2 && !ok, s"doc $id: 4xx on retry stops")
        case _ => assert(st == 200 && at == 1 && ok, s"doc $id: first-try success")
      }
    }
  }

  test("politeness: a robots crawl-delay caps each wave at one url per domain") {
    val spark = SparkFixture.spark
    val out = Crawl.crawlOrder(spark, SparkFixture.Sf0001,
      robotsTxt = Crawl.RobotsTxtDelayed).collect()
    assert(out.nonEmpty && out.length <= Crawl.MaxLinks)
    val perWaveDomain = out.groupBy { r =>
      (r.getAs[Int]("wave"),
        U.extractDomain(r.getAs[String]("url")))
    }
    assert(perWaveDomain.values.forall(_.length == 1),
      "a delayed domain must contribute at most one url per wave")
    assert(!out.map(_.getAs[String]("url")).exists(_.contains("/private/")))
    // the gate defers, not drops: later waves still progress the crawl
    assert(out.map(_.getAs[Int]("wave")).distinct.length > 2)
  }

  test("per-domain robots: each domain crawls under ITS OWN delay/disallow rules") {
    val spark = SparkFixture.spark
    // src0: crawl-delay only (no disallow → even /private/ is allowed
    // there, proving per-domain rules OVERRIDE the global fallback);
    // src1: /doc* disallowed (only its root page may be crawled);
    // every other domain: global default robots (no delay, /private/ out)
    val out = Crawl.crawlOrder(spark, SparkFixture.Sf0001,
      maxLinks = 60, batch = 12,
      robotsByDomain = Map(
        "src0.example.com" -> "User-agent: *\nCrawl-delay: 5\n",
        "src1.example.com" -> "User-agent: *\nDisallow: /doc\n")).collect()
    assert(out.nonEmpty && out.length <= 60)
    val byUrl = out.map(_.getAs[String]("url"))
    def domainOf(u: String) = U.extractDomain(u)
    // T1: only the delayed domain is capped to one url per wave
    val perWave = out.groupBy(_.getAs[Int]("wave"))
    for ((w, rows) <- perWave) {
      val src0 = rows.count(r => domainOf(r.getAs[String]("url")) == "src0.example.com")
      assert(src0 <= 1, s"wave $w dispatched $src0 src0 urls (delay must gate)")
    }
    assert(perWave.values.exists(rows =>
      rows.map(r => domainOf(r.getAs[String]("url")))
        .groupBy(identity).values.exists(_.length > 1)),
      "an UNdelayed domain must be free to dispatch >1 url in one wave")
    // P4 per-domain: src1 doc pages are disallowed, its root is not
    val src1 = byUrl.filter(domainOf(_) == "src1.example.com")
    assert(src1.forall(!_.contains("/doc")), s"src1 doc pages must be blocked: ${src1.toSeq}")
    // global fallback still applies to unlisted domains
    assert(byUrl.filter(u => domainOf(u) != "src0.example.com")
      .forall(!_.contains("/private/")))
  }

  test("crawl oracle parity under STARVED waves (batch > frontier)") {
    // batch larger than the seed count: wave 0 pops fewer than `take`,
    // so the loop runs more waves than ceil(maxLinks/batch) — the SQL
    // twin must track the actual visited budget, not assume full waves.
    val spark = SparkFixture.spark
    val maxLinks = 40
    val batch = 30
    val sparkRows = Crawl.crawlOrder(spark, SparkFixture.Sf0001,
        maxLinks = maxLinks, batch = batch, dumpOracle = true).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getInt(3),
        r.getDouble(4)))
    val wave0 = sparkRows.count(_._2 == 0)
    assert(wave0 < batch && sparkRows.length == maxLinks,
      s"fixture must starve wave 0 yet still spend the budget " +
        s"(wave0=$wave0, total=${sparkRows.length}) — a fixed-LIMIT unroll " +
        "would truncate later waves")
    // run the DuckDB twin (reads only the dumped artifacts) via python
    val sql = Crawl.crawlOrderSql(maxLinks, batch)
    val script =
      s"""import duckdb, json, sys
         |sql = json.load(open(sys.argv[1]))["sql"]
         |for row in duckdb.sql(sql).fetchall():
         |    print("\\t".join(str(v) for v in row))
         |""".stripMargin
    val sqlFile = java.nio.file.Files.createTempFile("crawl_oracle", ".json")
    val pyFile = java.nio.file.Files.createTempFile("crawl_oracle", ".py")
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\t", "\\t") + "\""
    java.nio.file.Files.writeString(sqlFile, s"""{"sql": ${q(sql)}}""")
    java.nio.file.Files.writeString(pyFile, script)
    val out = scala.sys.process.Process(
      Seq("python3", pyFile.toString, sqlFile.toString)).!!
    val duckRows = out.trim.split("\n").filter(_.nonEmpty).map { l =>
      val f = l.split("\t")
      (f(0).toInt, f(1).toInt, f(2), f(3).toInt, f(4).toDouble)
    }
    assert(duckRows.length == sparkRows.length,
      s"row counts differ: duck ${duckRows.length} vs spark ${sparkRows.length}")
    assert(duckRows.toSeq == sparkRows.toSeq)
  }

  test("crawl: budget respected, no duplicates, robots-disallowed excluded, deterministic") {
    val spark = SparkFixture.spark
    val out1 = Crawl.crawlOrder(spark, SparkFixture.Sf0001).collect()
    assert(out1.length <= Crawl.MaxLinks)
    assert(out1.length > Crawl.Batch, "crawl should progress past the seed wave")
    val urls = out1.map(_.getAs[String]("url"))
    assert(urls.distinct.length == urls.length, "visited set must dedup")
    assert(!urls.exists(_.contains("/private/")), "robots must exclude /private/")
    assert(urls.forall(_.startsWith("http:/")), "all URLs normalized")
    // seeds first: wave 0 is all roots at priority 10
    val wave0 = out1.filter(_.getAs[Int]("wave") == 0)
    assert(wave0.forall(r => r.getAs[Double]("priority") == 10.0))
    // determinism
    val out2 = Crawl.crawlOrder(spark, SparkFixture.Sf0001).collect()
    assert(out1.map(_.toSeq).toSeq == out2.map(_.toSeq).toSeq)
  }

  test("link-graph PageRank: edge shape, rank invariants, determinism") {
    import graft.operators.LinkGraph
    val spark = SparkFixture.spark
    val sfDir = SparkFixture.Sf0001
    val n = graft.Corpus.docs(spark, sfDir).count()
    val e = LinkGraph.edges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // the synthetic pages link d → (d+1)%n and (7d+3)%n, nofollow-masked
    // (LinkGraph.edges doc) — nothing else
    val expected = (0L until n).flatMap { d =>
      val chain = if (d % 10 != 7) Set((d, (d + 1) % n)) else Set.empty
      val hub = if (d % 4 == 0 || d % 25 == 3) Set((d, (7 * d + 3) % n))
                else Set.empty
      chain ++ hub
    }.toSet
    assert(e.toSet == expected)
    // the mask keeps the graph parity-safe (in-degree ≤ 2: every
    // per-node sum in the recurrence has ≤ 2 addends) and makes it
    // rank-DISCRIMINATING (the unmasked graph is provably rank-regular:
    // constant PageRank 1.0 — a fixture that orders nothing)
    assert(e.groupBy(_._2).values.map(_.size).max <= 2)
    val out1 = LinkGraph.pageRank(spark, sfDir).collect()
    assert(out1.length == LinkGraph.TopK)
    val scores = out1.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "scores must be non-increasing in rank order")
    // mean-normalized rank floor: every node keeps at least (1-d)
    assert(scores.forall(_ >= (1.0 - LinkGraph.Damping) - 1e-9))
    assert(scores.distinct.length > 1,
      "top-k must span multiple rank values (discriminating fixture)")
    val out2 = LinkGraph.pageRank(spark, sfDir).collect()
    assert(out1.map(_.toSeq).toSeq == out2.map(_.toSeq).toSeq)
    // HITS: top-k shape, max-normalized scores in (0, 1], rank 1 at 1.0
    val ht = LinkGraph.hits(spark, sfDir).collect()
    assert(ht.length == LinkGraph.TopK)
    assert(ht.head.getDouble(2) == 1.0, "rank-1 authority must be the max")
    // hub may be 0 for a top-authority node the nofollow mask dangled
    assert(ht.forall(r => r.getDouble(2) > 0 && r.getDouble(2) <= 1.0 &&
      r.getDouble(3) >= 0 && r.getDouble(3) <= 1.0))
  }
}
