package graft.operators

import graft.Corpus
import graft.functions.{Html, UrlFunctions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-parity dataflow (SURVEY.md §3.1): the reference's
  * frontier → fetch → parse → filter → enqueue loop re-expressed as
  * batch DataFrame waves over a deterministic synthetic web derived from
  * the corpus — no network, the "fetch" is a join against the pages
  * table (SURVEY §2.1 S2: table scan replaces network scan).
  *
  * Wave shape (reference `src/crawler/crawler.cpp:163-482`):
  *   frontier top-k by (priority desc, url asc)    [O1 priority pop]
  *   join pages on url                             [S2 fetch]
  *   extract_links / extract_text UDFs             [F5/F6 parse]
  *   junk filter ∥ robots ∥ same-domain semi       [P1/P4/P2]
  *   anti-join visited ∪ frontier                  [P3/J2 dedup]
  *   priority scoring                              [O2]
  *   frontier ∪ new, capped                        [U1/P6]
  * until the crawl budget is reached               [P7].
  */
object Crawl {

  val MaxLinks = 40
  val Batch = 8
  val SeedPriority = 10.0 // crawler.cpp:89
  val FrontierCap = 1000  // P6 queue-capacity gate (best-first, deterministic)

  /** Synthetic robots.txt applied to every site: /private/ is disallowed
    * for everyone (exercises P4/F9 on real rule matching). */
  val RobotsTxt = "User-agent: *\nDisallow: /private/ # keep out\n"

  /** Variant with a crawl delay — exercises the T1 politeness gate. */
  val RobotsTxtDelayed =
    "User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n"

  private def normUdf = udf(UrlFunctions.normalizeUrl _)

  /** Deterministic synthetic web: one site per repo, one page per doc
    * (docID % 17 == 0 pages live under the disallowed /private/ prefix),
    * one root page per site linking its first three docs. Every URL is
    * stored in NORMALIZED form so joins are exact. */
  def pages(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Corpus.docs(spark, sfDir)
    val n = docs.count()
    val rawUrl = concat(
      lit("http://"), col("repo"), lit(".example.com"),
      when(col("docID") % 17 === 0, lit("/private/")).otherwise(lit("/")),
      lit("doc"), col("docID"), lit(".html"))
    val linksHtml = concat(
      lit("<a href=\"doc"), (col("docID") + 1) % n, lit(".html\">next</a>"),
      lit("<a href=\"/doc"), (col("docID") * 7 + 3) % n, lit(".html\">hub</a>"),
      lit("<a href=\"#top\">top</a><a href=\"javascript:void(0)\">x</a>"),
      lit("<a href=\"mailto:a@b.c\">mail</a>"))
    val docPages = docs.select(
      normUdf(rawUrl).as("url"),
      concat(
        lit("<html><head><script>var x=1;</script><style>.c{color:red}</style></head><body><h1>"),
        col("path"), lit("</h1><p>"), col("content"), lit("</p>"),
        linksHtml, lit("</body></html>")).as("html"))
    val w = Window.partitionBy(col("repo")).orderBy(col("docID"))
    val roots = docs
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .groupBy(col("repo"))
      .agg(concat_ws("", collect_list(
        concat(lit("<a href=\"doc"), col("docID"), lit(".html\">d</a>")))).as("body"))
      .select(
        normUdf(concat(lit("http://"), col("repo"), lit(".example.com/"))).as("url"),
        concat(lit("<html><body>"), col("body"), lit("</body></html>")).as("html"))
    docPages.unionAll(roots)
  }

  /** Config-driven crawl (S5): max_links is the budget, thread_count the
    * per-wave dispatch width (the reference dispatches up to
    * thread_count fetches concurrently per round), domain_keywords feed
    * the priority bonuses. */
  def crawlOrderConfigured(spark: SparkSession, sfDir: String,
                           config: graft.sources.CrawlerConfig): DataFrame =
    crawlOrder(spark, sfDir, maxLinks = config.maxLinks,
      batch = config.threadCount,
      domainKeywords = config.domainKeywords,
      ownWeight = config.domainKeywordWeight,
      crossWeight = config.crossDomainKeywordWeight)

  /** The batch crawl: returns (order, wave, url, depth, priority) for
    * every crawled page in crawl order — the analogue of the reference's
    * pages-table insertion order.
    *
    * Deterministic end to end: same-wave multi-parent discoveries take
    * the SHALLOWEST depth (groupBy min, not an arbitrary dropDuplicates
    * survivor) and the frontier cap keeps the BEST entries by
    * (priority desc, url asc) rather than an arbitrary limit() prefix.
    *
    * When `dumpOracle` (default config only), the synthetic link graph —
    * seeds plus (src, dst) edges with the dst's depth-independent
    * priority components — is materialized, and [[crawlOrderSql]]
    * replays the ENTIRE wave loop over it in DuckDB. */
  def crawlOrder(spark: SparkSession, sfDir: String,
                 maxLinks: Int = MaxLinks, batch: Int = Batch,
                 domainKeywords: Map[String, Seq[String]] = Map.empty,
                 ownWeight: Double = 3.0, crossWeight: Double = 1.5,
                 robotsTxt: String = RobotsTxt,
                 robotsByDomain: Map[String, String] = Map.empty,
                 dumpOracle: Boolean = false): DataFrame = {
    import spark.implicits._
    val site = pages(spark, sfDir).cache()
    // J3 robots lookup: the reference keeps a PER-DOMAIN robots cache
    // (reference `inc/robots_parser.h:17-29`). `robotsByDomain` is that
    // cache as data — each domain parsed once on the driver and
    // broadcast; a domain absent from the map falls back to the global
    // `robotsTxt` (the sim's stand-in for the live GET every domain
    // would answer identically).
    val globalRules = UrlFunctions.parseRobots(robotsTxt)
    val perDomainRules: Map[String, Map[String, UrlFunctions.RobotsRules]] =
      robotsByDomain.map { case (d, txt) => d -> UrlFunctions.parseRobots(txt) }
    val rulesBc = spark.sparkContext.broadcast((globalRules, perDomainRules))
    // T1 per-domain politeness: a robots Crawl-delay throttles same-
    // domain fetches — batch analogue: a DELAYED domain contributes at
    // most ONE url per dispatch wave (the reference paces same-domain
    // fetches crawl_delay seconds apart within a dispatch round); other
    // domains dispatch freely under THEIR OWN robots rules.
    val globalDelay = globalRules.get("*").map(_.crawlDelay).getOrElse(0)
    def delayOf(domain: String): Int =
      perDomainRules.get(domain)
        .map(_.get("*").map(_.crawlDelay).getOrElse(0))
        .getOrElse(globalDelay)
    val anyDelay = globalDelay > 0 ||
      perDomainRules.valuesIterator.exists(_.get("*").exists(_.crawlDelay > 0))
    val seedDomains = Corpus.docs(spark, sfDir).select(col("repo")).distinct()
      .collect().map(r => r.getString(0) + ".example.com").toSeq
    val seedDomainsBc = spark.sparkContext.broadcast(seedDomains)

    val extractUdf = udf((html: String, base: String) => Html.extractLinks(html, base))
    val allowedUdf = udf { (url: String) =>
      val (global, perDom) = rulesBc.value
      val rules = perDom.getOrElse(UrlFunctions.extractDomain(url), global)
      UrlFunctions.isAllowed(rules, "*", url)
    }
    val delayedUdf = udf((domain: String) => delayOf(domain) > 0)
    val sameDomainUdf = udf((url: String) =>
      seedDomainsBc.value.exists(d => UrlFunctions.isSameDomain(url, d)))
    val dk = domainKeywords
    val ow = ownWeight
    val cw = crossWeight
    val prioUdf = udf((url: String, depth: Int) =>
      UrlFunctions.priority(url, depth, dk, ow, cw))

    val seeds = site.select(col("url")).filter(col("url").endsWith(".example.com"))
      .select(col("url"), lit(0).as("depth"), lit(SeedPriority).as("priority"))
      .dropDuplicates("url")

    if (dumpOracle) {
      require(domainKeywords.isEmpty,
        "crawl oracle SQL models the default (empty) domain-keyword config")
      require(robotsTxt == RobotsTxt && robotsByDomain.isEmpty,
        "crawl oracle SQL models the default robots (no politeness gate); " +
          "pair non-default budget/batch with crawlOrderSql(maxLinks, batch)")
      graft.OracleSide.dump("crawl_seeds", seeds.select(col("url")))
      val kwUdf = udf(UrlFunctions.keywordScore _)
      val domUdf = udf(UrlFunctions.domainScore _)
      val edges = site
        .select(col("url").as("src"),
          explode(extractUdf(col("html"), col("url"))).as("dst"))
        .filter(sameDomainUdf(col("dst")) && allowedUdf(col("dst")))
        .distinct()
        .withColumn("kw", kwUdf(col("dst")))
        .withColumn("dom", domUdf(col("dst")))
      graft.OracleSide.dump("crawl_edges", edges)
    }

    var frontier = seeds
    var visited = Seq.empty[(String, Int, Double, Int)].toDF("url", "depth", "priority", "wave")
    var wave = 0
    var visitedCount = 0L
    while (visitedCount < maxLinks && !frontier.isEmpty) {
      val take = math.min(batch.toLong, maxLinks - visitedCount).toInt
      val eligible =
        if (anyDelay) {
          val domUdf = udf(UrlFunctions.extractDomain _)
          val wD = Window.partitionBy(col("domain"))
            .orderBy(col("priority").desc, col("url").asc)
          frontier.withColumn("domain", domUdf(col("url")))
            .withColumn("rkd", row_number().over(wD))
            // only domains whose OWN robots carry a Crawl-delay are
            // capped to one url per wave; the rest dispatch freely
            .filter(col("rkd") === 1 || !delayedUdf(col("domain")))
            .drop("domain", "rkd")
        } else frontier
      // localCheckpoint truncates the logical plan each wave — iterative
      // unions/joins otherwise grow the plan exponentially
      val top = eligible.orderBy(col("priority").desc, col("url").asc).limit(take)
        .withColumn("wave", lit(wave)).localCheckpoint()
      visited = visited.unionAll(top).localCheckpoint()
      visitedCount = visited.count()

      val fetched = top.join(site, "url") // S2: join replaces HTTP fetch
      val links = fetched
        .select(col("depth"), explode(extractUdf(col("html"), col("url"))).as("url"))
        .withColumn("depth", col("depth") + 1)
        .filter(sameDomainUdf(col("url")) && allowedUdf(col("url")))
        .join(visited.select("url"), Seq("url"), "left_anti")  // P3
        .join(frontier.select("url"), Seq("url"), "left_anti") // U1 dedup
        .groupBy(col("url")).agg(min(col("depth")).as("depth"))
        .withColumn("priority", prioUdf(col("url"), col("depth")))
        .select(col("url"), col("depth"), col("priority"))
      frontier = frontier.join(top.select("url"), Seq("url"), "left_anti")
        .unionAll(links)
        .orderBy(col("priority").desc, col("url").asc)
        .limit(FrontierCap) // P6 queue-capacity gate, best-first
        .localCheckpoint()
      wave += 1
    }
    visited
      .withColumn("priority", round(col("priority"), 4))
      .withColumn("order",
        row_number().over(Window.orderBy(col("wave"), col("priority").desc, col("url"))))
      .select(col("order"), col("wave"), col("url"), col("depth"), col("priority"))
      .orderBy(col("order"))
  }

  /** DuckDB twin of [[crawlOrder]]: the wave loop UNROLLED over the
    * materialized link graph — ceil(maxLinks/batch) chained CTE layers,
    * each doing exactly what one Spark wave does (best-first pop, edge
    * expansion, visited/frontier anti-join, min-depth dedup, priority
    * re-derivation, capped best-first frontier union). Priority is
    * rebuilt as kw + depthScore + dom in the same left-to-right IEEE
    * addition order as `UrlFunctions.priority`, from the materialized
    * per-url kw/dom components. */
  def crawlOrderSql(maxLinks: Int = MaxLinks, batch: Int = Batch): String = {
    // One layer per POTENTIAL wave: a starved wave (frontier smaller
    // than the remaining batch) pops fewer rows, so the Spark loop can
    // run up to maxLinks iterations, not ceil(maxLinks/batch). Each
    // layer takes min(batch, budget left) via row_number + a scalar
    // subquery over the visited count, and goes empty exactly when the
    // Spark loop would stop iterating (budget spent or frontier drained).
    val waves = maxLinks
    val sb = new StringBuilder
    sb.append(
      s"""WITH e AS MATERIALIZED (SELECT src, dst, kw, dom FROM ${graft.OracleSide.glob("crawl_edges")}),
         |kd AS MATERIALIZED (SELECT DISTINCT dst, kw, dom FROM e),
         |f0 AS MATERIALIZED (SELECT url, 0 AS depth, CAST(10.0 AS DOUBLE) AS priority
         |       FROM ${graft.OracleSide.glob("crawl_seeds")}),
         |vis0 AS MATERIALIZED (SELECT url, depth, priority, 0 AS wave FROM f0 WHERE 1 = 0),
         |""".stripMargin)
    for (w <- 0 until waves) {
      sb.append(
        s"""top$w AS MATERIALIZED (
           |  SELECT url, depth, priority, $w AS wave FROM (
           |    SELECT url, depth, priority,
           |           row_number() OVER (ORDER BY priority DESC, url ASC) AS rn
           |    FROM f$w
           |  ) WHERE rn <= least($batch, $maxLinks - (SELECT count(*) FROM vis$w))
           |),
           |vis${w + 1} AS MATERIALIZED (SELECT * FROM vis$w UNION ALL SELECT * FROM top$w),
           |new$w AS MATERIALIZED (
           |  SELECT e.dst AS url, min(t.depth + 1) AS depth
           |  FROM top$w t JOIN e ON e.src = t.url
           |  WHERE e.dst NOT IN (SELECT url FROM vis${w + 1})
           |    AND e.dst NOT IN (SELECT url FROM f$w)
           |  GROUP BY e.dst
           |),
           |newp$w AS MATERIALIZED (
           |  SELECT n.url, n.depth,
           |         kd.kw + greatest(0.1, 2.0 / (n.depth + 1.0)) + kd.dom AS priority
           |  FROM new$w n JOIN kd ON kd.dst = n.url
           |),
           |f${w + 1} AS MATERIALIZED (
           |  SELECT url, depth, priority FROM (
           |    SELECT url, depth, priority FROM f$w
           |    WHERE url NOT IN (SELECT url FROM top$w)
           |    UNION ALL SELECT url, depth, priority FROM newp$w
           |  ) ORDER BY priority DESC, url ASC LIMIT $FrontierCap
           |),
           |""".stripMargin)
    }
    sb.append(
      s"""fin AS MATERIALIZED (
         |  SELECT CAST(row_number() OVER (ORDER BY wave, round(priority, 4) DESC, url)
         |              AS INTEGER) AS "order",
         |         wave, url, depth, round(priority, 4) AS priority
         |  FROM vis$waves
         |)
         |SELECT "order", wave, url, depth, priority FROM fin ORDER BY "order"""".stripMargin)
    sb.toString
  }

  // ------------------------------------------------- S3/P5: fetch retry

  /** Total attempt budget (reference `crawler_config.h` max_retries:
    * first fetch + (max_retries − 1) retries). */
  val RetryMax = 3

  /** Deterministic synthetic HTTP status schedule per (docID, attempt):
    * the data-plane stand-in for live responses (the sandbox has no
    * network; SURVEY §2.1 S2 replaces the network scan with a table). */
  def statusAt(docID: Long, attempt: Int): Int = (docID % 23) match {
    case 1 => 404                            // client error → fail fast
    case 2 => if (attempt >= 3) 200 else 503 // transient, heals at attempt 3
    case 3 => 503                            // permanently down
    case 4 => if (attempt == 1) 503 else 404 // 4xx ON a retry → stop
    case _ => 200
  }

  /** S3/P5: the reference's retry ladder (reference
    * `src/crawler/crawler.cpp:521-557`) as data-plane wave iteration:
    * attempt 1 for everyone; 2xx/3xx → ok; 4xx → fail-fast (NEVER
    * retried — the reference returns before the retry loop, and a 4xx
    * inside the loop also returns); anything else retries until the
    * attempt budget is spent. (The reference additionally fails empty-
    * content 2xx responses; the synthetic pages are never empty.)
    * Returns (docID, url, final_status, attempts, ok). */
  def fetchWithRetry(spark: SparkSession, sfDir: String,
                     maxRetries: Int = RetryMax): DataFrame = {
    val statusUdf = udf(statusAt _)
    var pending = Corpus.docs(spark, sfDir).select(col("docID"),
      concat(lit("http://"), col("repo"), lit(".example.com/doc"),
        col("docID"), lit(".html")).as("url"))
    var results: DataFrame = null
    for (attempt <- 1 to maxRetries if pending != null) {
      val classified = pending
        .withColumn("status", statusUdf(col("docID"), lit(attempt)))
        .withColumn("ok", col("status") >= 200 && col("status") < 400)
        .withColumn("failFast", col("status") >= 400 && col("status") < 500)
        .withColumn("done", col("ok") || col("failFast") || lit(attempt == maxRetries))
      val finished = classified.filter(col("done"))
        .select(col("docID"), col("url"), col("status").as("final_status"),
          lit(attempt).as("attempts"), col("ok"))
      results = if (results == null) finished else results.unionAll(finished)
      pending =
        if (attempt == maxRetries) null
        else classified.filter(!col("done")).select(col("docID"), col("url"))
    }
    results.orderBy(col("docID"))
  }

  /** DuckDB twin of [[fetchWithRetry]] at the default attempt budget:
    * the expected OUTCOME of the ladder per status class, derived
    * independently (by hand) from the reference's control flow rather
    * than by replaying attempts — 404 fails on attempt 1 (fail-fast,
    * never retried), the healing 503 succeeds on attempt 3, the
    * permanent 503 exhausts the budget, the 503→404 class stops at
    * attempt 2 (client error on a retry also returns). */
  def fetchRetrySql(): String =
    """SELECT doc_id AS docID,
      |  'http://' || source || '.example.com/doc' || doc_id || '.html' AS url,
      |  CASE CAST(doc_id % 23 AS INT)
      |    WHEN 1 THEN 404 WHEN 2 THEN 200 WHEN 3 THEN 503 WHEN 4 THEN 404
      |    ELSE 200 END AS final_status,
      |  CASE CAST(doc_id % 23 AS INT)
      |    WHEN 1 THEN 1 WHEN 2 THEN 3 WHEN 3 THEN 3 WHEN 4 THEN 2
      |    ELSE 1 END AS attempts,
      |  CAST(doc_id % 23 AS INT) NOT IN (1, 3, 4) AS ok
      |FROM documents ORDER BY docID""".stripMargin

  // ------------------------------------- SQL-twinned URL scalar entries

  /** Gnarly URL variants derived from the corpus — generated by the SAME
    * expression here and in the DuckDB twin; only the normalization
    * differs (parity UDF vs SQL step chain). */
  private def variantCol = {
    val d = col("doc_id")
    when(d % 6 === 0, concat(lit("HTTP://"), col("source"), lit(".Example.com//Docs//"), d, lit("/Index.HTML#Frag")))
      .when(d % 6 === 1, concat(lit("https:/"), col("source"), lit(".example.com/a/b/c?x=1#y#z")))
      .when(d % 6 === 2, concat(col("source"), lit(".example.com/")))
      .when(d % 6 === 3, concat(lit("http:/"), col("source"), lit(".example.com/index.php")))
      .when(d % 6 === 4, concat(lit("http://www."), col("source"), lit(".example.com:8080/About/Index.htm")))
      .otherwise(concat(lit("http://"), col("source"), lit(".EXAMPLE.org/product/news//item")))
  }

  private val variantSql =
    """CASE CAST(doc_id % 6 AS INT)
      | WHEN 0 THEN 'HTTP://' || source || '.Example.com//Docs//' || doc_id || '/Index.HTML#Frag'
      | WHEN 1 THEN 'https:/' || source || '.example.com/a/b/c?x=1#y#z'
      | WHEN 2 THEN source || '.example.com/'
      | WHEN 3 THEN 'http:/' || source || '.example.com/index.php'
      | WHEN 4 THEN 'http://www.' || source || '.example.com:8080/About/Index.htm'
      | ELSE 'http://' || source || '.EXAMPLE.org/product/news//item'
      |END""".stripMargin

  /** (docID, url, normalized) — F1 parity over the variant set. */
  def urlNormalize(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("docID"), variantCol.as("url"))
      .withColumn("normalized", normUdf(col("url")))
      .orderBy(col("docID"))

  /** DuckDB twin of [[urlNormalize]]: the reference's normalize steps as
    * a SQL chain (single-slash scheme fixup BEFORE lower; prepend http://
    * when schemeless; cut at first '#'; pop the trailing slash iff it is
    * the only one from position 9 on; strip index files then re-slash;
    * collapse every '/' run INCLUDING the scheme's). */
  def urlNormalizeSql: String =
    s"""WITH v AS (
       |  SELECT doc_id AS docID, $variantSql AS url FROM documents
       |), s0 AS (
       |  SELECT docID, url,
       |    regexp_replace(regexp_replace(url,
       |      '^http:/([^/])', 'http://\\1'),
       |      '^https:/([^/])', 'https://\\1') AS u0
       |  FROM v
       |), s1 AS (SELECT docID, url, lower(u0) AS u1 FROM s0),
       |s2 AS (
       |  SELECT docID, url,
       |    CASE WHEN u1 LIKE 'http://%' OR u1 LIKE 'https://%'
       |         THEN u1 ELSE 'http://' || u1 END AS u2
       |  FROM s1
       |), s3 AS (SELECT docID, url, regexp_replace(u2, '#.*$$', '') AS u3 FROM s2),
       |s4 AS (
       |  SELECT docID, url,
       |    CASE WHEN length(u3) > 8 AND u3 LIKE '%/'
       |          AND length(substr(u3, 9)) - length(replace(substr(u3, 9), '/', '')) = 1
       |         THEN substr(u3, 1, length(u3) - 1) ELSE u3 END AS u4
       |  FROM s3
       |), s5 AS (
       |  SELECT docID, url,
       |    CASE
       |     WHEN u4 LIKE '%/index.html' THEN substr(u4, 1, length(u4) - 11)
       |     WHEN u4 LIKE '%/index.php'  THEN substr(u4, 1, length(u4) - 10)
       |     WHEN u4 LIKE '%/index.htm'  THEN substr(u4, 1, length(u4) - 10)
       |     WHEN u4 LIKE '%/default.html' THEN substr(u4, 1, length(u4) - 13)
       |     ELSE NULL END AS stripped, u4
       |  FROM s4
       |), s6 AS (
       |  SELECT docID, url,
       |    CASE WHEN stripped IS NULL THEN u4
       |         WHEN stripped LIKE '%/' THEN stripped
       |         ELSE stripped || '/' END AS u6
       |  FROM s5
       |)
       |SELECT docID, url, regexp_replace(u6, '/+', '/', 'g') AS normalized
       |FROM s6 ORDER BY docID""".stripMargin

  /** (docID, url, priority) — O2 parity over the variant set with
    * depth = doc_id % 4 and the default (empty) domain-keyword config. */
  def urlPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val pUdf = udf((url: String, depth: Int) => UrlFunctions.priority(url, depth))
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("docID"), variantCol.as("url"),
        (col("doc_id") % 4).cast("int").as("depth"))
      .withColumn("priority", round(pUdf(col("url"), col("depth")), 4))
      .select(col("docID"), col("url"), col("priority"))
      .orderBy(col("docID"))
  }

  /** DuckDB twin of [[urlPriority]]: keyword product in the fixed
    * ascending-key order of UrlFunctions.KeywordWeights, ×1.5 root bonus
    * (last '/' is the scheme's), + depth + domain (.org substring first,
    * case-sensitive). */
  def urlPrioritySql: String = {
    val kwFactors = UrlFunctions.KeywordWeights.map { case (k, w) =>
      s"(CASE WHEN regexp_matches(lower(url), '(^|[^a-z0-9])$k([^a-z0-9]|$$)') THEN $w ELSE 1.0 END)"
    }.mkString(" * ")
    s"""WITH v AS (
       |  SELECT doc_id AS docID, $variantSql AS url,
       |         CAST(doc_id % 4 AS INT) AS depth
       |  FROM documents
       |)
       |SELECT docID, url,
       |  round(
       |    1.0 * $kwFactors
       |        * (CASE WHEN regexp_matches(url, '^[^/]*://[^/]*$$') THEN 1.5 ELSE 1.0 END)
       |    + greatest(0.1, 2.0 / (depth + 1.0))
       |    + (CASE WHEN contains(url, '.org') THEN 1.2
       |            WHEN contains(url, '.edu') THEN 1.3
       |            WHEN contains(url, '.gov') THEN 1.4
       |            ELSE 1.0 END), 4) AS priority
       |FROM v ORDER BY docID""".stripMargin
  }

  /** DuckDB twin of [[extractTextParity]]: the expected text is
    * independently constructible — `path`, the whitespace-collapsed
    * content, and the anchor texts, space-joined (script/style bodies
    * must NOT appear). */
  def extractTextSql: String =
    """SELECT doc_id AS docID,
      |  source || '/' || doc_id || '.txt ' ||
      |  trim(regexp_replace(text, '\s+', ' ', 'g')) ||
      |  ' next hub top x mail' AS text
      |FROM documents ORDER BY docID""".stripMargin

  /** (docID, link) — F5+F2 parity: links extracted from each synthetic
    * doc page (junk hrefs dropped, relative hrefs resolved against the
    * page URL with the reference's exact quirks). */
  def extractLinksParity(spark: SparkSession, sfDir: String): DataFrame = {
    val extractUdf = udf((html: String, base: String) => Html.extractLinks(html, base))
    val docs = Corpus.docs(spark, sfDir)
    val n = docs.count()
    val rawUrl = concat(
      lit("http://"), col("repo"), lit(".example.com"),
      when(col("docID") % 17 === 0, lit("/private/")).otherwise(lit("/")),
      lit("doc"), col("docID"), lit(".html"))
    val linksHtml = concat(
      lit("<a href=\"doc"), (col("docID") + 1) % n, lit(".html\">next</a>"),
      lit("<a href=\"/doc"), (col("docID") * 7 + 3) % n, lit(".html\">hub</a>"),
      lit("<a href=\"#top\">top</a><a href=\"javascript:void(0)\">x</a>"),
      lit("<a href=\"mailto:a@b.c\">mail</a>"))
    docs.select(col("docID"), normUdf(rawUrl).as("url"),
        concat(lit("<html><body>"), linksHtml, lit("</body></html>")).as("html"))
      .select(col("docID"), explode(extractUdf(col("html"), col("url"))).as("link"))
      .orderBy(col("docID"), col("link"))
  }

  /** DuckDB twin of [[extractLinksParity]]: the two surviving links per
    * page, constructed independently in normalized form — the sibling
    * link resolves into the page's directory; the root-relative link
    * exhibits the reference quirk where `base.find("://")` fails on the
    * collapsed single-slash scheme, so it appends to the FULL page URL
    * (`url_utils.cpp:91-103` after `:51-66`). */
  def extractLinksSql: String =
    """WITH n AS (SELECT count(*) AS n FROM documents),
      |p AS (
      |  SELECT doc_id AS docID,
      |    'http:/' || source || '.example.com' ||
      |      (CASE WHEN doc_id % 17 = 0 THEN '/private/' ELSE '/' END) AS dir,
      |    'http:/' || source || '.example.com' ||
      |      (CASE WHEN doc_id % 17 = 0 THEN '/private/' ELSE '/' END) ||
      |      'doc' || doc_id || '.html' AS page,
      |    doc_id FROM documents
      |)
      |SELECT docID, link FROM (
      |  SELECT docID, dir || 'doc' || ((doc_id + 1) % n.n) || '.html' AS link
      |  FROM p, n
      |  UNION ALL
      |  SELECT docID, page || '/doc' || ((doc_id * 7 + 3) % n.n) || '.html' AS link
      |  FROM p, n
      |) ORDER BY docID, link""".stripMargin

  /** (docID, text) — F6 parity: extract_text over the synthetic HTML
    * pages must recover exactly `path + ' ' + content` (script/style
    * dropped, tags → single spaces, whitespace collapsed). */
  def extractTextParity(spark: SparkSession, sfDir: String): DataFrame = {
    val textUdf = udf(Html.extractText _)
    val docs = Corpus.docs(spark, sfDir)
    val n = docs.count()
    val linksHtml = concat(
      lit("<a href=\"doc"), (col("docID") + 1) % n, lit(".html\">next</a>"),
      lit("<a href=\"/doc"), (col("docID") * 7 + 3) % n, lit(".html\">hub</a>"),
      lit("<a href=\"#top\">top</a><a href=\"javascript:void(0)\">x</a>"),
      lit("<a href=\"mailto:a@b.c\">mail</a>"))
    docs.select(col("docID"),
      concat(
        lit("<html><head><script>var x=1;</script><style>.c{color:red}</style></head><body><h1>"),
        col("path"), lit("</h1><p>"), col("content"), lit("</p>"),
        linksHtml, lit("</body></html>")).as("html"))
      .select(col("docID"), textUdf(col("html")).as("text"))
      .orderBy(col("docID"))
  }
}
