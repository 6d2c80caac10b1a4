package graft.functions

import java.util.Locale

/** Pure-Scala parity ports of the reference's URL scalar surface
  * (SURVEY.md §2.3 F1-F4, F8; §2.7 O2) — semantics mirrored
  * quirk-for-quirk from `/root/reference/src/url/url_utils.cpp` and
  * `url_priority.cpp`, including:
  *
  *   - the final `//`→`/` collapse in normalize_url has NO scheme
  *     exception (`url_utils.cpp:51-66`), so every normalized URL carries
  *     a single slash after the scheme (`http:/x`); the `http:/`→`http://`
  *     fixup at entry (`url_utils.cpp:6-17`) is what makes normalization
  *     idempotent;
  *   - `.org` is substring-checked anywhere in the URL and BEFORE
  *     `.edu`/`.gov` (`url_priority.cpp:74-86`);
  *   - keyword word boundaries are `!isalnum` on both sides
  *     (`url_priority.cpp:45-50`).
  *
  * Used as deterministic UDFs by the crawl-parity dataflow; each is a
  * plain `String => X` so Catalyst can still fold around them.
  */
object UrlFunctions {

  /** F1 — `normalize_url` (`url_utils.cpp:3-68`). */
  def normalizeUrl(url: String): String = {
    var n = url
    // fix single-slash scheme (case-sensitive, BEFORE lowercasing)
    if (n.startsWith("http:/") && !n.startsWith("http://")) {
      if (n.length > 6 && n.charAt(6) != '/') n = n.substring(0, 6) + "/" + n.substring(6)
    } else if (n.startsWith("https:/") && !n.startsWith("https://")) {
      if (n.length > 7 && n.charAt(7) != '/') n = n.substring(0, 7) + "/" + n.substring(7)
    }
    n = n.toLowerCase(Locale.ROOT)
    if (!n.startsWith("http://") && !n.startsWith("https://")) n = "http://" + n
    val frag = n.indexOf('#')
    if (frag >= 0) n = n.substring(0, frag)
    // pop trailing slash iff it is the only slash from index 8 on
    if (n.length > 8 && n.endsWith("/") &&
        n.substring(8).count(_ == '/') == 1) n = n.dropRight(1)
    val indexFiles = Seq("/index.html", "/index.php", "/index.htm", "/default.html")
    indexFiles.find(n.endsWith) match {
      case Some(suffix) =>
        n = n.dropRight(suffix.length)
        if (n.nonEmpty && !n.endsWith("/")) n = n + "/"
      case None =>
    }
    // collapse runs of '/' everywhere — including the scheme's "//"
    val sb = new StringBuilder(n.length)
    var prevSlash = false
    n.foreach { c =>
      if (c == '/') { if (!prevSlash) sb.append(c); prevSlash = true }
      else { sb.append(c); prevSlash = false }
    }
    sb.toString
  }

  /** F2 — `make_absolute_url` (`url_utils.cpp:70-111`). */
  def makeAbsoluteUrl(baseUrl: String, rel: String): String = {
    if (rel.startsWith("http://") || rel.startsWith("https://"))
      return normalizeUrl(rel)
    if (rel.length >= 2 && rel.startsWith("//")) {
      val protoEnd = baseUrl.indexOf("://")
      return if (protoEnd >= 0) normalizeUrl(baseUrl.substring(0, protoEnd) + ":" + rel)
      else normalizeUrl("http:" + rel)
    }
    var base = normalizeUrl(baseUrl)
    if (rel.nonEmpty && rel.startsWith("/")) {
      val protoEnd = base.indexOf("://")
      if (protoEnd < 0) return normalizeUrl(base + rel)
      val domainEnd = base.indexOf('/', protoEnd + 3)
      return if (domainEnd < 0) normalizeUrl(base + rel)
      else normalizeUrl(base.substring(0, domainEnd) + rel)
    }
    val lastSlash = base.lastIndexOf('/')
    if (lastSlash >= 0 && lastSlash > 8) base = base.substring(0, lastSlash + 1)
    else if (!base.endsWith("/")) base = base + "/"
    normalizeUrl(base + rel)
  }

  /** F3 — `extract_domain` (`url_utils.cpp:113-160`): strip scheme
    * (after the single-slash fixup), `www.`, `:port`, path. NOT lowercased
    * (the reference doesn't). */
  def extractDomain(url: String): String = {
    if (url.isEmpty) return ""
    var n = url
    if (n.startsWith("http:/") && !n.startsWith("http://")) {
      if (n.length > 6 && n.charAt(6) != '/') n = n.substring(0, 6) + "/" + n.substring(6)
    } else if (n.startsWith("https:/") && !n.startsWith("https://")) {
      if (n.length > 7 && n.charAt(7) != '/') n = n.substring(0, 7) + "/" + n.substring(7)
    }
    val protoPos = n.indexOf("://")
    val domainStart = if (protoPos >= 0) protoPos + 3 else 0
    val slash = n.indexOf('/', domainStart)
    val domainEnd = if (slash >= 0) slash else n.length
    var domain = n.substring(domainStart, domainEnd)
    if (domain.startsWith("www.")) domain = domain.substring(4)
    val port = domain.indexOf(':')
    if (port >= 0) domain = domain.substring(0, port)
    domain
  }

  /** F4 — `is_same_domain` (`url_utils.cpp:162-170`): equality or
    * dot-boundary suffix (url side longer). */
  def isSameDomain(url: String, domain: String): Boolean = {
    val ud = extractDomain(url)
    ud == domain ||
      (ud.length > domain.length && ud.endsWith(domain) &&
        ud.charAt(ud.length - domain.length - 1) == '.')
  }

  /** F8 — `url_contains_keyword` (`url_priority.cpp:119-151`):
    * case-insensitive substring with `!isalnum` word boundaries. */
  def urlContainsKeyword(url: String, keyword: String): Boolean = {
    val u = url.toLowerCase(Locale.ROOT)
    val k = keyword.toLowerCase(Locale.ROOT)
    var pos = u.indexOf(k)
    while (pos >= 0) {
      val startOk = pos == 0 || !u.charAt(pos - 1).isLetterOrDigit
      val end = pos + k.length
      val endOk = end == u.length || !u.charAt(end).isLetterOrDigit
      if (startOk && endOk) return true
      pos = u.indexOf(k, pos + 1)
    }
    false
  }

  // ------------------------------------------------------ O2: priority

  /** Keyword→weight table (`url_priority.cpp:7-10`). Sorted here for a
    * deterministic multiply order (the reference iterates an
    * unordered_map, but each weight applies at most once so the product
    * is order-independent; we fix ascending-key order anyway). */
  val KeywordWeights: Seq[(String, Double)] = Seq(
    "about" -> 1.5, "article" -> 0.9, "blog" -> 0.9, "contact" -> 0.8,
    "home" -> 1.1, "index" -> 1.2, "main" -> 1.2, "news" -> 1.0,
    "product" -> 1.3, "service" -> 1.3)

  /** `keyword_score` (`url_priority.cpp:27-66`): product of matched
    * weights from 1.0, ×1.5 if the last '/' is the scheme's (root URL). */
  def keywordScore(url: String): Double = {
    var score = 1.0
    KeywordWeights.foreach { case (k, w) =>
      if (urlContainsKeyword(url, k)) score *= w
    }
    val proto = url.indexOf("://")
    if (proto >= 0 && url.lastIndexOf('/') == proto + 2) score *= 1.5
    else if (proto < 0 && url.lastIndexOf('/') < 0) () // npos==npos+2 false
    score
  }

  /** `depth_score` (`url_priority.cpp:68-71`). */
  def depthScore(depth: Int): Double = math.max(0.1, 2.0 / (depth + 1.0))

  /** `domain_score` (`url_priority.cpp:73-86`) — substring anywhere,
    * `.org` checked FIRST (so it wins over a later `.gov`). */
  def domainScore(url: String): Double =
    if (url.contains(".org")) 1.2
    else if (url.contains(".edu")) 1.3
    else if (url.contains(".gov")) 1.4
    else 1.0

  /** `calculate_priority` (`url_priority.cpp:12-25`) with the default
    * empty domain-keyword config (weights 3.0 own / 1.5 cross,
    * `crawler_config.h:24-26`). */
  def priority(url: String, depth: Int,
               domainKeywords: Map[String, Seq[String]] = Map.empty,
               ownWeight: Double = 3.0, crossWeight: Double = 1.5): Double = {
    var p = keywordScore(url) + depthScore(depth) + domainScore(url)
    val dom = extractDomain(url)
    domainKeywords.get(dom).foreach(_.foreach { k =>
      if (urlContainsKeyword(url, k)) p += ownWeight
    })
    domainKeywords.foreach { case (d, ks) =>
      if (d != dom) ks.foreach { k =>
        if (urlContainsKeyword(url, k)) p += crossWeight
      }
    }
    p
  }

  // --------------------------------------------------------- robots (S4/P4/F9)

  final case class RobotsRules(allow: Seq[String], disallow: Seq[String],
                               crawlDelay: Int = 0)

  /** robots.txt parser (`robots_parser.cpp:140-202`): `#` comments
    * stripped, lines trimmed, agent sections, empty paths dropped,
    * non-integer crawl-delay ignored. */
  def parseRobots(content: String): Map[String, RobotsRules] = {
    val acc = collection.mutable.LinkedHashMap.empty[String, (List[String], List[String], Int)]
    var agent = "*"
    content.split("\n", -1).foreach { raw =>
      val noComment = { val i = raw.indexOf('#'); if (i >= 0) raw.substring(0, i) else raw }
      val line = noComment.trim
      if (line.nonEmpty) {
        val lower10 = line.take(10)
        def value: Option[String] = {
          val c = line.indexOf(':')
          if (c >= 0 && c + 1 < line.length) Some(line.substring(c + 1).trim) else None
        }
        if (lower10 == "User-agent" || lower10 == "user-agent") {
          value.foreach { v => agent = v; acc.getOrElseUpdate(agent, (Nil, Nil, 0)) }
        } else if (line.take(8) == "Disallow" || line.take(8) == "disallow") {
          value.filter(_.nonEmpty).foreach { v =>
            val (a, d, cd) = acc.getOrElseUpdate(agent, (Nil, Nil, 0))
            acc(agent) = (a, d :+ v, cd)
          }
        } else if (line.take(5) == "Allow" || line.take(5) == "allow") {
          value.filter(_.nonEmpty).foreach { v =>
            val (a, d, cd) = acc.getOrElseUpdate(agent, (Nil, Nil, 0))
            acc(agent) = (a :+ v, d, cd)
          }
        } else if (line.take(11) == "Crawl-delay" || line.take(11) == "crawl-delay") {
          value.foreach { v =>
            try {
              val delay = v.trim.toInt
              val (a, d, _) = acc.getOrElseUpdate(agent, (Nil, Nil, 0))
              acc(agent) = (a, d, delay)
            } catch { case _: NumberFormatException => }
          }
        }
      }
    }
    acc.map { case (k, (a, d, cd)) => k -> RobotsRules(a, d, cd) }.toMap
  }

  /** F9 — `matches_pattern` (`robots_parser.cpp:204-239`): plain prefix
    * when no `*`; else greedy `*`/`?` glob with backtracking. */
  def matchesPattern(path: String, pattern: String): Boolean = {
    if (!pattern.contains('*')) return path.startsWith(pattern)
    var ui = 0
    var pi = 0
    var starMatch = -1
    var starIdx = -1
    while (ui < path.length) {
      if (pi < pattern.length &&
          (pattern.charAt(pi) == '?' || pattern.charAt(pi) == path.charAt(ui))) {
        ui += 1; pi += 1
      } else if (pi < pattern.length && pattern.charAt(pi) == '*') {
        starMatch = ui; starIdx = pi; pi += 1
      } else if (starIdx >= 0) {
        pi = starIdx + 1; starMatch += 1; ui = starMatch
      } else return false
    }
    while (pi < pattern.length && pattern.charAt(pi) == '*') pi += 1
    pi == pattern.length
  }

  /** P4 — allow/deny decision (`robots_parser.cpp:17-81`): exact-agent
    * rules, else `*` rules, else allow; within rules any allow match ⇒
    * allow immediately, else any disallow match ⇒ deny, default allow.
    * `path` = url after the domain, "/" if empty (`:38-41`). */
  def isAllowed(rules: Map[String, RobotsRules], agent: String, url: String): Boolean = {
    val domain = extractDomain(url)
    if (domain.isEmpty) return true
    val at = url.indexOf(domain)
    val rawPath = if (at >= 0) url.substring(at + domain.length) else ""
    val path = if (rawPath.isEmpty) "/" else rawPath
    val selected = rules.get(agent).orElse(rules.get("*"))
    selected match {
      case None => true
      case Some(r) =>
        if (r.allow.exists(matchesPattern(path, _))) true
        else !r.disallow.exists(matchesPattern(path, _))
    }
  }
}
