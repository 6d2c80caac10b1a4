package graft.sources

import org.apache.spark.sql.SparkSession

/** Crawl configuration as DATA (SURVEY §2.1 S5): the reference's JSON
  * config surface (reference `inc/crawler_config.h:6-29`, loader
  * `src/crawler/crawler_config.cpp:8-75`) loaded through
  * `spark.read.json` with the reference's exact per-field defaults and
  * failure semantics — an absent field keeps its default, an unknown
  * field is ignored, and an unreadable/invalid file yields the all-
  * default config (the reference logs and returns `config` unchanged).
  */
final case class CrawlerConfig(
    threadCount: Int = 10,
    dbName: String = "parser.db",
    userAgent: String = "MyWebCrawler/1.0",
    requestTimeoutSec: Int = 30,
    maxLinks: Int = 1000,
    maxRetries: Int = 3,
    retryDelaySec: Int = 5,
    logFilename: String = "logs.txt",
    verboseLogging: Boolean = true,
    domainKeywords: Map[String, Seq[String]] = Map.empty,
    domainKeywordWeight: Double = 3.0,
    crossDomainKeywordWeight: Double = 1.5)

object CrawlerConfig {

  /** Load one JSON config object (multiLine, like the reference's file
    * format) with per-field defaults. */
  def load(spark: SparkSession, path: String): CrawlerConfig =
    try {
      val df = spark.read.option("multiLine", "true").json(path)
      val row = df.head()
      val fields = row.schema.fieldNames
      def idx(name: String): Option[Int] = {
        val i = fields.indexOf(name)
        if (i >= 0 && !row.isNullAt(i)) Some(i) else None
      }
      def num(name: String): Option[Double] = idx(name).flatMap { i =>
        row.get(i) match {
          case n: java.lang.Number => Some(n.doubleValue())
          case _ => None
        }
      }
      def str(name: String): Option[String] = idx(name).flatMap { i =>
        row.get(i) match { case s: String => Some(s); case _ => None }
      }
      def bool(name: String): Option[Boolean] = idx(name).flatMap { i =>
        row.get(i) match { case b: java.lang.Boolean => Some(b.booleanValue()); case _ => None }
      }
      // domain_keywords: {"domain": ["kw", ...], ...} — spark.read.json
      // infers a struct of string-arrays; non-array / non-string values
      // are skipped like the reference's is_array()/is_string() guards.
      // Its OWN try: a non-object value makes getStruct throw, and that
      // must cost only this field's default, not every other validly
      // parsed field's (ADVICE r2 — the reference skips just the bad
      // field; the outer catch is for unreadable/invalid files only).
      val dk: Map[String, Seq[String]] =
        try idx("domain_keywords").map { i =>
          val sub = row.getStruct(i)
          sub.schema.fields.zipWithIndex.flatMap { case (f, j) =>
            if (sub.isNullAt(j)) None
            else sub.get(j) match {
              case xs: scala.collection.Seq[_] =>
                Some(f.name -> xs.collect { case s: String => s }.toSeq)
              case _ => None
            }
          }.toMap
        }.getOrElse(Map.empty)
        catch { case _: Exception => Map.empty }
      val d = CrawlerConfig()
      CrawlerConfig(
        threadCount = num("thread_count").map(_.toInt).getOrElse(d.threadCount),
        dbName = str("db_name").getOrElse(d.dbName),
        userAgent = str("user_agent").getOrElse(d.userAgent),
        requestTimeoutSec = num("request_timeout_sec").map(_.toInt).getOrElse(d.requestTimeoutSec),
        maxLinks = num("max_links").map(_.toInt).getOrElse(d.maxLinks),
        maxRetries = num("max_retries").map(_.toInt).getOrElse(d.maxRetries),
        retryDelaySec = num("retry_delay_sec").map(_.toInt).getOrElse(d.retryDelaySec),
        logFilename = str("log_filename").getOrElse(d.logFilename),
        verboseLogging = bool("verbose_logging").getOrElse(d.verboseLogging),
        domainKeywords = dk,
        domainKeywordWeight = num("domain_keyword_weight").getOrElse(d.domainKeywordWeight),
        crossDomainKeywordWeight = num("cross_domain_keyword_weight").getOrElse(d.crossDomainKeywordWeight))
    } catch {
      case _: Exception => CrawlerConfig() // unreadable → defaults
    }
}
