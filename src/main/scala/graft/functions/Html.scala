package graft.functions

import java.util.Locale
import scala.collection.mutable

/** Pure-Scala parity ports of the reference's hand-rolled HTML parser
  * (SURVEY.md §2.3 F5/F6; `/root/reference/src/htmlparser/htmlparser.cpp`).
  * Used as deterministic UDFs in the crawl-parity dataflow. */
object Html {

  /** F5 — `extract_links` (`htmlparser.cpp:12-61`): scan for `<a `, then
    * `href=` with a quoted value (unquoted hrefs are skipped); drop
    * empty/`#…`/`javascript:`/`mailto:`; absolutize against base (if
    * given); set-dedup. Returned sorted for deterministic dataflow order
    * (the reference returns an unordered_set). */
  def extractLinks(html: String, baseUrl: String): Seq[String] = {
    val links = mutable.LinkedHashSet.empty[String]
    var pos = html.indexOf("<a ")
    while (pos >= 0) {
      val hrefAt = html.indexOf("href=", pos)
      if (hrefAt < 0) {
        pos = html.indexOf("<a ", pos + 3)
      } else {
        var hp = hrefAt + 5
        val quote = if (hp < html.length &&
          (html.charAt(hp) == '"' || html.charAt(hp) == '\'')) html.charAt(hp) else 0.toChar
        if (quote == 0.toChar) {
          pos = if (hp < html.length) html.indexOf("<a ", hp) else -1
        } else {
          hp += 1
          val endQuote = html.indexOf(quote, hp)
          if (endQuote < 0) {
            pos = html.indexOf("<a ", hp)
          } else {
            val href = html.substring(hp, endQuote)
            pos = html.indexOf("<a ", endQuote + 1)
            if (href.nonEmpty && !href.startsWith("#") &&
                !href.startsWith("javascript:") && !href.startsWith("mailto:")) {
              links += (if (baseUrl.nonEmpty) UrlFunctions.makeAbsoluteUrl(baseUrl, href)
                        else href)
            }
          }
        }
      }
    }
    links.toSeq.sorted
  }

  /** F6 — `extract_text` (`htmlparser.cpp:63-139`): state-machine
    * HTML→text — tags dropped, `<script>`/`<style>` contents dropped, a
    * tag boundary (outside script/style) emits one space, whitespace runs
    * collapse to one space, result trimmed. */
  def extractText(html: String): String = {
    val result = new StringBuilder(html.length / 2)
    var inScript = false
    var inStyle = false
    var inTag = false
    var lastWasWs = true
    val currentTag = new StringBuilder
    var i = 0
    while (i < html.length) {
      val c = html.charAt(i)
      if (c == '<') {
        inTag = true
        currentTag.clear()
        currentTag.append(c)
      } else if (inTag) {
        currentTag.append(c)
        if (c == '>') {
          inTag = false
          val tag = currentTag.toString.toLowerCase(Locale.ROOT)
          if (tag.startsWith("<script")) inScript = true
          else if (tag.startsWith("</script")) inScript = false
          else if (tag.startsWith("<style")) inStyle = true
          else if (tag.startsWith("</style")) inStyle = false
          else if (!inScript && !inStyle) {
            if (!lastWasWs) { result.append(' '); lastWasWs = true }
          }
        }
      } else if (!inScript && !inStyle) {
        if (c.isWhitespace) {
          if (!lastWasWs) { result.append(' '); lastWasWs = true }
        } else {
          result.append(c)
          lastWasWs = false
        }
      }
      i += 1
    }
    result.toString.trim
  }
}
