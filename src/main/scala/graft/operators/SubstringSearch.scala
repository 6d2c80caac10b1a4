package graft.operators

import graft.Corpus
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-parity operator: the reference's entire query engine is
  * `SELECT url FROM pages WHERE content LIKE '%q%'`
  * (reference `src/searcher/searcher.cpp:16-39`) — ASCII-case-insensitive,
  * the whole query string is ONE literal (spaces significant, no term
  * splitting), unranked, insertion (rowid) order, unbounded; empty query →
  * empty result (`searcher.cpp:10-13`).
  *
  * Kept as a behavioral anchor (FIXTURES.md §5), not a perf target — the
  * BM25 inverted index is the upgrade that replaces this full scan.
  */
object SubstringSearch {

  /** Documents whose content contains `q` (case-insensitive substring),
    * in docID (insertion) order. docID plays the reference's rowid; path
    * plays url. */
  def search(docs: DataFrame, q: String): DataFrame = {
    if (q.isEmpty) {
      docs.select(col("docID"), col("path")).filter(lit(false))
    } else {
      docs
        .filter(instr(lower(col("content")), q.toLowerCase(java.util.Locale.ROOT)) > 0)
        .select(col("docID"), col("path"))
        .orderBy(col("docID"))
    }
  }

  /** All fixed queries at once: (query, docID, path). */
  def searchAll(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Corpus.docs(spark, sfDir)
    Bm25.QuerySet.map { case (qid, qtext) =>
      search(docs, qtext).select(lit(qid).as("query"), col("docID"), col("path"))
    }.reduce(_ unionAll _).orderBy(col("query"), col("docID"))
  }

  /** DuckDB twin of [[searchAll]]. */
  def oracleSql: String = {
    val perQuery = Bm25.QuerySet.map { case (qid, qtext) =>
      val lit = qtext.toLowerCase(java.util.Locale.ROOT).replace("'", "''")
      s"""(SELECT '$qid' AS query, doc_id AS docID,
         |  concat(source, '/', doc_id, '.txt') AS path
         | FROM documents WHERE strpos(lower(text), '$lit') > 0)""".stripMargin
    }.mkString("\n UNION ALL \n")
    s"SELECT * FROM (\n$perQuery\n) ORDER BY query, docID"
  }
}
