package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Bm25, Index, QueryEngine, SubstringSearch}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry reads parquet from the given sfDir; every entry
  * with an `oracleSql` twin produces column names, value rounding and row
  * order identical to what DuckDB computes for that SQL on the same files.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * BM25 top-k over the fixed query set via the INDEXED engine (build
    * resumable inverted index, then block-max WAND query). */
  def entry(spark: SparkSession): DataFrame =
    indexedTopK(spark, "/root/testdata/sf0.001")

  /** Build (or resume) the inverted index for sfDir in a deterministic
    * scratch dir, then answer the whole query set through it. */
  def indexedTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val indexDir = "/tmp/graft/index_" + sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    Index.build(spark, sfDir, indexDir)
    new QueryEngine(spark, indexDir).topKAll()
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- corpus mapping + per-row sha256 invariant (input_hint; SURVEY §1.2)
    "docs_shape" -> ((s, dir) =>
      Corpus.docs(s, dir)
        .select(col("docID"), col("repo"), col("path"), col("commit"),
          col("lang"), sha2(col("content"), 256).as("content_sha"))
        .orderBy(col("docID"))),

    // -- tokenize + tf (SURVEY §2.6 A7; analyzer F6 descendant)
    "tokens_tf" -> ((s, dir) =>
      Bm25.termFreq(Corpus.docs(s, dir))
        .select(col("docID"), col("term"), col("tf"))
        .orderBy(col("docID"), col("term"))),

    // -- exact document frequency per term (SURVEY §2.6 A7)
    "term_df" -> ((s, dir) => {
      val tf = Bm25.termFreq(Corpus.docs(s, dir))
      Bm25.docFreq(tf).select(col("term"), col("df")).orderBy(col("term"))
    }),

    // -- doc lengths (SURVEY §2.6 A7)
    "doc_stats" -> ((s, dir) => {
      val tf = Bm25.termFreq(Corpus.docs(s, dir))
      Bm25.docLengths(tf).select(col("docID"), col("len")).orderBy(col("docID"))
    }),

    // -- brute-force BM25 top-k oracle over the fixed query set (M0)
    "bm25_topk_oracle" -> ((s, dir) => Bm25.oracleTopK(s, dir)),

    // -- THE headline operator (M1+M2): resumable partitioned inverted
    //    index + block-max WAND top-k; rank-identical to the oracle SQL
    "bm25_topk_indexed" -> ((s, dir) => indexedTopK(s, dir)),

    // -- reference LIKE-substring parity (SURVEY §2.4 P8 / §2.7 O3)
    "substring_search" -> ((s, dir) => SubstringSearch.searchAll(s, dir)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "docs_shape" ->
      """SELECT doc_id AS docID, source AS repo,
        | concat(source, '/', doc_id, '.txt') AS path,
        | 'refcommit0' AS commit, lang, sha256(text) AS content_sha
        |FROM documents ORDER BY docID""".stripMargin,

    "tokens_tf" ->
      """WITH tok AS (
        |  SELECT doc_id AS docID, t.term AS term
        |  FROM documents, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(term)
        |  WHERE t.term <> ''
        |)
        |SELECT docID, term, CAST(count(*) AS BIGINT) AS tf
        |FROM tok GROUP BY docID, term ORDER BY docID, term""".stripMargin,

    "term_df" ->
      """WITH tok AS (
        |  SELECT doc_id AS docID, t.term AS term
        |  FROM documents, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(term)
        |  WHERE t.term <> ''
        |), tf AS (
        |  SELECT docID, term FROM tok GROUP BY docID, term
        |)
        |SELECT term, CAST(count(*) AS BIGINT) AS df
        |FROM tf GROUP BY term ORDER BY term""".stripMargin,

    "doc_stats" ->
      """WITH tok AS (
        |  SELECT doc_id AS docID, t.term AS term
        |  FROM documents, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(term)
        |  WHERE t.term <> ''
        |)
        |SELECT docID, CAST(count(*) AS BIGINT) AS len
        |FROM tok GROUP BY docID ORDER BY docID""".stripMargin,

    "bm25_topk_oracle" -> Bm25.oracleSqlTopK(),

    // the indexed engine must reproduce the very same frame the
    // brute-force SQL computes — that IS the rank-identity gate
    "bm25_topk_indexed" -> Bm25.oracleSqlTopK(),

    "substring_search" -> SubstringSearch.oracleSql,
  )
}
