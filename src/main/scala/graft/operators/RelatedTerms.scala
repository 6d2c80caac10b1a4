package graft.operators

import graft.Corpus
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Related-terms mining: for each seed term, the top co-occurring
  * dictionary terms by pointwise mutual information over DOCUMENT-level
  * co-occurrence — the "related searches" / query-expansion suggestion
  * surface of a search service (PMI per Church & Hanks 1990:
  * pmi(s,t) = ln( p(s,t) / (p(s)·p(t)) ) with p estimated from document
  * frequencies).
  *
  * Scale shape (100 TB): the whole computation is two partial-aggregable
  * reductions over the (docID, term) incidence table — the same table the
  * index builder's stage 1 materializes. The co-occurrence join keys on
  * docID, so it co-partitions with the incidence table's natural layout;
  * the (seed, term) groupBy combines map-side. Nothing is ever
  * quadratic in the dictionary and nothing collects beyond the top-M
  * driver frame. A stop-word seed costs its posting list — the same
  * bound the query engine's anti-posting iterators live with.
  */
object RelatedTerms {

  /** Fixed seed set (FIXTURES.md corpus vocabulary: common, medium,
    * stop-word-heavy — exercises both selective and broad seed lists). */
  val Seeds = Seq("hash", "window", "table")

  /** Minimum document co-occurrence count: PMI is high-variance on rare
    * pairs (a 1-doc pair of two rare terms maxes the score), so the
    * standard practice is a support floor. */
  val MinCo = 5

  /** Suggestions per seed. */
  val M = 10

  /** (seed, rank, term, co_df, pmi) — top-M terms per seed by
    * (round4(pmi) desc, term asc), with co_df >= MinCo. */
  def relatedTerms(spark: SparkSession, sfDir: String,
                   seeds: Seq[String] = Seeds, m: Int = M,
                   minCo: Int = MinCo): DataFrame = {
    val docs = Corpus.docs(spark, sfDir)
    val tf = Bm25.termFreq(docs)
    val tfd = tf.select(col("docID"), col("term"))
    // n = docs with at least one token — count(DISTINCT docID), matching
    // the SQL twin and Bm25.corpusStats' population
    val n = tfd.agg(countDistinct(col("docID")).cast("double").as("n"))
    val dfr = Bm25.docFreq(tf) // (term, df)
    val seedDocs = tfd.filter(col("term").isin(seeds: _*))
      .select(col("term").as("seed"), col("docID"))
    val co = seedDocs.join(tfd, "docID")
      .filter(col("term") =!= col("seed"))
      .groupBy(col("seed"), col("term"))
      .agg(count(lit(1)).as("co_df"))
      .filter(col("co_df") >= minCo)
    val ds = dfr.select(col("term").as("seed"), col("df").as("df_s"))
    val dt = dfr.select(col("term"), col("df").as("df_t"))
    // same association order as the SQL twin: (co·n) / (df_s·df_t)
    val scored = co.join(broadcast(ds), "seed").join(dt, "term")
      .crossJoin(broadcast(n))
      .withColumn("pmi", round(log(
        (col("co_df").cast("double") * col("n")) /
          (col("df_s").cast("double") * col("df_t").cast("double"))), 4))
    val w = Window.partitionBy(col("seed"))
      .orderBy(col("pmi").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= m)
      .select(col("seed"), col("rank"), col("term"), col("co_df"), col("pmi"))
      .orderBy(col("seed"), col("rank"))
  }

  /** DuckDB twin: the full pipeline re-derived relationally from the
    * documents table (tokenization CTE shared with the BM25 twins). */
  def relatedTermsSql(seeds: Seq[String] = Seeds, m: Int = M,
                      minCo: Int = MinCo): String = {
    val seedList = seeds.map(s => s"'$s'").mkString(", ")
    s"""WITH tok AS (
       |  SELECT doc_id AS docID, t.term AS term
       |  FROM documents, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(term)
       |  WHERE t.term <> ''
       |), tfd AS (
       |  SELECT DISTINCT docID, term FROM tok
       |), nn AS (
       |  SELECT CAST(count(DISTINCT docID) AS DOUBLE) AS n FROM tok
       |), dfr AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfd GROUP BY term
       |), co AS (
       |  SELECT s.term AS seed, t.term AS term, CAST(count(*) AS BIGINT) AS co_df
       |  FROM tfd s JOIN tfd t ON t.docID = s.docID AND t.term <> s.term
       |  WHERE s.term IN ($seedList)
       |  GROUP BY s.term, t.term
       |  HAVING count(*) >= $minCo
       |), scored AS (
       |  SELECT co.seed, co.term, co.co_df,
       |         round(ln((CAST(co.co_df AS DOUBLE) * nn.n)
       |               / (CAST(ds.df AS DOUBLE) * CAST(dt.df AS DOUBLE))), 4) AS pmi
       |  FROM co CROSS JOIN nn
       |  JOIN dfr ds ON ds.term = co.seed
       |  JOIN dfr dt ON dt.term = co.term
       |)
       |SELECT seed, CAST(rank AS INTEGER) AS rank, term, co_df, pmi FROM (
       |  SELECT seed, term, co_df, pmi,
       |         row_number() OVER (PARTITION BY seed
       |                            ORDER BY pmi DESC, term ASC) AS rank
       |  FROM scored
       |) WHERE rank <= $m ORDER BY seed, rank""".stripMargin
  }
}
