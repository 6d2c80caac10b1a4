package graft.operators

import graft.Corpus
import graft.functions.Analyzer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline tier:
  * token counting (whitespace + alnum-run "BPE-ish" tokenizations),
  * quality scoring (stopword/alnum/length features), statistical
  * language ID (naive-Bayes unigram over the corpus's own lang labels),
  * and rolling-hash document fingerprinting (winnowing).
  *
  * All are single-pass column pipelines (no UDFs except the fingerprint
  * mapPartitions) — partial-agg friendly, codegen'd, linear at 100 TB.
  */
object TextStats {

  /** Fixed stopword list (corpus vocabulary ∩ classic English stops). */
  val Stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in")

  // -------------------------------------------------------- token stats

  /** (docID, ws_tokens, alnum_tokens, n_chars): whitespace-split count
    * vs analyzer (alnum-run) count vs raw length. */
  def tokenStats(spark: SparkSession, sfDir: String): DataFrame =
    Corpus.docs(spark, sfDir).select(
      col("docID"),
      size(filter(split(col("content"), "\\s+"), t => length(t) > 0))
        .cast("long").as("ws_tokens"),
      size(Analyzer.tokensCol(col("content"))).cast("long").as("alnum_tokens"),
      length(col("content")).cast("long").as("n_chars")
    ).orderBy(col("docID"))

  def tokenStatsSql: String =
    """SELECT doc_id AS docID,
      |  CAST(len(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')) AS BIGINT) AS ws_tokens,
      |  CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS BIGINT) AS alnum_tokens,
      |  CAST(length(text) AS BIGINT) AS n_chars
      |FROM documents ORDER BY docID""".stripMargin

  // ------------------------------------------------------ quality score

  /** (docID, stop_ratio, alnum_ratio, mean_tok_len, quality) — fixed
    * deterministic formula; quality ∈ [0,1]:
    * quality = 0.4·(1 − stop_ratio) + 0.3·alnum_ratio
    *         + 0.3·min(1, mean_tok_len/10)
    * computed in EXACT integer arithmetic: each 4-decimal ratio is
    * scaled to an e4 integer, combined with integer weights (4, 3, 3)
    * at e6 scale, and divided by 1e6 once — the result is the identical
    * IEEE double in every engine (any decimal rounding of a float
    * combination can land on a half-way grid point where engines
    * disagree by 1 ulp; integer math cannot). */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Analyzer.tokensCol(col("content"))
    Corpus.docs(spark, sfDir)
      .select(col("docID"), col("content"), toks.as("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn("stop_ratio",
        round(size(filter(col("toks"), t => t.isin(Stopwords: _*)))
          .cast("double") / size(col("toks")), 4))
      .withColumn("alnum_ratio",
        round(length(regexp_replace(col("content"), "[^a-zA-Z0-9]", ""))
          .cast("double") / length(col("content")), 4))
      .withColumn("mean_tok_len",
        round(aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t))
          .cast("double") / size(col("toks")), 4))
      .withColumn("quality",
        (lit(4L) * (lit(100000L) - round(col("stop_ratio") * 10000).cast("long") * 10)
          + lit(3L) * round(col("alnum_ratio") * 10000).cast("long") * 10
          + lit(3L) * least(lit(100000L), round(col("mean_tok_len") * 10000).cast("long"))
        ).cast("double") / 1000000.0)
      .select(col("docID"), col("stop_ratio"), col("alnum_ratio"),
        col("mean_tok_len"), col("quality"))
      .orderBy(col("docID"))
  }

  def qualityScoreSql: String = {
    val stops = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH base AS (
       |  SELECT doc_id AS docID, text,
       |         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '') AS toks
       |  FROM documents
       |), f AS (
       |  SELECT docID,
       |    round(CAST(len(list_filter(toks, t -> t IN ($stops))) AS DOUBLE) / len(toks), 4) AS stop_ratio,
       |    round(CAST(length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) AS DOUBLE) / length(text), 4) AS alnum_ratio,
       |    round(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks), 4) AS mean_tok_len
       |  FROM base WHERE len(toks) > 0
       |)
       |SELECT docID, stop_ratio, alnum_ratio, mean_tok_len,
       |  CAST(4 * (100000 - CAST(round(stop_ratio * 10000) AS BIGINT) * 10)
       |     + 3 * CAST(round(alnum_ratio * 10000) AS BIGINT) * 10
       |     + 3 * least(100000, CAST(round(mean_tok_len * 10000) AS BIGINT))
       |     AS DOUBLE) / 1000000.0 AS quality
       |FROM f ORDER BY docID""".stripMargin
  }

  // ---------------------------------------------------------- language ID

  /** Naive-Bayes unigram language ID, trained on the corpus's own lang
    * labels (add-one smoothing over the global vocabulary), predicting
    * argmax_lang Σ_t tf(t)·ln p(t|lang). Output (docID, pred_lang);
    * ties broken lang-ascending on the 4-decimal-rounded score.
    *
    * Dataflow: two aggregations (per-lang term counts; per-doc tf), one
    * broadcast-sized profile join — the profile is |vocab|×|langs| which
    * stays tiny even at web scale (vocab grows ~log of corpus). */
  def langIdNb(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Corpus.docs(spark, sfDir)
    val tf = Bm25.termFreq(docs) // (docID, term, tf)
    val docLang = docs.select(col("docID"), col("lang"))
    val langTf = tf.join(docLang, "docID")
      .groupBy(col("lang"), col("term")).agg(sum(col("tf")).as("c"))
    val vocab = tf.select(col("term")).distinct()
    val vocabSize = vocab.count()
    val langTotals = langTf.groupBy(col("lang")).agg(sum(col("c")).as("total"))
    val langs = langTotals.select(col("lang"))
    // full (term × lang) grid with add-one smoothing
    val grid = vocab.crossJoin(langs)
      .join(langTf, Seq("term", "lang"), "left")
      .na.fill(0L, Seq("c"))
      .join(langTotals, "lang")
      .withColumn("lp", log((col("c") + 1).cast("double") /
        (col("total") + lit(vocabSize)).cast("double")))
      .select(col("term"), col("lang"), col("lp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("docID")).orderBy(col("score").desc, col("lang").asc)
    tf.join(grid, "term")
      .groupBy(col("docID"), col("lang"))
      .agg(round(sum(col("tf") * col("lp")), 4).as("score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("docID"), col("lang").as("pred_lang"))
      .orderBy(col("docID"))
  }

  def langIdNbSql: String =
    """WITH tok AS (
      |  SELECT doc_id AS docID, t.term AS term
      |  FROM documents, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(term)
      |  WHERE t.term <> ''
      |), tf AS (
      |  SELECT docID, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
      |), dl AS (SELECT doc_id AS docID, lang FROM documents),
      |langtf AS (
      |  SELECT dl.lang, tf.term, CAST(sum(tf.tf) AS BIGINT) AS c
      |  FROM tf JOIN dl USING (docID) GROUP BY 1, 2
      |), vocab AS (SELECT DISTINCT term FROM tf),
      |vs AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
      |totals AS (SELECT lang, CAST(sum(c) AS BIGINT) AS total FROM langtf GROUP BY 1),
      |grid AS (
      |  SELECT vocab.term, totals.lang,
      |         ln(CAST(coalesce(langtf.c, 0) + 1 AS DOUBLE)
      |            / CAST(totals.total + vs.v AS DOUBLE)) AS lp
      |  FROM vocab CROSS JOIN totals CROSS JOIN vs
      |  LEFT JOIN langtf ON langtf.term = vocab.term AND langtf.lang = totals.lang
      |), scores AS (
      |  SELECT tf.docID, grid.lang, round(sum(tf.tf * grid.lp), 4) AS score
      |  FROM tf JOIN grid USING (term) GROUP BY 1, 2
      |)
      |SELECT docID, lang AS pred_lang FROM (
      |  SELECT docID, lang,
      |         row_number() OVER (PARTITION BY docID
      |                            ORDER BY score DESC, lang ASC) AS rn
      |  FROM scores
      |) WHERE rn = 1 ORDER BY docID""".stripMargin

  // -------------------------------------------------------- fingerprints

  /** Winnowing parameters: k-token shingle hashes, window w minima. */
  val FpShingle = 4
  val FpWindow = 5

  /** 64-bit polynomial rolling hash of a token window (Karp-Rabin over
    * token hashes; base chosen odd for full-period mixing). */
  def rollHash(tokens: IndexedSeq[String], from: Int, k: Int): Long = {
    var h = 1125899906842597L
    var i = from
    while (i < from + k) {
      h = h * 0x100000001B3L + tokens(i).hashCode.toLong
      i += 1
    }
    h
  }

  /** Winnowing fingerprints of one token sequence: min hash in each
    * sliding window of FpWindow consecutive k-shingle hashes, deduped,
    * sorted. Robust to local edits (standard winnowing guarantee). */
  def winnow(tokens: IndexedSeq[String],
             k: Int = FpShingle, w: Int = FpWindow): Array[Long] = {
    val n = tokens.length - k + 1
    if (n <= 0) return Array.empty
    val hs = Array.tabulate(n)(i => rollHash(tokens, i, k))
    if (n <= w) return Array(hs.min).distinct
    val out = collection.mutable.SortedSet.empty[Long]
    var i = 0
    while (i + w <= n) {
      var m = Long.MaxValue
      var j = i
      while (j < i + w) { if (hs(j) < m) m = hs(j); j += 1 }
      out += m
      i += 1
    }
    out.toArray
  }

  /** (docID, n_fp, min_fp, max_fp, fp_xor): winnowing fingerprint summary
    * per doc — typed mapPartitions (hashing isn't Catalyst-expressible);
    * the full fingerprint arrays feed clone detection downstream. */
  def fingerprints(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Corpus.docs(spark, sfDir)
      .select(col("docID"), col("content")).as[(Long, String)]
      .mapPartitions(_.map { case (id, content) =>
        val fps = winnow(Analyzer.tokenize(content).toIndexedSeq)
        (id, fps.length.toLong,
          if (fps.isEmpty) 0L else fps.min,
          if (fps.isEmpty) 0L else fps.max,
          fps.foldLeft(0L)(_ ^ _))
      })
      .toDF("docID", "n_fp", "min_fp", "max_fp", "fp_xor")
      .orderBy(col("docID"))
  }
}
