package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analyzer (tokenizer) shared by index build, query parsing and the
  * brute-force oracle scorer.
  *
  * Semantics descend from the reference's normalization chain — lowercase
  * (reference `src/url/url_utils.cpp:19-20`), whitespace collapse + trim
  * (`src/htmlparser/htmlparser.cpp:104-138`), ASCII-case-insensitive
  * matching (`src/searcher/searcher.cpp:16,24`) — upgraded to real
  * tokenization: `lower(s).split(/[^a-z0-9]+/).filter(_.nonEmpty)`.
  *
  * The column form and the driver-side Scala form MUST stay semantically
  * identical: the query path analyzes the query string on the driver while
  * the index path analyzes content distributed, and BM25 rank-identity
  * requires both to agree token-for-token.
  */
object Analyzer {

  /** Split pattern: any run of chars outside [a-z0-9]. Applied after
    * lowercasing, so uppercase input is handled. */
  val SplitPattern = "[^a-z0-9]+"

  /** Column-level tokenizer: `array<string>` of non-empty tokens.
    * The fused native [[graft.functions.Tokenize]] expression — one
    * codegen'd pass, no regex engine, zero-copy token slices. Must stay
    * bit-identical to [[tokensColBuiltin]] (AnalyzerSpec contract). */
  def tokensCol(c: Column): Column = Native.tokenize(c)

  /** The pure-built-in formulation (lower/split/filter) the native
    * expression fuses — kept as the semantics oracle for the
    * equivalence contract test. */
  def tokensColBuiltin(c: Column): Column =
    filter(split(lower(c), SplitPattern), t => length(t) > lit(0))

  /** Driver/executor-side Scala twin of [[tokensCol]]. Locale.ROOT so the
    * result is independent of the JVM default locale (e.g. Turkish 'I'). */
  def tokenize(s: String): Seq[String] =
    s.toLowerCase(java.util.Locale.ROOT)
      .split(SplitPattern).toSeq.filter(_.nonEmpty)

  /** Query analysis: distinct terms in ascending order. Sorted order is
    * load-bearing — BM25 scores are accumulated term-by-term in this order
    * in BOTH the oracle and the indexed engine, so floating-point sums
    * associate identically (rank-identity contract, BASELINE.md). */
  def queryTerms(q: String): Seq[String] = tokenize(q).distinct.sorted

  /** Signed-query analysis: whitespace pieces prefixed `-` are NEGATED
    * (boolean NOT — "hash join -window" = docs with hash∧join, without
    * window). Each side then goes through the normal analyzer, so
    * `-Sort.ORDER` negates both `sort` and `order`. Returns
    * (positive terms, negated terms), each distinct + ascending (the
    * positive order is the BM25 association order, as [[queryTerms]]).
    * A term on both sides stays on both — AND requires it, NOT rejects
    * it, so such a query is ∅ by construction, matching the SQL twin. */
  def signedTerms(q: String): (Seq[String], Seq[String]) = {
    val pieces = q.split("\\s+").filter(_.nonEmpty)
    val (neg, pos) = pieces.partition(p => p.length > 1 && p.startsWith("-"))
    (pos.flatMap(tokenize).distinct.sorted.toSeq,
     neg.flatMap(p => tokenize(p.drop(1))).distinct.sorted.toSeq)
  }
}
