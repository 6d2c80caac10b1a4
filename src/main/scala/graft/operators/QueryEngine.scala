package graft.operators

import graft.functions.{Analyzer, Codec}
import graft.operators.Index._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import scala.collection.mutable

/** Indexed BM25 top-k query path (SURVEY.md §7 M2; north rule:
  * "multi-term queries with BM25 top-k scoring via posting-list
  * intersection and block-max WAND pruning").
  *
  * Replaces the reference's whole query engine — an unindexed
  * `SELECT url FROM pages WHERE content LIKE '%q%'` full scan
  * (reference `src/searcher/searcher.cpp:16-39`) — with:
  *
  *   driver: analyze query → dictionary lookup (term-pruned scan) →
  *   bucket list → partition-pruned postings scan → shard the docID
  *   space into ranges → each range-task runs conjunctive block-max WAND
  *   over its terms' segments (AND semantics) with a bounded top-k heap →
  *   global merge via orderBy(score desc, docID asc).limit(k)
  *   (TakeOrderedAndProject).
  *
  * Scale design: the index is term-partitioned on disk (df-range buckets,
  * salted segments) but queries are evaluated doc-partitioned — each task
  * owns a contiguous docID range, so stop-word posting lists are processed
  * by many tasks in parallel instead of one hot task. Document norms
  * (docstats) are broadcast when the corpus is small enough, else
  * co-shuffled to range-tasks via cogroup — both paths are exercised in
  * tests.
  */
object QueryEngine {

  /** Spark/DuckDB-compatible HALF_UP rounding to 4 decimals (scores are
    * non-negative). Matches `round(col, 4)`. */
  def r4(s: Double): Double =
    new JBigDecimal(s).setScale(4, RoundingMode.HALF_UP).doubleValue()

  /** Safety pad for block-max upper bounds: blockMaxQ is stored with a
    * different float association than the scoring path, so bounds are
    * inflated before pruning comparisons (admissibility insurance). */
  private def pad(ub: Double): Double = ub * (1.0 + 1e-9) + 1e-12

  // ----------------------------------------------------- posting iterator

  /** Iterator over one term's posting list = its minDoc-ordered,
    * range-disjoint segments. Supports advance(target) with segment-level
    * skip (minDoc/maxDoc), block-level skip (binary search on
    * blockLastDoc), and lazy block decode. */
  final class PostingListIterator(segments: Array[PostingSegment]) {
    require(segments.nonEmpty)
    private var segIdx = 0
    private var blkIdx = -1
    private var ids: Array[Long] = null
    private var tfs: Array[Long] = null
    private var pos = 0
    var docID: Long = -1L
    var tf: Long = 0L
    private var exhaustedFlag = false

    def exhausted: Boolean = exhaustedFlag
    private def seg: PostingSegment = segments(segIdx)

    /** Upper-bound quotient of the block containing the current posting. */
    def blockMaxQ: Double = seg.blockMaxQ(blkIdx)

    /** Last docID of the current block (block-max skip horizon). */
    def blockLastDoc: Long = seg.blockLastDoc(blkIdx)

    private def decodeBlock(b: Int): Unit = {
      blkIdx = b
      val cnt = Codec.blockCount(seg.count, b)
      val (i, t) = Codec.decodeBlock(seg.docBlob, seg.tfBlob,
        seg.blockDocOff(b), seg.blockTfOff(b), cnt)
      ids = i; tfs = t; pos = 0
    }

    /** Position at the first posting with docID >= target. */
    def advance(target: Long): Unit = {
      if (exhaustedFlag) return
      // segment-level skip
      while (segIdx < segments.length && segments(segIdx).maxDoc < target) {
        segIdx += 1; blkIdx = -1; ids = null
      }
      if (segIdx >= segments.length) {
        exhaustedFlag = true; docID = Long.MaxValue; return
      }
      val s = seg
      // block-level: binary search first block with lastDoc >= target
      val fromBlk = if (blkIdx >= 0 && ids != null && s.blockLastDoc(blkIdx) >= target) blkIdx
        else {
          var lo = math.max(blkIdx, 0)
          var hi = s.blockLastDoc.length - 1
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (s.blockLastDoc(mid) < target) lo = mid + 1 else hi = mid
          }
          lo
        }
      if (fromBlk != blkIdx || ids == null) decodeBlock(fromBlk)
      else if (docID >= target) return // already positioned
      // in-block scan (postings sorted; linear from current pos)
      while (pos < ids.length && ids(pos) < target) pos += 1
      if (pos >= ids.length) {
        // target fell in a gap past this block's end; recurse to next block
        if (blkIdx + 1 < s.blockLastDoc.length) { decodeBlock(blkIdx + 1); advance(target) }
        else { segIdx += 1; blkIdx = -1; ids = null; advance(target) }
      } else {
        docID = ids(pos); tf = tfs(pos)
      }
    }
  }

  // --------------------------------------------------------- range task

  final case class TermCtx(term: String, df: Long, idf: Double)
  final case class ScoredDoc(docID: Long, score: Double)
  final case class RangedSeg(rangeId: Int, seg: PostingSegment)

  /** Conjunctive block-max WAND over one docID range [lo, hi).
    * `termsSorted` ascending by term — scores accumulate in that fixed
    * order (rank-identity contract). Returns up to k (docID, score) with
    * score EXACT; ordering/rounding applied by the caller. In `rounded`
    * mode the heap competes on (round4(score), docID) so pruning matches
    * the final rounded ranking. */
  def wandRange(
      segsByTerm: Map[String, Array[PostingSegment]],
      termsSorted: Array[TermCtx],
      lenOf: Long => Long,
      avgdl: Double,
      lo: Long, hi: Long, k: Int,
      rounded: Boolean): Seq[ScoredDoc] = {
    val n = termsSorted.length
    if (n == 0 || segsByTerm.size < n) return Nil
    val iters = termsSorted.map(tc => new PostingListIterator(segsByTerm(tc.term)))
    iters.foreach(_.advance(lo))
    if (iters.exists(_.exhausted)) return Nil
    // driver order: rarest first minimizes advance() work
    val order = termsSorted.indices.sortBy(i => termsSorted(i).df).toArray

    // heap of k best; root = weakest. Better = (key desc, docID asc).
    final case class Entry(key: Double, docID: Long, score: Double)
    val worseFirst = Ordering.fromLessThan[Entry]((a, b) =>
      a.key < b.key || (a.key == b.key && a.docID > b.docID))
    val heap = new mutable.PriorityQueue[Entry]()(worseFirst.reverse) // dequeue = worst
    def keyOf(score: Double): Double = if (rounded) r4(score) else score
    def threshold: Double =
      if (heap.size < k) Double.NegativeInfinity
      else if (rounded) heap.head.key - 0.00005
      else heap.head.key

    var candidate = iters(order(0)).docID
    var running = !iters(order(0)).exhausted
    while (running && candidate < hi) {
      // align all iterators on candidate
      var matched = true
      var oi = 1
      var bump = candidate
      while (matched && oi < n) {
        val it = iters(order(oi))
        it.advance(candidate)
        if (it.exhausted) { running = false; matched = false }
        else if (it.docID != candidate) { bump = it.docID; matched = false }
        oi += 1
      }
      if (!running) ()
      else if (!matched) {
        iters(order(0)).advance(bump)
        if (iters(order(0)).exhausted) running = false
        else candidate = iters(order(0)).docID
      } else {
        // all aligned at candidate: block-max upper bound
        var ub = 0.0
        var minLast = Long.MaxValue
        var i = 0
        while (i < n) {
          ub += termsSorted(i).idf * iters(i).blockMaxQ
          if (iters(i).blockLastDoc < minLast) minLast = iters(i).blockLastDoc
          i += 1
        }
        if (pad(ub) < threshold) {
          // no doc in (candidate, minLast] can beat the threshold
          val skipTo = math.max(candidate + 1, minLast + 1)
          iters(order(0)).advance(skipTo)
        } else {
          // exact score, fixed ascending-term association
          val len = lenOf(candidate)
          val norm = 1.2 * (0.25 + 0.75 * len.toDouble / avgdl)
          var score = 0.0
          i = 0
          while (i < n) {
            val tfv = iters(i).tf.toDouble
            score += termsSorted(i).idf * (tfv * 2.2) / (tfv + norm)
            i += 1
          }
          val key = keyOf(score)
          if (heap.size < k) heap.enqueue(Entry(key, candidate, score))
          else {
            val w = heap.head
            if (key > w.key || (key == w.key && candidate < w.docID)) {
              heap.dequeue(); heap.enqueue(Entry(key, candidate, score))
            }
          }
          iters(order(0)).advance(candidate + 1)
        }
        if (iters(order(0)).exhausted) running = false
        else candidate = iters(order(0)).docID
      }
    }
    val out = Seq.newBuilder[ScoredDoc]
    while (heap.nonEmpty) {
      val e = heap.dequeue()
      out += ScoredDoc(e.docID, e.score)
    }
    out.result()
  }
}

/** Per-index query session: caches stats, the docID-range layout and
  * (small-corpus path) the broadcast norms, then serves topK queries —
  * the analogue of keeping the index open in a search service. */
final class QueryEngine(
    spark: SparkSession,
    indexDir: String,
    numRanges: Int = 32,
    broadcastNormsUpTo: Long = 4_000_000L,
    dictCacheUpTo: Long = 1_000_000L) extends Serializable {

  import QueryEngine._
  import spark.implicits._

  val stats: CorpusStat = Index.readStats(spark, indexDir)
  private val useBroadcastNorms = stats.n <= broadcastNormsUpTo.toDouble

  /** Small-vocab path: the whole dictionary pinned on the driver (a
    * search service keeps its term dictionary in memory). Vocabulary
    * grows ~log(corpus), so this holds far beyond sandbox scale; above
    * the cap, lookups fall back to the term-pruned dictionary scan. */
  private val dictCache: Option[Map[String, DictEntry]] = {
    val d = Index.readDictionary(spark, indexDir)
    if (d.count() <= dictCacheUpTo) Some(d.collect().map(e => e.term -> e).toMap)
    else None
  }

  /** Small-corpus path: norms as a broadcast primitive-friendly map. */
  private val normsBc =
    if (useBroadcastNorms) {
      val m = Index.readDocStats(spark, indexDir)
        .collect().map(d => d.docID -> d.len).toMap
      Some(spark.sparkContext.broadcast(m))
    } else None

  private def lookupTerms(terms: Seq[String]): Seq[DictEntry] = dictCache match {
    case Some(m) => terms.flatMap(m.get)
    case None =>
      Index.readDictionary(spark, indexDir)
        .filter(col("term").isin(terms: _*))
        .collect().toSeq
  }

  /** Top-k (docID, score) for a query string; AND semantics; empty
    * result if any term is absent (or the query has no terms). Score is
    * exact in exact mode, rounded to 4 decimals in rounded mode; order
    * (score desc, docID asc) on the mode's score. */
  def topK(qtext: String, k: Int = Bm25.K, rounded: Boolean = false): DataFrame = {
    val empty = Seq.empty[(Long, Double)].toDF("docID", "score")
    val terms = Analyzer.queryTerms(qtext)
    if (terms.isEmpty) return empty
    val dict = lookupTerms(terms)
    if (dict.size < terms.size) return empty // AND: a missing term → ∅

    val n = stats.n
    val avgdl = stats.avgdl
    val termCtx = dict.map(d => TermCtx(d.term, d.df, Bm25.idf(n, d.df)))
      .sortBy(_.term).toArray
    val buckets = dict.map(_.bucket).distinct
    // shard the docID space ∝ posting volume (~100k postings per task,
    // capped at numRanges): a rare-term query runs in one task with no
    // fan-out, a stop-word query spreads across the cluster
    val ranges = math.max(1L,
      math.min(numRanges.toLong, dict.map(_.df).sum / 100_000L + 1)).toInt
    val rs = math.max(1L, (stats.maxDoc + ranges) / ranges)
    val kk = k
    val rnd = rounded

    val segs = Index.readSegments(spark, indexDir, terms, buckets)
    val ranged = segs.flatMap { s =>
      val loR = (s.minDoc / rs).toInt
      val hiR = (s.maxDoc / rs).toInt
      (loR to hiR).map(r => RangedSeg(r, s))
    }

    val local: org.apache.spark.sql.Dataset[ScoredDoc] = normsBc match {
      case Some(bc) =>
        ranged.groupByKey(_.rangeId).flatMapGroups { (rid, it) =>
          val byTerm = it.map(_.seg).toArray.groupBy(_.term)
            .map { case (t, ss) => t -> ss.sortBy(_.minDoc) }
          val lo = rid.toLong * rs
          val norms = bc.value
          wandRange(byTerm, termCtx, norms.apply, avgdl, lo, lo + rs, kk, rnd)
            .iterator
        }
      case None =>
        val normsByRange = Index.readDocStats(spark, indexDir)
          .groupByKey(d => (d.docID / rs).toInt)
        ranged.groupByKey(_.rangeId).cogroup(normsByRange) { (rid, segIt, dsIt) =>
          val byTerm = segIt.map(_.seg).toArray.groupBy(_.term)
            .map { case (t, ss) => t -> ss.sortBy(_.minDoc) }
          if (byTerm.isEmpty) Iterator.empty
          else {
            val norms = dsIt.map(d => d.docID -> d.len).toMap
            val lo = rid.toLong * rs
            wandRange(byTerm, termCtx, norms.apply, avgdl, lo, lo + rs, kk, rnd)
              .iterator
          }
        }
    }

    if (rounded)
      local.toDF()
        .withColumn("score", round(col("score"), 4))
        .orderBy(col("score").desc, col("docID").asc)
        .limit(k)
    else
      local.toDF()
        .orderBy(col("score").desc, col("docID").asc)
        .limit(k)
  }

  /** Driver-contract shape over the whole fixed query set:
    * (query, rank, docID, score) with rounded ranking — column-identical
    * to Bm25.oracleTopK / its DuckDB SQL twin. */
  def topKAll(k: Int = Bm25.K): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Bm25.QuerySet.map { case (qid, qtext) =>
      topK(qtext, k, rounded = true)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("score").desc, col("docID").asc)))
        .select(lit(qid).as("query"), col("rank"), col("docID"), col("score"))
    }.reduce(_ unionAll _).orderBy(col("query"), col("rank"))
  }
}
