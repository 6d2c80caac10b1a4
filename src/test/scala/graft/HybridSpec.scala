package graft

import graft.operators.{Bm25, Hybrid, Index, QueryEngine}
import graft.operators.Index.BuildParams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.reflect.io.Directory

/** Gate for hybrid (BM25 + embedding-cosine) RRF retrieval: the fused
  * frame must equal an INDEPENDENT driver-side construction of both legs
  * and the fusion — lexical ranks from the brute-force OR scorer rounded
  * and re-ranked in plain Scala, semantic ranks from a hand-rolled cosine
  * over the collected embeddings (same fold order as the native kernel),
  * RRF fused with the same fixed-order sum. */
class HybridSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  private val sfDir = SparkFixture.Sf0001
  private val indexDir = "target/test-index-hybrid-sf0001"
  private val params = BuildParams(numBuckets = 8, saltThreshold = 50,
    saltChunk = 64, segmentSize = 128, partitions = 4)

  private lazy val engine: QueryEngine = {
    new Directory(new java.io.File(indexDir)).deleteRecursively()
    Index.build(spark, sfDir, indexDir, params)
    new QueryEngine(spark, Seq(indexDir))
  }

  // same association order as Native.CosineSimilarity.nullSafeEval
  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / math.sqrt(na) / math.sqrt(nb)
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val emb: Map[Long, Array[Float]] =
    Corpus.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  /** Independent construction of the fused top-k rows for one query. */
  private def expectedRows(qtext: String, vid: Long): Seq[(Int, Long, Double)] = {
    // lexical leg: ALL OR matches, rounded re-rank, top Depth
    val lexAll = Bm25.oracleTopKOrExact(spark, sfDir, qtext, k = 1 << 20)
      .collect().map(r => (r.getLong(0), QueryEngine.r4(r.getDouble(1))))
    val brank = lexAll.sortBy(t => (-t._2, t._1)).take(Hybrid.Depth)
      .zipWithIndex.map { case ((d, _), i) => d -> (i + 1) }.toMap
    // semantic leg: rounded cosine over every vector, top Depth
    val qv = emb(vid)
    val arank = emb.toSeq
      .map { case (id, v) => (id, QueryEngine.r4(cosine(qv, v))) }
      .sortBy(t => (-t._2, t._1)).take(Hybrid.Depth)
      .zipWithIndex.map { case ((d, _), i) => d -> (i + 1) }.toMap
    // RRF fusion: lexical + semantic, absent leg = exact +0.0
    val fused = (brank.keySet ++ arank.keySet).toSeq.map { d =>
      val l = brank.get(d).map(r => 1.0 / (Hybrid.RrfC + r)).getOrElse(0.0)
      val s = arank.get(d).map(r => 1.0 / (Hybrid.RrfC + r)).getOrElse(0.0)
      (d, r6(l + s))
    }
    fused.sortBy(t => (-t._2, t._1)).take(Hybrid.K)
      .zipWithIndex.map { case ((d, rrf), i) => (i + 1, d, rrf) }
  }

  test("hybrid RRF == independent two-leg construction (every hybrid query)") {
    val out = Hybrid.hybridTopK(spark, sfDir, engine).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    for ((qid, qtext, vid) <- Hybrid.HybridQuerySet) {
      val got = out.getOrElse(qid, Array.empty).sortBy(_._2)
        .map(t => (t._2, t._3, t._4)).toSeq
      val want = expectedRows(qtext, vid)
      assert(got == want, s"$qid '$qtext' vec=$vid:\n want=$want\n got =$got")
    }
  }

  test("pure-semantic fallback: absent text query ranks by cosine alone") {
    // h04's text leg is empty, so fused rank order == semantic rank order
    // and every rrf is exactly 1/(C + arank)
    val rows = Hybrid.hybridTopK(spark, sfDir, engine)
      .filter(col("query") === "h04").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    assert(rows.length == Hybrid.K)
    val vid = Hybrid.HybridQuerySet.find(_._1 == "h04").get._3
    val qv = emb(vid)
    val semTop = emb.toSeq
      .map { case (id, v) => (id, QueryEngine.r4(cosine(qv, v))) }
      .sortBy(t => (-t._2, t._1)).take(Hybrid.K).map(_._1)
    assert(rows.map(_._2).toSeq == semTop)
    rows.zipWithIndex.foreach { case ((_, _, rrf), i) =>
      assert(rrf == r6(1.0 / (Hybrid.RrfC + i + 1)), s"rank ${i + 1}")
    }
  }

  test("fusion favors two-leg agreement: both-leg doc beats equal single-leg ranks") {
    // structural property of RRF with C=60, depth=20: a doc ranked d in
    // BOTH legs scores 2/(60+d), strictly above any single-leg doc's
    // 1/(60+1) once d <= 58 — i.e. agreement dominates at these depths
    assert(2.0 / (Hybrid.RrfC + Hybrid.Depth) > 1.0 / (Hybrid.RrfC + 1))
  }
}
