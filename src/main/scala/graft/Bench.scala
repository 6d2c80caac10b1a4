package graft

import graft.operators.{Bm25, Index, QueryEngine}
import graft.operators.Index.BuildParams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.reflect.io.Directory

/** Benchmark main (driver contract; BASELINE.md).
  *
  * Measures the two authoritative metrics (BASELINE.json):
  *   1. index-build throughput (docs/sec) over a deterministically
  *      replicated copy of the sf corpus (env SPARK_GRAFT_REPL, so the
  *      build is compute-bound rather than job-overhead-bound), and
  *   2. BM25 top-k query latency p50/p95 over the fixed query set,
  * at TWO parallelism levels on the SAME input — local[N] and local[4N]
  * (sandbox stand-in for N vs 4N executors; no real cluster here) — and
  * reports throughput scaling efficiency = thr(4N) / (4 × thr(N)).
  *
  * Prints ONE JSON line. Env knobs:
  *   SPARK_GRAFT_SF_DIR   corpus dir       (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_CPUS     main level 4N    (default 32)
  *   SPARK_GRAFT_SCALE_N  small level N    (default CPUS/4)
  *   SPARK_GRAFT_REPL     corpus replication factor (default 20)
  *   SPARK_GRAFT_SCALING  "0" to skip the N-level session (default on)
  */
object Bench {

  final case class SessionResult(
      docs: Long, buildSec: Double, docsPerSec: Double,
      perQueryMs: Seq[(String, Double)], p50Ms: Double, p95Ms: Double)

  private def pct(sorted: Seq[Double], p: Double): Double =
    if (sorted.isEmpty) 0.0
    else sorted(math.min(sorted.length - 1, math.ceil(p * sorted.length).toInt - 1).max(0))

  private def newSession(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Deterministic R-fold corpus replication (doc_id offset per replica)
    * written once and shared by both parallelism levels. */
  private def prepareCorpus(sfDir: String, repl: Int): String = {
    val out = s"/tmp/graft/bench_corpus_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}_x$repl"
    if (!new java.io.File(s"$out/documents.parquet/_SUCCESS").exists()) {
      val spark = newSession(8)
      val src = spark.read.parquet(s"$sfDir/documents.parquet")
      val reps = (0 until repl).map { i =>
        src.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
      }.reduce(_ unionAll _)
      reps.repartition(32).write.mode("overwrite")
        .parquet(s"$out/documents.parquet")
      spark.stop()
    }
    out
  }

  private def runLevel(cpus: Int, corpusDir: String, reps: Int = 3): SessionResult = {
    val spark = newSession(cpus)
    val indexDir = s"/tmp/graft/bench_index_c$cpus"
    new Directory(new java.io.File(indexDir)).deleteRecursively()
    val params = BuildParams(partitions = math.max(4 * cpus, 32))
    val t0 = System.nanoTime()
    Index.build(spark, corpusDir, indexDir, params)
    val buildSec = (System.nanoTime() - t0) / 1e9
    val docs = spark.read.parquet(s"$indexDir/docstats").count()
    val engine = new QueryEngine(spark, indexDir, numRanges = math.max(4 * cpus, 32))
    // warmup pass (JIT + parquet footer caches), then `reps` timed passes;
    // per query keep the median rep
    Bm25.QuerySet.foreach { case (_, q) => engine.topK(q, rounded = true).collect() }
    val perQuery = Bm25.QuerySet.map { case (qid, q) =>
      val times = (0 until reps).map { _ =>
        val s = System.nanoTime()
        engine.topK(q, rounded = true).collect()
        (System.nanoTime() - s) / 1e6
      }.sorted
      qid -> times(times.length / 2)
    }
    spark.stop()
    val lat = perQuery.map(_._2).sorted
    SessionResult(docs, buildSec, docs / buildSec, perQuery,
      pct(lat, 0.50), pct(lat, 0.95))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val scaleN = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", (cpus / 4).max(1).toString).toInt
    val repl = sys.env.getOrElse("SPARK_GRAFT_REPL", "20").toInt
    val scaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") != "0"

    val corpusDir = prepareCorpus(sfDir, repl)
    // N first (also serves as JIT warmup for the 4N run — bias noted in
    // BENCH.md; the warmup query pass inside each level evens query JIT)
    val small = if (scaling) Some(runLevel(scaleN, corpusDir)) else None
    val main = runLevel(cpus, corpusDir)

    val qs = main.perQueryMs
      .map { case (k, ms) => s""""$k":${ms / 1e3}""" }.mkString("{", ",", "}")
    val totalSec = main.buildSec + main.perQueryMs.map(_._2).sum / 1e3
    val scalingJson = small.map { s =>
      val eff = main.docsPerSec / (s.docsPerSec * (cpus.toDouble / scaleN))
      f""","scaling":{"n_cpus":$scaleN,"n4_cpus":$cpus,"docs":${s.docs},"build_sec_n":${s.buildSec}%.3f,"build_sec_4n":${main.buildSec}%.3f,"docs_per_sec_n":${s.docsPerSec}%.1f,"docs_per_sec_4n":${main.docsPerSec}%.1f,"efficiency":$eff%.3f,"query_p50_ms_n":${s.p50Ms}%.1f,"query_p50_ms_4n":${main.p50Ms}%.1f}"""
    }.getOrElse("")
    println(
      s"""{"metric":"index-build docs/sec + BM25 query p50/p95 (indexed engine)","value":$totalSec,"unit":"sec","queries":$qs,"sf":"$sfDir","docs":${main.docs},"replicate":$repl,"build_sec":${main.buildSec},"build_docs_per_sec":${main.docsPerSec},"query_p50_ms":${main.p50Ms},"query_p95_ms":${main.p95Ms}$scalingJson}""")
  }
}
