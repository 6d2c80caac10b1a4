package graft

import graft.operators.{Bm25, Index, QueryEngine}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic main for the concurrent-serving investigation
  * (VERDICT r4 #1): against a prebuilt bench index, reports per-query
  * dictionary df (which engine path each bench query rides), per-query
  * latency, and sustained-QPS windows at a ladder of client-thread
  * counts with the child's own CPU utilization next to each — the gauge
  * that distinguishes core saturation from lock serialization.
  *
  * Usage: runMain graft.Probe <indexDir> [cpus]
  */
object Probe {

  private def ownJiffies(): Long = {
    val f = scala.io.Source.fromFile("/proc/self/stat")
    try { val p = f.mkString.split(" "); p(13).toLong + p(14).toLong }
    finally f.close()
  }

  def main(args: Array[String]): Unit = {
    val indexDir = args(0)
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe")
      .config("spark.sql.shuffle.partitions", 128)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft_spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // dictionary df per bench query term → which path each query takes
    val allTerms = Bm25.QuerySet.flatMap { case (_, q) =>
      graft.functions.Analyzer.queryTerms(q) }.distinct
    val dfm = Index.readDictionary(spark, indexDir)
      .filter(col("term").isin(allTerms: _*))
      .collect().groupBy(_.term).map { case (t, es) => t -> es.map(_.df).sum }
    Bm25.QuerySet.foreach { case (qid, q) =>
      val ts = graft.functions.Analyzer.queryTerms(q)
      val tds = ts.map(t => s"$t=${dfm.getOrElse(t, 0L)}").mkString(" ")
      println(s"[probe] $qid totalDf=${ts.map(dfm.getOrElse(_, 0L)).sum} $tds")
    }

    val engine = new QueryEngine(spark, Seq(indexDir),
      numRanges = math.max(4 * cpus, 32))
    Bm25.QuerySet.foreach { case (_, q) => engine.topK(q, rounded = true).collect() }
    // per-query median-of-5 latency
    Bm25.QuerySet.foreach { case (qid, q) =>
      val ts = (0 until 5).map { _ =>
        val s = System.nanoTime()
        engine.topK(q, rounded = true).collect()
        (System.nanoTime() - s) / 1e6
      }.sorted
      println(f"[probe] $qid p50=${ts(2)}%.1f ms")
    }

    // optional families against the same index (positional for phrase)
    if (args.contains("phrase")) {
      Bm25.PhraseQuerySet.foreach { case (_, q) =>
        engine.topKPhrase(q, rounded = true).collect() }
      Bm25.PhraseQuerySet.foreach { case (qid, q) =>
        val ts = (0 until 5).map { _ =>
          val s = System.nanoTime()
          engine.topKPhrase(q, rounded = true).collect()
          (System.nanoTime() - s) / 1e6
        }.sorted
        println(f"[probe] phrase $qid p50=${ts(2)}%.1f max=${ts.last}%.1f ms")
      }
    }
    if (args.contains("or")) {
      Bm25.QuerySet.foreach { case (_, q) =>
        engine.topKOr(q, rounded = true).collect() }
      Bm25.QuerySet.foreach { case (qid, q) =>
        val ts = (0 until 5).map { _ =>
          val s = System.nanoTime()
          engine.topKOr(q, rounded = true).collect()
          (System.nanoTime() - s) / 1e6
        }.sorted
        println(f"[probe] or $qid p50=${ts(2)}%.1f max=${ts.last}%.1f ms")
      }
    }

    // SQ8-vs-brute ANN latency at bench scale (args: ann <corpusDir>)
    if (args.contains("ann")) {
      import graft.operators.Similarity
      val corpusDir = args(args.indexOf("ann") + 1)
      val e = spark.read.parquet(s"$corpusDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      def med(n: Int)(body: => Unit): Double = {
        val ts = (0 until n).map { _ =>
          val s = System.nanoTime(); body; (System.nanoTime() - s) / 1e6
        }.sorted
        ts(ts.length / 2)
      }
      Similarity.bruteTopK(spark, corpusDir).collect() // warm
      val bruteMs = med(3)(Similarity.bruteTopK(spark, corpusDir).collect())
      val dim = e.select(size(col("embedding"))).head().getInt(0)
      val dims = Similarity.sq8Dims(e, dim)
      val mns = dims.map(_._2).toArray
      val steps = dims.map(_._3).toArray
      val codesDir = "/dev/shm/graft/probe_sq8_codes"
      Similarity.sq8Codes(e, mns, steps)
        .write.mode("overwrite").parquet(codesDir)
      val codes = spark.read.parquet(codesDir)
      Similarity.sq8Query(e, codes, mns, steps).collect() // warm
      val sq8Ms = med(3)(Similarity.sq8Query(e, codes, mns, steps).collect())
      println(f"[probe] ann brute=$bruteMs%.1f ms sq8=$sq8Ms%.1f ms")
    }

    // sustained windows at a thread ladder
    for (nt <- Seq(1, 2, 4, 8, 16)) {
      val done = new java.util.concurrent.atomic.AtomicLong(0L)
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(nt)
      val o0 = ownJiffies()
      val t0 = System.nanoTime()
      try {
        val futs = (0 until nt).map { t =>
          pool.submit(new Runnable {
            def run(): Unit = {
              var i = t
              while (!stop.get()) {
                val (_, q) = Bm25.QuerySet(i % Bm25.QuerySet.size)
                engine.topK(q, rounded = true).collect()
                done.incrementAndGet(); i += 1
              }
            }
          })
        }
        Thread.sleep(6000); stop.set(true)
        futs.foreach(_.get())
      } finally pool.shutdown()
      val wall = (System.nanoTime() - t0) / 1e9
      val cores = (ownJiffies() - o0) / 100.0 / wall
      println(f"[probe] threads=$nt qps=${done.get() / wall}%.1f cpuCores=$cores%.1f")
    }
    spark.stop()
  }
}
