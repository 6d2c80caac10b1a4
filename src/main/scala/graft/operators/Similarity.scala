package graft.operators

import graft.Corpus
import graft.functions.Native
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (vec_id, embedding:
  * array<float>, label).
  *
  * Two paths, same contract:
  *   - [[bruteTopK]]: exact cosine top-k per query — O(Q·N) broadcast
  *     join; the correctness oracle, and still the right plan when Q·N
  *     is small (broadcast the queries, scan the corpus once).
  *   - [[lshTopK]]: random-hyperplane LSH bucketing — the scale path;
  *     queries probe only their own signature bucket (plus a multiprobe
  *     ring at hamming 1), so the scan cost per query drops from N to
  *     the bucket population. Approximate by construction: recall vs
  *     [[bruteTopK]] is measured in tests, not assumed.
  *
  * All cosines computed in double; externally-compared outputs round to
  * 4 decimals and rank by the rounded value (same contract as BM25).
  */
object Similarity {

  val K = 10
  val QueryIds: Seq[Long] = Seq(0L, 1L, 2L, 3L, 4L)

  /** Few planes + a hamming-≤2 multiprobe ring: 64 buckets, 22 probed —
    * candidate set ≈ 1/3 of the corpus per query at any scale (the
    * recall/cost knob; raise planes as the corpus grows). */
  val Hyperplanes = 6

  /** Deterministic pseudo-random hyperplanes: component j of plane p is
    * ±1 by bit parity of a splitmix-style integer hash of (p, j). No RNG
    * state — executors recompute identically. */
  def planeSign(p: Int, j: Int): Double = {
    var z = p.toLong * 0x9E3779B97F4A7C15L + j.toLong * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    if (java.lang.Long.bitCount(z) % 2 == 0) 1.0 else -1.0
  }

  /** LSH signature column: bit p of the signature = sign of ⟨v, plane_p⟩. */
  def signatureCol(v: Column, dim: Int): Column =
    (0 until Hyperplanes).map { p =>
      val dot = aggregate(
        zip_with(v, array((0 until dim).map(j => lit(planeSign(p, j))): _*),
          (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, shiftleft(lit(1), p)).otherwise(lit(0))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Exact cosine top-k neighbors for each query vec_id (self excluded):
    * (query_id, rank, vec_id, cos) ranked by (cos desc, vec_id asc) on
    * the 4-decimal-rounded cosine. */
  def bruteTopK(spark: SparkSession, sfDir: String,
                queryIds: Seq[Long] = QueryIds, k: Int = K): DataFrame = {
    val e = Corpus.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(Native.cosine(col("qv"), col("embedding")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  def bruteTopKSql(queryIds: Seq[Long] = QueryIds, k: Int = K): String = {
    val ids = queryIds.mkString(", ")
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
       |           WHERE vec_id IN ($ids)),
       |scored AS (
       |  SELECT q.query_id, e.vec_id,
       |         round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
       |               CAST(e.embedding AS DOUBLE[])), 4) AS cos
       |  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
       |)
       |SELECT query_id, rank, vec_id, cos FROM (
       |  SELECT query_id, vec_id, cos,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos DESC, vec_id ASC) AS rank
       |  FROM scored
       |) WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** IVF (inverted-file) ANN: partition vectors into nlist Voronoi cells
    * around k-means centroids; a query scans only the nprobe nearest
    * cells. The 100 TB shape: the centroid table is tiny (broadcast), the
    * corpus is hash-partitioned by cell → a probe is a partition-pruned
    * scan + exact rerank, no all-pairs anything.
    *
    * Deterministic training, no RNG state: centroids init from evenly
    * spaced vec_ids (corpus order), then [[IvfIters]] Lloyd rounds as
    * groupBy-avg DataFrame jobs (each round: one broadcast join + one
    * shuffle). Assignment ties break on lower centroid id via the
    * (dist asc, cid asc) ordering. */
  val IvfNlist = 16
  val IvfNprobe = 4
  val IvfIters = 3

  /** (vec_id, embedding, cell) assignment plus the centroid table
    * (cid, centroid: array<double>). */
  def ivfModel(spark: SparkSession, sfDir: String,
               nlist: Int = IvfNlist, iters: Int = IvfIters): (DataFrame, DataFrame) = {
    val e = Corpus.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val n = e.count()
    val step = math.max(1L, n / nlist)
    val seedIds = (0 until nlist).map(i => i * step)
    var cents = e.filter(col("vec_id").isin(seedIds: _*))
      .orderBy(col("vec_id")).limit(nlist)
      .select((row_number().over(Window.orderBy(col("vec_id"))) - 1).as("cid"),
        transform(col("embedding"), _.cast("double")).as("centroid"))
    val wAsg = Window.partitionBy(col("vec_id"))
      .orderBy(col("dist").asc, col("cid").asc)
    def assign(c: DataFrame): DataFrame =
      e.crossJoin(broadcast(c))
        .withColumn("dist",
          aggregate(zip_with(col("embedding"), col("centroid"),
            (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
            lit(0.0), (acc, v) => acc + v))
        .withColumn("rn", row_number().over(wAsg))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("embedding"), col("cid").as("cell"))
    val dim = Corpus.embeddings(spark, sfDir)
      .select(size(col("embedding"))).head().getInt(0)
    for (_ <- 0 until iters) {
      val asg = assign(cents)
      // new centroid = element-wise mean of the cell's members
      val sums = asg
        .select(col("cell"), transform(col("embedding"), _.cast("double")).as("v"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("cnt"),
          array((0 until dim).map(j =>
            sum(element_at(col("v"), j + 1))): _*).as("vsum"))
      cents = sums.select(col("cell").as("cid"),
        transform(col("vsum"), s => s / col("cnt")).as("centroid"))
    }
    (assign(cents), cents)
  }

  /** IVF approximate top-k: for each query, rank exact cosine within the
    * nprobe nearest cells only. Same output shape as [[bruteTopK]]. */
  def ivfTopK(spark: SparkSession, sfDir: String,
              queryIds: Seq[Long] = QueryIds, k: Int = K,
              nprobe: Int = IvfNprobe): DataFrame = {
    val (asg, cents) = ivfModel(spark, sfDir)
    val q = asg.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    // nprobe nearest centroids per query (tiny: queries × nlist)
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("dist").asc, col("cid").asc)
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("dist",
        aggregate(zip_with(col("qv"), col("centroid"),
          (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (acc, v) => acc + v))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("cid").as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    asg.join(broadcast(probes),
        asg("cell") === probes("cell") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(Native.cosine(col("qv"), col("embedding")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** LSH-bucketed approximate top-k: probe the query's bucket and all
    * buckets at hamming distance 1 (multiprobe ring). Same output shape
    * as [[bruteTopK]]; rank within probed candidates. */
  def lshTopK(spark: SparkSession, sfDir: String,
              queryIds: Seq[Long] = QueryIds, k: Int = K): DataFrame = {
    val dim = Corpus.embeddings(spark, sfDir)
      .select(size(col("embedding"))).head().getInt(0)
    val e = Corpus.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        signatureCol(col("embedding"), dim).as("sig"))
    val masks = 0 +: (0 until Hyperplanes).map(1 << _) ++:
      (for (i <- 0 until Hyperplanes; j <- i + 1 until Hyperplanes)
        yield (1 << i) | (1 << j))
    val probes = masks.map(m => col("qsig").bitwiseXOR(lit(m)))
    val q = e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("sig").as("qsig"))
      .withColumn("probe", explode(array(probes: _*)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    // a vector's sig equals at most one probe value (probes are distinct),
    // so the join cannot duplicate (query, vec) pairs
    e.join(broadcast(q),
        col("sig") === col("probe") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(Native.cosine(col("qv"), col("embedding")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }
}
