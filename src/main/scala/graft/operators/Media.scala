package graft.operators

import graft.Corpus
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat media as opaque `binary` payloads
  * with typed metadata, and run decode → feature-extract as a typed
  * mapPartitions batch pipeline.
  *
  * The container ships no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake (payload bytes stand in for decoded
  * samples). Everything AROUND the stub — the binary column, the batch
  * iteration shape, the fixed-dim feature schema, partitioning — is the
  * real Spark plumbing a production decode UDF would drop into.
  */
object Media {

  val HistBins = 16

  /** The corpus joined with a synthesized binary payload column
    * (payload = UTF-8 bytes of content — deterministic stand-in for an
    * image/audio blob ingested alongside text). */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Corpus.docs(spark, sfDir)
      .select(col("docID"), encode(col("content"), "UTF-8").as("payload"))

  /** STUB decode: a real implementation would parse the container format
    * and return decoded samples; the fake "decodes" the payload to its
    * own bytes. Replace this single function to go real. */
  def decodeStub(payload: Array[Byte]): Array[Byte] = payload

  final case class MediaFeatures(
      docID: Long, format: String, n_bytes: Long,
      width: Long, height: Long, hist: Array[Double])

  /** Per-row features via typed mapPartitions (the batch shape a Pandas
    * UDF / vectorized decoder would use): stub metadata (n_bytes, a
    * deterministic fake width/height) + a normalized HistBins-bin byte
    * histogram as the "embedding". */
  def mediaFeaturesDS(spark: SparkSession, sfDir: String) = {
    import spark.implicits._
    mediaTable(spark, sfDir).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val decoded = decodeStub(payload)
        val hist = new Array[Double](HistBins)
        var i = 0
        while (i < decoded.length) {
          hist((decoded(i) & 0xff) * HistBins / 256) += 1.0
          i += 1
        }
        val n = decoded.length.toLong
        if (n > 0) { var b = 0; while (b < HistBins) { hist(b) /= n; b += 1 } }
        MediaFeatures(id, "fake/raw", n, 16 + n % 64, 16 + (n / 64) % 64, hist)
      })
  }

  /** Driver-contract projection (SQL-checkable metadata columns; the
    * histogram is validated by unit tests against a Scala reference). */
  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame =
    mediaFeaturesDS(spark, sfDir)
      .toDF()
      .select(col("docID"), col("format"), col("n_bytes"),
        col("width"), col("height"))
      .orderBy(col("docID"))

  def mediaFeaturesSql: String =
    """SELECT doc_id AS docID, 'fake/raw' AS format,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(16 + octet_length(encode(text)) % 64 AS BIGINT) AS width,
      |  CAST(16 + (octet_length(encode(text)) // 64) % 64 AS BIGINT) AS height
      |FROM documents ORDER BY docID""".stripMargin
}
