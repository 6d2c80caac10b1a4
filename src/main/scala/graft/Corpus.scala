package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus reader: maps the driver-generated `documents.parquet` onto the
  * engine's input shape (BASELINE.json `input_hint`):
  * `(repo, path, commit, lang, content)` + surrogate `docID`.
  *
  * This plays the role of the reference's `pages` table
  * (reference `src/database/database.cpp:31-34` —
  * `pages(id AUTOINCREMENT, url UNIQUE, content)`): `docID` ≙ the
  * autoincrement id (stable, drives rank tie-break), `path` ≙ `url`,
  * `content` ≙ `content`.
  *
  * The table is "Iceberg-shaped" partitioned Parquet behind this thin
  * reader — no Iceberg runtime jar ships in /opt/spark/jars (offline), so
  * the format is swappable here without touching any operator.
  */
object Corpus {

  /** Deterministic commit constant (FIXTURES.md §1). */
  val CommitConst = "refcommit0"

  /** The corpus in input_hint shape. Column pruning / predicate pushdown
    * flow through this projection to the parquet scan. */
  def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id").as("docID"),
        col("source").as("repo"),
        concat(col("source"), lit("/"), col("doc_id"), lit(".txt")).as("path"),
        lit(CommitConst).as("commit"),
        col("lang"),
        col("text").as("content"))

  /** Embeddings side table (similarity-search operators). */
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
}
