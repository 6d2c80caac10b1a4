package graft.streaming

import graft.Corpus
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, Trigger}

/** Stateful streaming exact-dedup — `mapGroupsWithState` over a
  * `KeyValueGroupedDataset`, the custom-state streaming primitive the
  * rest of the streaming tier (windows, session_window, foreachBatch
  * deltas) doesn't exercise.
  *
  * One state cell per content hash holds the minimum docID seen so far;
  * every trigger emits the running representative for the keys it
  * touched (Update mode). min is order-independent, so after a bounded
  * replay the final per-key state equals the batch groupBy-min whatever
  * the micro-batch arrival order — the finished stream reproduces
  * [[graft.operators.Dedup.exactDedup]] exactly, and the entry shares
  * its DuckDB oracle.
  *
  * Scale notes: state is one (sha256, long) pair per DISTINCT document
  * content, hash-partitioned by key — the streaming analogue of the
  * batch one-shuffle dedup; an always-on deployment would add a state
  * TTL (GroupStateTimeout) for retired content generations.
  */
object StreamingDedup {

  /** Replay the documents table as a bounded stream, dedup statefully,
    * and return the batch contract frame
    * (docID, content_sha, rep_docID, is_dup). */
  def exactDedupStreaming(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val src = s"$sfDir/documents.parquet"
    val schema = spark.read.parquet(src).schema
    // Directory-style corpus (documents.parquet/part-*.parquet, as the
    // bench writes): stream from the table path itself — pathGlobFilter
    // on the parent matched LEAF filenames only, streaming ZERO rows
    // (ADVICE r2). Single-file corpus (as the testdata ships): the file
    // source requires a directory basePath, so keep the parent+glob form.
    val stream =
      if (new java.io.File(src).isDirectory)
        spark.readStream.schema(schema).parquet(src)
      else
        spark.readStream.schema(schema)
          .option("pathGlobFilter", "documents.parquet")
          .parquet(sfDir)
    val hashed = stream
      .select(col("doc_id").as("docID"), sha2(col("text"), 256).as("sha"))
      .as[(Long, String)]
    val reps = hashed.groupByKey(_._2)
      .mapGroupsWithState[Long, (String, Long)](GroupStateTimeout.NoTimeout) {
        (sha, rows, state) =>
          val batchMin = rows.map(_._1).min
          val rep = if (state.exists) math.min(state.get, batchMin) else batchMin
          state.update(rep)
          (sha, rep)
      }
    spark.catalog.dropTempView("graft_dedup_reps")
    val q = reps.toDF("content_sha", "rep_docID").writeStream
      .queryName("graft_dedup_reps")
      .outputMode("update")
      .format("memory")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // the state update stream is monotone per key → final rep = min of
    // the emitted updates
    val finalReps = spark.table("graft_dedup_reps")
      .groupBy(col("content_sha")).agg(min(col("rep_docID")).as("rep_docID"))
    Corpus.docs(spark, sfDir)
      .select(col("docID"), sha2(col("content"), 256).as("content_sha"))
      .join(finalReps, "content_sha")
      .select(col("docID"), col("content_sha"), col("rep_docID"),
        (col("docID") =!= col("rep_docID")).as("is_dup"))
      .orderBy(col("docID"))
  }
}
