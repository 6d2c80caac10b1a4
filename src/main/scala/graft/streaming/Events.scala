package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Event-stream analytics over the `events` table (event_id, ts,
  * user_id, event_type, value, props) — the Structured-Streaming
  * descendants of the reference's periodic metrics reporter thread
  * (reference `src/crawler/crawler.cpp:50-71`: a 10 s wall-clock tick
  * over mutex-guarded counter maps, SURVEY.md §2.10 T2), upgraded to
  * event-time processing with watermarks.
  *
  * Both operators exist in a streaming and a batch formulation over the
  * SAME aggregation expressions; the streaming run (finite, replayed
  * with Trigger.AvailableNow) must equal the batch run — asserted in
  * StreamingSpec and, via the batch twin, against the DuckDB oracle.
  */
object Events {

  val SessionGap = "30 minutes"
  val WindowSize = "1 hour"
  /** Event-time watermark: late events beyond this are dropped in the
    * streaming path (none exist in the deterministic corpus). */
  val Watermark = "1 hour"

  private def eventsPath(sfDir: String) = s"$sfDir/events.parquet"

  /** The source stores ts as TIMESTAMP_NTZ; event-time watermarks need
    * TimestampType, so processing runs on a cast (session TZ is pinned
    * to UTC → value-preserving) and outputs cast back to NTZ so the
    * external comparison stays naive-timestamp. */
  private def toLtz(df: DataFrame): DataFrame =
    df.withColumn("ts", col("ts").cast("timestamp"))

  private def eventsBatch(spark: SparkSession, sfDir: String): DataFrame =
    toLtz(spark.read.parquet(eventsPath(sfDir)))

  /** The events table as a bounded STREAM (file source; schema from a
    * one-off batch footer read — cheap, metadata only). */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = spark.read.parquet(eventsPath(sfDir)).schema
    // the file stream source wants a DIRECTORY; events.parquet is a
    // single file, so stream the parent dir with a glob filter
    toLtz(spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir))
  }

  // ---------------------------------------------------- tumbling window

  private def windowedAgg(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), window(col("ts"), WindowSize))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("event_type"),
        col("window.start").cast("timestamp_ntz").as("wstart"),
        col("n"), col("sum_value"))

  /** STREAMING tumbling-window counts/sums per event_type, replayed to
    * completion into a memory sink. Complete output mode because the
    * replay is finite and the verified contract is the full history; an
    * always-on deployment would use append + the watermark. */
  def windowedCountsStreaming(spark: SparkSession, sfDir: String): DataFrame = {
    spark.catalog.dropTempView("graft_events_windowed")
    val q = windowedAgg(eventsStream(spark, sfDir).withWatermark("ts", Watermark))
      .writeStream
      .queryName("graft_events_windowed")
      .outputMode("complete")
      .format("memory")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table("graft_events_windowed")
      .orderBy(col("event_type"), col("wstart"))
  }

  /** Batch twin of [[windowedCountsStreaming]] (same agg expressions). */
  def windowedCountsBatch(spark: SparkSession, sfDir: String): DataFrame =
    windowedAgg(eventsBatch(spark, sfDir))
      .orderBy(col("event_type"), col("wstart"))

  val windowedSql: String =
    """SELECT event_type, date_trunc('hour', ts) AS wstart,
      |       CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY event_type, wstart""".stripMargin

  // ------------------------------------------------------ session window

  private def sessionAgg(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), SessionGap))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("session_end"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").cast("timestamp_ntz").as("session_start"),
        col("session_end").cast("timestamp_ntz").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Per-user sessionization: events within [[SessionGap]] of the
    * previous event merge into one session (Spark session_window —
    * streaming-capable stateful aggregation). Batch formulation; the
    * streaming run (append mode + watermark) is exercised in
    * StreamingSpec, where its emitted sessions must be exactly the
    * batch sessions that closed before the final watermark. */
  def sessionsBatch(spark: SparkSession, sfDir: String): DataFrame =
    sessionAgg(eventsBatch(spark, sfDir))
      .orderBy(col("user_id"), col("session_start"))

  /** STREAMING sessionization, append mode: only sessions sealed by the
    * watermark are emitted (the streaming-correctness contract — a
    * session still open when the bounded replay ends is withheld). */
  def sessionsStreaming(spark: SparkSession, sfDir: String): DataFrame = {
    spark.catalog.dropTempView("graft_events_sessions")
    val q = sessionAgg(eventsStream(spark, sfDir).withWatermark("ts", Watermark))
      .writeStream
      .queryName("graft_events_sessions")
      .outputMode("append")
      .format("memory")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table("graft_events_sessions")
      .orderBy(col("user_id"), col("session_start"))
  }

  /** DuckDB twin of [[sessionsBatch]]: gaps-and-islands. Break when the
    * gap is ≥ the session gap (Spark merges strictly-inside events:
    * next_ts < last_ts + gap). */
  val sessionsSql: String =
    """WITH x AS (
      |  SELECT user_id, event_id, ts, value,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
      |              THEN 1 ELSE 0 END AS brk
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), y AS (
      |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM x
      |)
      |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       round(sum(value), 4) AS sum_value
      |FROM y GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin
}
