package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Metrics aggregation parity (SURVEY.md §2.6 A1/A2): the reference's
  * MetricsCollector keeps per-operation {count, sum, min, max, errors}
  * (reference `src/metrics/metrics_collector.cpp:46-67`) with a nested
  * per-domain sub-aggregate (`:61-64,90-93`) — a hand-rolled two-level
  * rollup over mutex-guarded maps. Rebuilt as one declarative
  * `ROLLUP(event_type, user_bucket)` over the events table: Catalyst
  * plans it as a single expand+hash-agg with map-side partial
  * aggregation; at 100 TB it is one shuffle, no skew (event types are
  * few → the expand's NULL grouping rows aggregate map-side first).
  *
  * Column mapping: operation ≙ event_type, domain ≙ user_bucket
  * (user_id mod 10), elapsed-ms ≙ value, errors ≙ event_type='error'
  * rows (the reference counts failed ops the same way). */
object Metrics {

  def rollupMetrics(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("user_bucket", col("user_id") % 10)
      .rollup(col("event_type"), col("user_bucket"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value")), 4).as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("errors"))
      .orderBy(asc_nulls_first("event_type"), asc_nulls_first("user_bucket"))

  val rollupMetricsSql: String =
    """SELECT event_type, user_id % 10 AS user_bucket,
      |       CAST(count(*) AS BIGINT) AS n,
      |       round(sum(value), 4) AS sum_value,
      |       min(value) AS min_value, max(value) AS max_value,
      |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors
      |FROM events
      |GROUP BY ROLLUP (event_type, user_id % 10)
      |ORDER BY event_type ASC NULLS FIRST, user_bucket ASC NULLS FIRST""".stripMargin
}
