package graft

import org.apache.spark.sql.DataFrame

/** Side-channel for oracle-gating hash-defined operators (VERDICT r1 #3).
  *
  * Operators whose DEFINING step is a hash (simhash/minhash signatures,
  * LSH plane signs, winnowing hashes, k-means assignment) cannot be
  * re-derived in ANSI SQL — but everything DOWNSTREAM of the hash
  * (banding, bucket joins, hamming, probe selection, rerank, ranking) is
  * pure relational algebra. So the Spark query materializes the hash
  * artifact as a small parquet here, and the DuckDB oracle recomputes the
  * whole downstream pipeline from that artifact + the input tables. The
  * hash step itself stays gated by the Spark-side property tests
  * (banded == brute, recall floors, winnowing invariants).
  *
  * The dir is fixed (not per-sf): the driver's Verify pass runs one
  * scale factor at a time and DuckDB reads immediately after, so
  * overwrite-per-run is safe.
  */
object OracleSide {

  val Dir = "/tmp/graft/oracle_side"

  /** Write one artifact as a single parquet file under [[Dir]]. */
  def dump(name: String, df: DataFrame): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(s"$Dir/$name")

  /** DuckDB read_parquet glob for an artifact written by [[dump]]. */
  def glob(name: String): String = s"read_parquet('$Dir/$name/*.parquet')"
}
