package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine catalog entry.
  *
  * `run` is the Spark-first implementation (DataFrame/Dataset algebra —
  * Catalyst optimizes, Tungsten executes). `oracle`, when present, is a
  * semantically-equivalent ANSI SQL statement runnable by DuckDB against
  * the same parquet tables; the driver hash-compares the two results, so
  * every computed column must carry the SAME alias on both sides and both
  * sides must impose the same deterministic ORDER BY over non-null keys
  * (DuckDB defaults to NULLS LAST, Spark to NULLS FIRST).
  *
  * Determinism rules used throughout the catalog:
  *  - double-valued aggregates are `round`-ed (2–6 dp) on both sides so
  *    summation-order ulp drift cannot flip the hash;
  *  - sums of integer columns are CAST to BIGINT in the oracle (DuckDB
  *    promotes integer sums to HUGEINT, Spark keeps LongType);
  *  - timestamp arithmetic runs on epoch microseconds (`unix_micros` /
  *    `epoch_us`) — both engines store micros for these tables;
  *  - no `current_timestamp()`/`rand()` in oracle-checked queries.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)
