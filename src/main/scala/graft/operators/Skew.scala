package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for hot keys (SCALE.md "Joins"): AQE's
  * runtime skew-split covers sort-merge joins, but a key so hot that
  * one reducer drowns needs layout-level salting — these helpers encode
  * the two standard patterns as reusable, tested operators.
  *
  * Salts derive from a deterministic hash of stable row attributes (not
  * rand()): re-execution of a failed task reproduces the same salt, so
  * the operators stay idempotent under retries — the same reason the
  * engine's oracle queries avoid nondeterminism anywhere.
  */
object Skew {

  /** Two-phase salted aggregation: partial sums/counts over
    * (key, salt) spread a hot key across `buckets` reducers, the final
    * pass combines the ≤`buckets` partials per key. Algebraic aggs
    * only — exactly the partial/final split Catalyst uses, made
    * explicit one level deeper. */
  def saltedSumCount(
      df: DataFrame,
      key: String,
      valueCol: String,
      buckets: Int,
      saltFrom: Column): DataFrame = {
    val salted = df.withColumn("__salt", pmod(abs(hash(saltFrom)), lit(buckets)))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(
        sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n"))
  }

  /** Salted equi-join for a skewed LEFT side: the left side gets a
    * deterministic salt in [0, buckets); the (small) right side is
    * replicated across every salt value, so the hot key's rows spread
    * over `buckets` join tasks instead of one. Semantically identical
    * to `large.join(small, key)` (inner). */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      buckets: Int,
      saltFrom: Column): DataFrame = {
    val saltedLarge = large.withColumn("__salt", pmod(abs(hash(saltFrom)), lit(buckets)))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    saltedLarge
      .join(replicatedSmall, Seq(key, "__salt"))
      .drop("__salt")
  }
}
