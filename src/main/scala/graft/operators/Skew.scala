package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.Q
import graft.sources.Tables

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
object Skew extends DetRounding {

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

  // -------------------------------------------------------------- q151
  /** Salted two-phase per-supplier quantity profile — the hot-key
    * aggregation discipline promoted into the oracle-gated catalog:
    * the DuckDB twin is the PLAIN one-pass GROUP BY, so the gate
    * proves salt-then-merge ≡ direct for the whole algebraic family
    * (count/sum/min/max merge; mean re-derives from merged sums —
    * q104's merge-≡-recompute contract, applied to intra-key
    * parallelism instead of shard rollup).
    *
    * When this matters at 100 TB: Catalyst's map-side partial
    * aggregate already contracts repeats WITHIN a partition, but the
    * final aggregate still hash-routes each key to ONE reducer — a key
    * holding 30% of the corpus makes that reducer the straggler, and
    * AQE's runtime skew split covers joins, not aggregations. Salting
    * the partial stage by a deterministic row-attribute hash (never
    * rand() — task retries must reproduce the salt) caps any reducer
    * at 1/`buckets` of the hot key before the ≤`buckets`-row merge.
    *
    * Exactness: l_quantity is integer-valued, so double sums are exact
    * in ANY grouping/order and the mean's one divide matches bit-for-
    * bit — the salted split introduces no drift to round away (the
    * terminal round is presentation only, shared by both sides). */
  /** Open-knob salted profile over ANY frame (count/sum/min/max + the
    * derived mean), shared by q151 and [[graft.Graft.saltedProfile]].
    * Output columns: `(key, n_rows, sum_<v>, min_<v>, max_<v>,
    * avg_<v>)` — the mean is UNROUNDED here; presentation rounding is
    * the caller's. */
  def saltedProfile(df: DataFrame, key: String, valueCol: String,
      buckets: Int, saltFrom: Column): DataFrame = {
    require(buckets > 1 && buckets <= 4096,
      s"need 1 < buckets <= 4096 (got $buckets)")
    val partial = df
      .withColumn("__salt", pmod(abs(hash(saltFrom)), lit(buckets)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("pn"), sum(col(valueCol)).as("ps"),
        min(col(valueCol)).as("pmin"), max(col(valueCol)).as("pmax"))
    partial.groupBy(col(key))
      .agg(sum(col("pn")).as("n_rows"), sum(col("ps")).as(s"sum_$valueCol"),
        min(col("pmin")).as(s"min_$valueCol"), max(col("pmax")).as(s"max_$valueCol"))
      .withColumn(s"avg_$valueCol", col(s"sum_$valueCol") / col("n_rows"))
  }

  private def q151(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    saltedProfile(
      Tables.lineitem(spark, dir)
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_quantity"),
      key = "l_suppkey", valueCol = "l_quantity", buckets = 16,
      saltFrom = struct($"l_orderkey", $"l_linenumber"))
      .select($"l_suppkey", $"n_rows",
        $"sum_l_quantity".as("sum_qty"), $"min_l_quantity".as("min_qty"),
        $"max_l_quantity".as("max_qty"),
        round($"avg_l_quantity", 6).as("avg_qty"))
      .orderBy($"l_suppkey")
  }

  /** The oracle is deliberately the UNSALTED spelling. */
  private val q151Sql: String =
    """SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_rows,
      |       sum(l_quantity) AS sum_qty,
      |       min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
      |       round(sum(l_quantity) / count(*), 6) AS avg_qty
      |FROM lineitem
      |GROUP BY 1
      |ORDER BY l_suppkey""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q151_salted_agg", q151, Some(q151Sql)),
  )
}
