package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.Q
import graft.sources.Tables

/** Exact financial allocation — distributing a parent-level amount
  * across child rows so the parts sum back to the whole TO THE CENT.
  * The warehouse operation behind discount proration, cost allocation,
  * and revenue splitting; the reference's data plane keeps money-like
  * doubles (lambda-sample stores raw sensor doubles and blends them
  * with fixed 35/65 integer weights, analyzer/Analyzer.scala:144-147 —
  * the same never-lose-a-unit discipline applied here to cents).
  *
  * Everything is INTEGER arithmetic: amounts become cents once
  * (round(x·100) — the only float op), shares are `(R·wᵢ) div W` with
  * the shortfall repaired by the LARGEST-REMAINDER rule (Hamilton
  * apportionment): the `R − Σ floor` leftover cents go one each to the
  * rows with the largest `(R·wᵢ) mod W`, ties to the lowest line
  * number. Exactness is structural — no row of output carries a float,
  * so the oracle hash needs no rounding anywhere.
  */
object Allocation extends DetRounding {

  // -------------------------------------------------------------- q177
  /** Prorate each order's header total across its lineitems in
    * proportion to extended price, largest-remainder repaired —
    * per-lineitem `alloc_cents` with Σ per order ≡ the order total in
    * cents (AllocationSpec asserts the identity row-for-row against a
    * driver recompute).
    *
    * Shape: one equi-join on orderkey (broadcast-or-shuffle by size),
    * one per-order window to rank remainders — per-key width is basket
    * size (≤ 7 here, a per-entity constant), so the rank never sees a
    * corpus-scale partition. 64-bit safety: R·wᵢ ≤ order-total-cents ×
    * line-cents ≈ 5·10⁷ × 5·10⁶ = 2.5·10¹⁴ ≪ 2⁶³. */
  private[graft] def prorate(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val li = lineitem.select(col("l_orderkey"), col("l_linenumber"),
      round(col("l_extendedprice") * 100).cast("long").as("w"))
    val od = orders.select(col("o_orderkey"),
      round(col("o_totalprice") * 100).cast("long").as("r"))
    val withTot = li
      .join(od, col("l_orderkey") === col("o_orderkey"))
      .withColumn("wsum", sum(col("w")).over(Window.partitionBy(col("l_orderkey"))))
      .withColumn("base", expr("(r * w) div wsum"))
      .withColumn("rem", expr("(r * w) % wsum"))
    // the tiebreak includes w: this lineitem reuses line numbers within
    // an order, and two same-(rem, linenumber) rows with different
    // weights would otherwise rank nondeterministically — with w in the
    // key, remaining ties are between IDENTICAL rows, where either
    // assignment yields the same output multiset
    val wRank = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("rem").desc, col("l_linenumber"), col("w"))
    withTot
      .withColumn("short",
        (col("r") - sum(col("base")).over(Window.partitionBy(col("l_orderkey")))))
      .withColumn("rk", row_number().over(wRank).cast("long"))
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("base") + when(col("rk") <= col("short"), 1L).otherwise(0L))
          .as("alloc_cents"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  private def q177(spark: SparkSession, dir: String): DataFrame =
    prorate(Tables.lineitem(spark, dir), Tables.orders(spark, dir))

  private val q177Sql: String =
    """WITH li AS (
      |  SELECT l_orderkey, l_linenumber,
      |         CAST(round(l_extendedprice * 100) AS BIGINT) AS w
      |  FROM lineitem
      |), od AS (
      |  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS r
      |  FROM orders
      |), shares AS (
      |  SELECT l_orderkey, l_linenumber, r, w,
      |         (r * w) // CAST(sum(w) OVER (PARTITION BY l_orderkey) AS BIGINT)
      |           AS base,
      |         (r * w) % CAST(sum(w) OVER (PARTITION BY l_orderkey) AS BIGINT)
      |           AS rem
      |  FROM li JOIN od ON o_orderkey = l_orderkey
      |), repaired AS (
      |  SELECT l_orderkey, l_linenumber, base,
      |         r - CAST(sum(base) OVER (PARTITION BY l_orderkey) AS BIGINT)
      |           AS short,
      |         CAST(row_number() OVER (PARTITION BY l_orderkey
      |                                 ORDER BY rem DESC, l_linenumber, w)
      |              AS BIGINT) AS rk
      |  FROM shares
      |)
      |SELECT l_orderkey, l_linenumber,
      |       base + CASE WHEN rk <= short THEN 1 ELSE 0 END AS alloc_cents
      |FROM repaired
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // -------------------------------------------------------------- q185
  /** Calendarized revenue recognition — q177's conservation discipline
    * applied along TIME: each order's total cents spread over the
    * calendar months from the order month through its latest shipment
    * month (ASC 606's ratable recognition, at month granularity), base
    * share `R div M` cents per month with the `R mod M` leftover cents
    * recognized one each in the EARLIEST months (deterministic, no
    * remainder ranking needed — every month's remainder is equal), then
    * rolled up to the month ledger. Σ over the ledger ≡ Σ order totals
    * to the cent, structurally.
    *
    * Shape: one orderkey-keyed max aggregate (latest shipment), one
    * equi-join to the order header, a per-order `sequence` explode
    * bounded by the recognition span (≤ ~80 months here — a per-entity
    * constant, never corpus-scale), one partial+final aggregate keyed
    * by month. The synthetic data's uncorrelated dates (a fifth of max
    * shipdates precede the order date) are clamped to a ≥1-month span,
    * which also dodges Spark's descending-`sequence` trap. */
  private[graft] def revenueRecognition(lineitem: DataFrame,
      orders: DataFrame): DataFrame = {
    val ship = lineitem.groupBy(col("l_orderkey"))
      .agg(max(col("l_shipdate")).as("ship_end"))
    // The exploded recognition rows aggregate on an INTEGER month index
    // (year·12 + month−1 of the order month, plus the explode offset)
    // and the "yyyy-MM" label is formatted AFTER the aggregate — on the
    // ≤ #months ledger rows, not per exploded row (round-13, guide
    // §2.3/§1.2-2: the hot path ran date add + calendar formatting +
    // string hashing per exploded row, and shuffled a string key where
    // an int suffices; the stage is the query's single hot task). The
    // label algebra is exact: m0 is the first-of-month, so month
    // arithmetic is pure index arithmetic — same strings, same hash.
    orders
      .join(ship, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("r"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("mi0"),
        greatest(lit(1L),
          (months_between(trunc(col("ship_end"), "MM"),
            trunc(col("o_orderdate"), "MM")).cast("long") + 1L)).as("m"))
      .withColumn("idx", explode(expr("sequence(0L, m - 1L)")))
      .select((col("mi0") + col("idx")).as("mi"),
        (expr("r div m") +
          when(col("idx") < expr("r % m"), 1L).otherwise(0L)).as("cents"))
      .groupBy(col("mi"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("cents"))
      .select(
        format_string("%04d-%02d", expr("mi div 12"), expr("mi % 12 + 1"))
          .as("month"),
        col("n_orders"), col("cents"))
      .orderBy(col("month"))
  }

  private def q185(spark: SparkSession, dir: String): DataFrame =
    revenueRecognition(Tables.lineitem(spark, dir), Tables.orders(spark, dir))

  private val q185Sql: String =
    """WITH ship AS (
      |  SELECT l_orderkey, max(l_shipdate) AS ship_end
      |  FROM lineitem GROUP BY 1
      |), spans AS (
      |  SELECT o_orderkey,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS r,
      |         date_trunc('month', o_orderdate) AS m0,
      |         greatest(1, date_diff('month',
      |             date_trunc('month', o_orderdate),
      |             date_trunc('month', ship_end)) + 1) AS m
      |  FROM orders JOIN ship ON l_orderkey = o_orderkey
      |), spread AS (
      |  SELECT strftime(m0 + to_months(CAST(idx AS INTEGER)), '%Y-%m') AS month,
      |         r // m + CASE WHEN idx < r % m THEN 1 ELSE 0 END AS cents
      |  FROM spans, unnest(generate_series(0, m - 1)) AS t(idx)
      |)
      |SELECT month, CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(cents) AS BIGINT) AS cents
      |FROM spread
      |GROUP BY 1
      |ORDER BY month""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q177_proration", q177, Some(q177Sql)),
    Q("q185_revenue_recognition", q185, Some(q185Sql)),
  )
}
