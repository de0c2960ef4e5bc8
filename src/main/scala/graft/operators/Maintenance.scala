package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.Tables

/** Incremental view maintenance over a JOIN — the algebra that keeps a
  * 100 TB materialized aggregate fresh without rescanning history.
  * q104 proved merge ≡ recompute for single-table rollups; the join
  * case needs the bilinear delta expansion
  *
  *   V(A ∪ ΔA, B ∪ ΔB) = V(A,B) + V(ΔA,B) + V(A,ΔB) + V(ΔA,ΔB)
  *
  * (Blakeley et al., "Efficiently Updating Materialized Views",
  * SIGMOD'86 — the foundation every warehouse MV engine implements).
  * The ORACLE is the straight full recompute, so the correctness gate
  * proves the expansion exact, not just self-consistent.
  */
object Maintenance {

  // -------------------------------------------------------------- q118
  /** Per-nation revenue view maintained incrementally: orders split at
    * an order-date watermark (A = history, ΔA = new orders), lineitem
    * split at a ship-date watermark (B / ΔB) — DIFFERENT columns, so
    * all four delta terms are non-empty (an order placed before the
    * cutoff keeps shipping lines after it; a parity split on the join
    * key would silently empty the cross terms and prove nothing).
    *
    * Each term aggregates to (custkey, partial sums) BEFORE any
    * dimension work — the three delta joins are bounded by delta size ×
    * join fanout; the customer→nation chain joins once, broadcast,
    * against the merged #custkeys-row frame. At 100 TB: V(A,B) is the
    * persisted view, the three delta terms are the daily maintenance
    * transaction, and history is never rescanned. Revenue rounds 2 dp
    * AFTER the merge (q104's discipline: round the merged total, never
    * the partials). */
  private def q118(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cut = "1996-07-01 00:00:00"
    val orders = Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey",
      ($"o_orderdate" < lit(cut).cast("timestamp")).as("is_old"))
    val line = Tables.lineitem(spark, dir).select($"l_orderkey",
      ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"),
      ($"l_shipdate" < lit(cut).cast("timestamp")).as("is_old"))
    def term(oldOrders: Boolean, oldLines: Boolean): DataFrame =
      orders.filter($"is_old" === oldOrders).drop("is_old")
        .join(line.filter($"is_old" === oldLines).drop("is_old"),
          $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_custkey")
        .agg(sum($"rev").as("pr"), count(lit(1)).as("pn"))
    val merged = term(true, true)
      .unionByName(term(false, true))
      .unionByName(term(true, false))
      .unionByName(term(false, false))
      .groupBy($"o_custkey")
      .agg(sum($"pr").as("pr"), sum($"pn").as("pn"))
    merged
      .join(broadcast(Tables.customer(spark, dir)
        .select($"c_custkey", $"c_nationkey")), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)
        .select($"n_nationkey", $"n_name")), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(round(sum($"pr"), 2).as("revenue"), sum($"pn").as("n_items"))
      .orderBy($"n_name")
  }

  /** Straight full recompute — the four merged delta terms must equal
    * it (same final rounding, same nation rollup). */
  private val q118Sql: String =
    """SELECT n.n_name,
      |       round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS revenue,
      |       CAST(count(*) AS BIGINT) AS n_items
      |FROM orders o
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY n.n_name
      |ORDER BY n.n_name""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q118_join_view_maintenance", q118, Some(q118Sql)),
  )
}
