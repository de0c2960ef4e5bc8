package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT global ordering primitives — the shared engine that
  * removes every `Window.orderBy(...)` (empty partition spec → ONE task
  * sorts the whole table) from fact-table-sized inputs in the catalog.
  *
  * The decomposition is the bucketed two-phase prefix-sum the engine
  * already uses twice (q176's histogram-refinement selection, q111's
  * per-day offset prefix sums), lifted to a reusable form:
  *
  *   1. bucket every row by a MONOTONE cut of the sort key (equi-width
  *      numeric buckets, or an order-preserving string prefix) — any
  *      consistent cut works because only the ORDER of buckets and the
  *      order within a bucket matter, never the cut arithmetic itself;
  *   2. one hash aggregate → per-bucket counts; an exclusive prefix sum
  *      over the ≤`buckets`-row histogram (a global window over a
  *      CONSTANT-bounded frame — the q111 precedent) → bucket offsets;
  *   3. per-bucket local `row_number` (window PARTITIONED by bucket —
  *      parallel across buckets, each sorting ~n/buckets rows) plus the
  *      broadcast offset = the exact global rank.
  *
  * Exactness: the bucket cut is monotone in the sort key, so
  * (bucket asc, key within bucket asc) is the same total order as the
  * key itself; the rank arithmetic is pure integers. The result is
  * bit-identical to `row_number().over(Window.orderBy(key, tie))` — the
  * oracle twins keep the naive global-window SQL spelling and the
  * CORRECTNESS hash gate cross-checks the decomposition.
  *
  * Scale: the only shuffles are one hash aggregate (histogram), one
  * hash partition by bucket (the local-rank window), and a broadcast of
  * the ≤`buckets`-row offset table. Worst case (all rows share one sort
  * key value) degrades to the single-task sort — the same exposure
  * q176 documents as "recursable"; near-continuous keys (prices, scores,
  * timestamps) split ~uniformly.
  */
private[graft] object Ranks {

  /** Attach the exact 1-based global `row_number` under
    * `ORDER BY (v, id)` as column `rn` (LongType) and the total row
    * count as column `n` (LongType), computed distributed as described
    * above. `v` must be numeric, `id` a unique tiebreak column.
    */
  def withGlobalRank(df: DataFrame, v: String, id: String,
      rn: String = "rn", n: String = "n", buckets: Int = 1024): DataFrame = {
    require(buckets >= 2, s"need buckets >= 2 (got $buckets)")
    val stats = df.agg(min(col(v)).as("__lo"), max(col(v)).as("__hi"))
    // NULL sort keys get their own concrete bucket BEFORE every numeric
    // one (matching the window's asc_nulls_first) — a null __bkt would
    // never match the offsets equi-join and the rows would silently
    // vanish from the output while still counted in `n`.
    val bucketed = df.crossJoin(broadcast(stats))
      .withColumn("__bkt",
        when(col(v).isNull, lit(-1)).otherwise(
          when(col("__hi") === col("__lo"), lit(0)).otherwise(
            least(floor((col(v) - col("__lo")) / (col("__hi") - col("__lo"))
              * buckets), lit(buckets - 1)))).cast("int"))
      .drop("__lo", "__hi")
    rankByBucket(bucketed, Seq("__bkt"), Seq(col(v), col(id)), rn, n)
  }

  /** String-keyed variant: exact global `row_number` under
    * `ORDER BY s` over a DICTIONARY frame (distinct `s` values), the
    * distributed form of the ER sorted-neighborhood rank. The bucket is
    * the first `prefixLen` characters — order-preserving by the
    * definition of lexicographic comparison (strings differing within
    * the prefix order by it; strings sharing it order within the
    * bucket), so the decomposition is exact for ANY prefix length.
    * Bucket count is bounded by the distinct prefixes present (the
    * offset histogram stays tiny); balance tracks the dictionary's
    * prefix distribution.
    */
  def withGlobalRankByPrefix(df: DataFrame, s: String,
      rn: String = "rn", n: String = "n", prefixLen: Int = 2): DataFrame = {
    require(prefixLen >= 1, s"need prefixLen >= 1 (got $prefixLen)")
    // A null key has no prefix — carry the null-ness in a leading flag
    // bucket (0 = null, sorts before every non-null prefix = the
    // window's asc_nulls_first) and coalesce the prefix itself to a
    // concrete value so the offsets equi-join always matches.
    val bucketed = df
      .withColumn("__bktn", when(col(s).isNull, lit(0)).otherwise(lit(1)))
      .withColumn("__bkt", coalesce(substring(col(s), 1, prefixLen), lit("")))
    rankByBucket(bucketed, Seq("__bktn", "__bkt"), Seq(col(s)), rn, n)
  }

  /** Shared phase 2+3: `df` carries non-null bucket column(s) whose
    * ascending (lexicographic over `bktNames`) order refines into the
    * global order under `order`. */
  private def rankByBucket(bucketed: DataFrame, bktNames: Seq[String],
      order: Seq[Column], rn: String, n: String): DataFrame = {
    val bkts = bktNames.map(col)
    // ≤`buckets` rows: the global window here is over a constant-bounded
    // histogram, never the data (q111's phase-2 discipline)
    val wOff = Window.orderBy(bkts: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val hist = bucketed.groupBy(bkts: _*).agg(count(lit(1)).as("__cnt"))
    val offsets = hist
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wOff), lit(0L)))
      .withColumn(n, sum(col("__cnt")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(bkts :+ col("__off") :+ col(n): _*)
    val wLoc = Window.partitionBy(bkts: _*).orderBy(order: _*)
    bucketed.join(broadcast(offsets), bktNames)
      .withColumn(rn, col("__off") + row_number().over(wLoc).cast("long"))
      .drop("__off" +: bktNames: _*)
  }

  /** SQL-standard `ntile(k)` from an exact global rank: with n rows,
    * q = n div k and r = n mod k, tiles 1..r hold q+1 rows and tiles
    * r+1..k hold q — identical to Spark's and DuckDB's NTile. Pure
    * integer algebra over the `rn`/`n` columns of [[withGlobalRank]].
    */
  def ntileFromRank(rn: String, n: String, k: Int): Column = {
    require(k >= 1, s"need k >= 1 (got $k)")
    expr(
      s"""CASE WHEN $rn <= (($n div $k) + 1) * ($n % $k)
         |     THEN ($rn + ($n div $k)) div (($n div $k) + 1)
         |     ELSE ($n % $k) +
         |          ($rn - (($n div $k) + 1) * ($n % $k) + ($n div $k) - 1)
         |            div ($n div $k)
         |END""".stripMargin).cast("int")
  }

  /** `percent_rank()` from an exact global rank — valid when the order
    * includes a unique tiebreak (no ties ⇒ rank = row_number), which is
    * how every catalog use spells it. */
  def percentRankFromRank(rn: String, n: String): Column =
    when(col(n) === 1L, lit(0.0))
      .otherwise((col(rn) - lit(1L)).cast("double") / (col(n) - lit(1L)))
}
