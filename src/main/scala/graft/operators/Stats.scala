package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.Portable
import graft.sources.Tables

/** Statistical profiling operators — the numeric companions of q106's
  * ANALYZE stats: bivariate regression/correlation from mergeable
  * sufficient statistics, equi-width value histograms, and a
  * chi-square independence report. The reference's analyzer computes
  * exactly these population moments per sensor (lambda-sample
  * analyzer/src/main/scala/analyzer/Analyzer.scala — mean/stddev over
  * a window); this family generalizes them to two variables and to
  * shape diagnostics.
  *
  * Determinism across engines is the design driver here:
  *  - q115 derives corr/slope/intercept from RAW SUFFICIENT SUMS
  *    (n, Σx, Σy, Σxy, Σx², Σy²) with the same scalar algebra on both
  *    sides, instead of calling each engine's corr()/regr_slope()
  *    built-ins — different engines implement those with different
  *    streaming-moment algorithms, so their low bits differ; identical
  *    algebra over identically-rounded sums does not.
  *  - q116/q117 emit only values derived from EXACT aggregates
  *    (min/max/counts) by identical IEEE expressions — no libm, no
  *    rounding needed at all.
  */
object Stats extends DetRounding {

  // -------------------------------------------------------------- q115
  /** Per-returnflag linear relationship quantity → extendedprice:
    * Pearson correlation, population covariance, OLS slope/intercept,
    * and R². ONE partial+final aggregate computes the six sufficient
    * sums per group (the same mergeable-statistic algebra as q104's
    * rollup merge — at 100 TB these sums ARE the persisted daily
    * rollup, and the regression re-derives from merged sums without
    * rescanning history); everything after is per-group scalar math on
    * a #groups-row frame. Derived doubles round at 6 dp (they carry
    * only summation-order ulp drift — the formulas are identical on
    * both sides by construction). */
  private def q115(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_returnflag",
        $"l_quantity".as("x"), $"l_extendedprice".as("y"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).cast("double").as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"),
        sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"))
      .select($"l_returnflag", $"n".cast("long").as("n_rows"),
        round(($"n" * $"sxy" - $"sx" * $"sy") /
          sqrt(($"n" * $"sxx" - $"sx" * $"sx") *
            ($"n" * $"syy" - $"sy" * $"sy")), 6).as("corr_xy"),
        round(($"sxy" - $"sx" * $"sy" / $"n") / $"n", 4).as("covar_pop"),
        round(($"n" * $"sxy" - $"sx" * $"sy") /
          ($"n" * $"sxx" - $"sx" * $"sx"), 6).as("slope"),
        round(($"sy" - ($"n" * $"sxy" - $"sx" * $"sy") /
          ($"n" * $"sxx" - $"sx" * $"sx") * $"sx") / $"n", 4).as("intercept"),
        round((($"n" * $"sxy" - $"sx" * $"sy") *
          ($"n" * $"sxy" - $"sx" * $"sy")) /
          (($"n" * $"sxx" - $"sx" * $"sx") *
            ($"n" * $"syy" - $"sy" * $"sy")), 6).as("r2"))
      .orderBy($"l_returnflag")
  }

  /** Same sufficient-sum algebra, spelled identically. The square in
    * r2 is an explicit self-multiply, NOT pow(z, 2): both engines
    * route pow through libm, whose low bits the catalog bans. */
  private val q115Sql: String =
    """WITH s AS (
      |  SELECT l_returnflag,
      |         CAST(count(*) AS DOUBLE) AS n,
      |         sum(l_quantity) AS sx, sum(l_extendedprice) AS sy,
      |         sum(l_quantity * l_extendedprice) AS sxy,
      |         sum(l_quantity * l_quantity) AS sxx,
      |         sum(l_extendedprice * l_extendedprice) AS syy
      |  FROM lineitem GROUP BY 1
      |)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
      |       round((n * sxy - sx * sy) /
      |             sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_xy,
      |       round((sxy - sx * sy / n) / n, 4) AS covar_pop,
      |       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
      |       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4)
      |         AS intercept,
      |       round(((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
      |             ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
      |FROM s
      |ORDER BY l_returnflag""".stripMargin

  // -------------------------------------------------------------- q116
  /** Equi-width value histogram per event type (20 bins) — the
    * distribution-shape profile next to q91's robust moments and q17's
    * quantiles. Bin edges derive from the exact min/max by identical
    * IEEE arithmetic on both sides, so NOTHING here needs rounding:
    * `(hi-lo)/20`, `floor((v-lo)/w)`, and `lo + b·w` are bit-identical
    * engine-portable expressions (only libm transcendentals and
    * summation order are not). Two passes: a #types-row stats
    * aggregate broadcast back, then one partial+final count keyed
    * (type, bin) — q91's exact plan shape. Empty bins are absent, not
    * zero (join a bin spine to densify if a chart needs it). */
  private def q116(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).select($"event_type", $"value")
    val stats = ev.groupBy($"event_type")
      .agg(min($"value").as("lo"), max($"value").as("hi"))
      .withColumn("w", ($"hi" - $"lo") / lit(20.0))
    ev.join(broadcast(stats), Seq("event_type"))
      .select($"event_type", $"lo", $"w",
        // w = 0 (a constant column) would make the quotient NaN, and
        // the engines' floor/least disagree on NaN — pin that case to
        // bin 0 explicitly on both sides
        when($"w" === 0, lit(0))
          .otherwise(least(floor(($"value" - $"lo") / $"w"), lit(19.0)).cast("int"))
          .as("bin"))
      .groupBy($"event_type", $"bin")
      .agg(count(lit(1)).as("n"),
        (min($"lo") + $"bin" * min($"w")).as("bin_lo"))
      .select($"event_type", $"bin", $"bin_lo", $"n")
      .orderBy($"event_type", $"bin")
  }

  private val q116Sql: String =
    """WITH stats AS (
      |  SELECT event_type, min(value) AS lo, max(value) AS hi,
      |         (max(value) - min(value)) / 20.0 AS w
      |  FROM events GROUP BY 1
      |), binned AS (
      |  SELECT e.event_type, s.lo, s.w,
      |         CASE WHEN s.w = 0 THEN 0
      |              ELSE CAST(least(floor((e.value - s.lo) / s.w), 19.0) AS INTEGER)
      |         END AS bin
      |  FROM events e JOIN stats s USING (event_type)
      |)
      |SELECT event_type, bin, min(lo) + bin * min(w) AS bin_lo,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM binned
      |GROUP BY event_type, bin
      |ORDER BY event_type, bin""".stripMargin

  // -------------------------------------------------------------- q117
  /** Chi-square independence cells: event_type × ISO weekday
    * contingency table with observed count, expected count under
    * independence, and the per-cell chi-square contribution — "is
    * activity mix uniform across the week", the drift test a pipeline
    * runs between corpus snapshots (q74's KL divergence for
    * categorical×categorical). Expected and contribution are IEEE
    * algebra over EXACT integer marginals (row total × col total / n,
    * (o−e)²/e) — identical expressions both sides, zero rounding. The
    * global statistic is Σ over the 35 cells; summing it here would
    * reintroduce order-dependent drift for no reason — the cells table
    * IS the report, and StatsSpec reduces it in one deterministic
    * pass. Plan: one count aggregate to #cells; the marginals are
    * WINDOW sums over the #cells frame itself (35 rows — re-joining
    * marginal frames would rescan the corpus per marginal, and the
    * "global" window is the same deliberately-tiny frame as q111's
    * offsets). Integer window sums are order-independent, so the
    * windows cost nothing in determinism. */
  private def q117(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wr = Window.partitionBy($"event_type")
    val wc = Window.partitionBy($"dow")
    val wn = Window.partitionBy()
    Tables.events(spark, dir)
      .select($"event_type", weekday($"ts").as("dow"))
      .groupBy($"event_type", $"dow").agg(count(lit(1)).as("o"))
      // densify to the full type × weekday grid WITHOUT a second scan:
      // the weekday domain is statically 0..6, so each type's missing
      // cells generate from a literal sequence against its collected
      // (dow → count) map — a zero-observed cell still contributes
      // (0−e)²/e = e to the statistic, and dropping it would silently
      // understate χ² on sparse data
      .groupBy($"event_type")
      .agg(map_from_entries(collect_list(struct($"dow", $"o"))).as("m"))
      .select($"event_type", explode(sequence(lit(0), lit(6))).as("dow"), $"m")
      .select($"event_type", $"dow",
        coalesce(element_at($"m", $"dow"), lit(0L)).as("o"))
      .select($"event_type", $"dow", $"o",
        (sum($"o").over(wr).cast("double") * sum($"o").over(wc) /
          sum($"o").over(wn)).as("e"))
      .withColumn("contrib", ($"o" - $"e") * ($"o" - $"e") / $"e")
      .orderBy($"event_type", $"dow")
  }

  private val q117Sql: String =
    """WITH cells AS (
      |  SELECT event_type, isodow(ts) - 1 AS dow, CAST(count(*) AS BIGINT) AS o
      |  FROM events GROUP BY 1, 2
      |), dense AS (
      |  SELECT t.event_type, d.dow, COALESCE(c.o, 0) AS o
      |  FROM (SELECT DISTINCT event_type FROM cells) t
      |  CROSS JOIN (SELECT UNNEST(range(0, 7)) AS dow) d
      |  LEFT JOIN cells c ON c.event_type = t.event_type AND c.dow = d.dow
      |), m AS (
      |  SELECT event_type, dow, o,
      |         CAST(sum(o) OVER (PARTITION BY event_type) AS DOUBLE) *
      |           sum(o) OVER (PARTITION BY dow) /
      |           sum(o) OVER () AS e
      |  FROM dense
      |)
      |SELECT event_type, CAST(dow AS INTEGER) AS dow, o, e,
      |       (o - e) * (o - e) / e AS contrib
      |FROM m
      |ORDER BY event_type, dow""".stripMargin

  // -------------------------------------------------------------- q129
  /** Robust means per event type: the raw mean next to its winsorized
    * (values clamped into [p05, p95]) and trimmed (values outside
    * dropped) counterparts — q91's MAD monitoring answered the "are
    * there outliers" question; this quantifies how much they drag the
    * headline mean. Quantile cutpoints ride the proven percentile ↔
    * quantile_cont parity; the boundary tests `value ≥ p05` are safe
    * against cutpoint ulp drift because an interpolated cutpoint
    * either equals a data value exactly (zero-width bracket) or lies
    * strictly between two consecutive order statistics, where no data
    * point can sit. Plan: one quantile pass to #types rows, broadcast
    * back, one partial+final aggregate — two corpus scans, inherent to
    * exact quantiles (the q54 sketch swaps in at 100 TB). */
  private def q129(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).select($"event_type", $"value")
    val cuts = ev.groupBy($"event_type").agg(
      percentile($"value", lit(0.05)).as("p05"),
      percentile($"value", lit(0.95)).as("p95"))
    val kept = $"value" >= $"p05" && $"value" <= $"p95"
    ev.join(broadcast(cuts), Seq("event_type"))
      .groupBy($"event_type")
      .agg(round(min($"p05"), 4).as("p05"), round(min($"p95"), 4).as("p95"),
        round(sum($"value") / count(lit(1)), 4).as("mean_raw"),
        round(sum(least(greatest($"value", $"p05"), $"p95")) / count(lit(1)), 4)
          .as("mean_winsor"),
        round(sum(when(kept, $"value")) / sum(when(kept, 1L).otherwise(0L)), 4)
          .as("mean_trimmed"))
      .orderBy($"event_type")
  }

  private val q129Sql: String =
    """WITH b AS (
      |  SELECT event_type, quantile_cont(value, 0.05) AS p05,
      |         quantile_cont(value, 0.95) AS p95
      |  FROM events GROUP BY 1
      |)
      |SELECT e.event_type,
      |       round(min(p05), 4) AS p05, round(min(p95), 4) AS p95,
      |       round(sum(value) / count(*), 4) AS mean_raw,
      |       round(sum(least(greatest(value, p05), p95)) / count(*), 4)
      |         AS mean_winsor,
      |       round(sum(CASE WHEN value >= p05 AND value <= p95 THEN value END) /
      |             sum(CASE WHEN value >= p05 AND value <= p95 THEN 1 ELSE 0 END), 4)
      |         AS mean_trimmed
      |FROM events e JOIN b USING (event_type)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------- q132
  /** Pareto / ABC contribution classes over part revenue: parts sorted
    * by revenue descending, classed A while the running share is ≤ 80%,
    * B to 95%, C after — the 80/20 report behind every "top sellers"
    * dashboard and behind corpus curation's "which sources carry the
    * mass" cut (q79's quality twin for volume).
    *
    * Two scale tricks, both exactness-preserving:
    *  - Revenue is fixed to INTEGER CENTS at the aggregate (one round,
    *    then bigint algebra): every downstream sum is integer-exact,
    *    and the class cuts are integer comparisons (5·cum ≤ 4·total,
    *    20·cum ≤ 19·total) — no double ever enters an ordering or a
    *    threshold, so the plan is bit-deterministic end to end.
    *  - The running revenue sum is q111's two-phase Blelloch scan, not
    *    a global window: phase 1 runs per revenue-band partitions
    *    (band = cents div 10⁷ — a monotone function of the sort key,
    *    so band-desc + in-band order ≡ global order), phase 2
    *    prefix-sums the #bands-row totals and broadcasts offsets back.
    *    The ORACLE is the naive global window — the gate proves the
    *    decomposition exact (integer sums make it EXACT, not
    *    approximately equal). */
  private def q132(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rev = Tables.lineitem(spark, dir)
      .groupBy($"l_partkey")
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")) * 100.0, 0)
        .cast("long").as("cents"))
      // ascending band ≡ descending revenue; `div` (not `/`) keeps the
      // arithmetic in bigints — cents ≥ 0, so truncation is floor
      .withColumn("band", -expr("cents div 10000000"))
    val wLocal = Window.partitionBy($"band")
      .orderBy($"cents".desc, $"l_partkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBands = Window.orderBy($"band")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = rev.groupBy($"band").agg(sum($"cents").as("tot"))
      .withColumn("offset", coalesce(sum($"tot").over(wBands), lit(0L)))
      .select($"band", $"offset", sum($"tot").over().as("total"))
    rev.join(broadcast(offsets), Seq("band"))
      .withColumn("cum", $"offset" + sum($"cents").over(wLocal))
      .withColumn("abc_class",
        when($"cum" * 5 <= $"total" * 4, "A")
          .when($"cum" * 20 <= $"total" * 19, "B")
          .otherwise("C"))
      .groupBy($"abc_class")
      .agg(count(lit(1)).as("n_parts"),
        round(sum($"cents") / 100.0, 2).as("class_revenue"))
      .orderBy($"abc_class")
  }

  /** Naive single-window form — the decomposition target. */
  private val q132Sql: String =
    """WITH rev AS (
      |  SELECT l_partkey,
      |         CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100.0, 0)
      |              AS BIGINT) AS cents
      |  FROM lineitem GROUP BY 1
      |), ranked AS (
      |  SELECT l_partkey, cents,
      |         sum(cents) OVER (ORDER BY cents DESC, l_partkey
      |                          ROWS UNBOUNDED PRECEDING) AS cum,
      |         sum(cents) OVER () AS total
      |  FROM rev
      |), classed AS (
      |  SELECT CASE WHEN cum * 5 <= total * 4 THEN 'A'
      |              WHEN cum * 20 <= total * 19 THEN 'B'
      |              ELSE 'C' END AS abc_class,
      |         cents
      |  FROM ranked
      |)
      |SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
      |       round(sum(cents) / 100.0, 2) AS class_revenue
      |FROM classed GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------- q135
  /** Gini coefficient of part-revenue concentration per return class —
    * the scalar companion of q132's ABC classes (Lorenz-curve area via
    * the rank identity G = 2·Σᵢ i·xᵢ / (n·Σxᵢ) − (n+1)/n over
    * ascending-sorted xᵢ). Same integer-cents discipline as q132:
    * ranks and revenues are bigints, both sums are exact integers
    * (Σ i·cents stays < 2⁶³ far past these scales; a 10⁹-part catalog
    * would move the product sum to DECIMAL — same plan), and the only
    * doubles are the two final IEEE divides, rounded at 6 dp. The
    * per-class window sorts partition independently; at q132-scale
    * cardinalities the banded two-phase scan swaps in unchanged. */
  private def q135(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wRank = Window.partitionBy($"l_returnflag").orderBy($"cents", $"l_partkey")
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag", $"l_partkey")
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")) * 100.0, 0)
        .cast("long").as("cents"))
      .withColumn("i", row_number().over(wRank).cast("long"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_parts"),
        round(sum($"cents") / 100.0, 2).as("class_revenue"),
        round(lit(2.0) * sum($"i" * $"cents").cast("double") /
          (count(lit(1)) * sum($"cents").cast("double")) -
          (count(lit(1)) + lit(1.0)) / count(lit(1)), 6).as("gini"))
      .orderBy($"l_returnflag")
  }

  private val q135Sql: String =
    """WITH rev AS (
      |  SELECT l_returnflag, l_partkey,
      |         CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100.0, 0)
      |              AS BIGINT) AS cents
      |  FROM lineitem GROUP BY 1, 2
      |), ranked AS (
      |  SELECT l_returnflag, cents,
      |         CAST(row_number() OVER (PARTITION BY l_returnflag
      |                                 ORDER BY cents, l_partkey) AS BIGINT) AS i
      |  FROM rev
      |)
      |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_parts,
      |       round(sum(cents) / 100.0, 2) AS class_revenue,
      |       round(2.0 * CAST(sum(i * cents) AS DOUBLE) /
      |             (count(*) * CAST(sum(cents) AS DOUBLE)) -
      |             (count(*) + 1.0) / count(*), 6) AS gini
      |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------- q144
  /** Benford first-digit audit over order totals — the fraud /
    * data-fabrication screen (Nigrini's forensic-accounting staple):
    * observed first-digit shares against Benford's law
    * P(d) = log₁₀(1 + 1/d), with per-digit chi-square contributions.
    *
    * The first digit comes from the exact integer CENTS (q132's
    * discipline) via its decimal string — substr of a BIGINT renders
    * identically in every engine, where float log10-based extraction
    * could flip at power-of-ten boundaries. The digit table densifies
    * to all nine digits through q117's collected-map + literal-spine
    * trick (an absent digit is EVIDENCE — its (0−e)²/e charge must
    * appear, and both engines must agree it exists). Benford shares
    * are ln(1+1/d)/ln(10) SAME-SPELLED on both sides (never one
    * engine's log10 against the other's ln ratio — libm low bits
    * differ), terminal 6-dp rounds. One orders scan → 9 rows; every
    * window rides the 9-row frame. */
  /** q144's engine over ANY frame and positive amount column — the
    * facade's [[graft.Graft.benford]]. `scale` is the fixed-point
    * precision (2 = cents) that turns the amount into the exact
    * integer whose decimal string yields the digit. */
  private[graft] def benford(df: DataFrame, amountCol: String,
      scale: Int): DataFrame = {
    require(scale >= 0 && scale <= 9, s"need 0 <= scale <= 9 (got $scale)")
    val wAll = Window.partitionBy()
    val n = col("n")
    val eShare = col("e_share")
    df
      .select(substring(round(col(amountCol) * math.pow(10.0, scale), 0)
        .cast("long").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("o"))
      .agg(map_from_entries(collect_list(struct(col("digit"), col("o")))).as("m"))
      .select(explode(sequence(lit(1), lit(9))).as("digit"), col("m"))
      .select(col("digit"),
        coalesce(element_at(col("m"), col("digit")), lit(0L)).as("observed"))
      .withColumn("n", sum(col("observed")).over(wAll))
      .withColumn("e_share", log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0)))
      .select(col("digit"), col("observed"),
        round(col("observed") / n, 6).as("share"),
        round(eShare, 6).as("benford_share"),
        round((col("observed") - n * eShare) * (col("observed") - n * eShare) /
          (n * eShare), 6).as("chi2_contrib"))
      .orderBy(col("digit"))
  }

  private def q144(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    benford(Tables.orders(spark, dir).select($"o_totalprice"),
      "o_totalprice", scale = 2)
  }

  private val q144Sql: String =
    """WITH c AS (
      |  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100.0, 0) AS BIGINT)
      |                          AS VARCHAR), 1, 1) AS INTEGER) AS digit,
      |         CAST(count(*) AS BIGINT) AS o
      |  FROM orders GROUP BY 1
      |), dense AS (
      |  SELECT d.digit, COALESCE(c.o, 0) AS observed
      |  FROM (SELECT UNNEST(range(1, 10)) AS digit) d
      |  LEFT JOIN c ON c.digit = d.digit
      |), m AS (
      |  SELECT CAST(digit AS INTEGER) AS digit, observed,
      |         sum(observed) OVER () AS n,
      |         ln(1.0 + 1.0 / digit) / ln(10.0) AS e_share
      |  FROM dense
      |)
      |SELECT digit, observed,
      |       round(observed / n, 6) AS share,
      |       round(e_share, 6) AS benford_share,
      |       round((observed - n * e_share) * (observed - n * e_share) /
      |             (n * e_share), 6) AS chi2_contrib
      |FROM m ORDER BY digit""".stripMargin

  // -------------------------------------------------------------- q145
  /** Bootstrap confidence intervals for the per-type mean value via
    * DETERMINISTIC Poisson resampling — the resampling scheme built
    * for data too large to index (Chamandy, Muralidharan, Najmi &
    * Naidu, "Estimating uncertainty for massive data streams",
    * Google '12): replicate r weights each row by an iid-ish
    * Poisson(1) draw, so no replicate ever materializes and the whole
    * family is one streaming pass. The draw is the salted portable
    * hash of (event_id, replicate) pushed through the Poisson(1)
    * inverse CDF as integer threshold compares on a 10⁵ grain — a
    * pure function of the row key, so a backfill or retry reproduces
    * every interval bit-for-bit (q51/q53's determinism discipline;
    * `rand()` here would make the CI itself flaky). The ≥5 tail
    * (cum P = 0.99941) lumps into weight 5 — a 6·10⁻⁴ truncation far
    * below the CI's own Monte-Carlo noise.
    *
    * Shape: corpus × 100 replicates explode map-side (documented cost;
    * the 100× rows never shuffle wider than (type, rep) keys) → one
    * partial+final weighted-mean aggregate to #types·100 rows →
    * rank-3 / rank-98 order statistics (exact 2.5/97.5 percentiles of
    * 100 — explicit row_number, never an engine percentile builtin)
    * over the tiny frame. At 100 TB, drop replicates to 25-50 or
    * pre-aggregate per (key, rep) shard — the weights merge because
    * Poisson sums are Poisson. */
  private val BootSalt = "#graft-boot"

  /** q145's engine with the replicate count open — the facade's
    * [[graft.Graft.bootstrapCi]]. The 95% interval reads the
    * ceil(0.025·R)/ceil(0.975·R) order statistics, the convention
    * that lands on ranks 3/98 at R = 100. */
  private[graft] def bootstrapCi(spark: SparkSession, dir: String,
      reps: Int): DataFrame = {
    require(reps >= 40, s"need reps >= 40 for a 95% interval (got $reps)")
    import spark.implicits._
    val loRank = math.ceil(0.025 * reps).toInt
    val hiRank = math.ceil(0.975 * reps).toInt
    val u = Portable.hash32(concat($"event_id".cast("string"), lit(":"),
      $"rep".cast("string"), lit(BootSalt))) % 100000
    val pois = when(u < 36788, 0L).when(u < 73576, 1L).when(u < 91970, 2L)
      .when(u < 98101, 3L).when(u < 99634, 4L).otherwise(5L)
    val wRank = Window.partitionBy($"event_type").orderBy($"m", $"rep")
    Tables.events(spark, dir)
      .select($"event_type", $"event_id", $"value",
        explode(sequence(lit(1), lit(reps))).as("rep"))
      .withColumn("w", pois)
      .groupBy($"event_type", $"rep")
      .agg((sum($"w" * $"value") / sum($"w")).as("m"))
      .withColumn("rk", row_number().over(wRank))
      .groupBy($"event_type")
      .agg(round(avg($"m"), 4).as("boot_mean"),
        round(min(when($"rk" === loRank, $"m")), 4).as("ci_lo"),
        round(min(when($"rk" === hiRank, $"m")), 4).as("ci_hi"))
      .orderBy($"event_type")
  }

  private def q145(spark: SparkSession, dir: String): DataFrame =
    bootstrapCi(spark, dir, reps = 100)

  private val q145Sql: String = {
    val u = Portable.hash32Sql(
      "CAST(event_id AS VARCHAR) || ':' || CAST(rep AS VARCHAR) || '#graft-boot'")
    s"""WITH ev AS (
       |  SELECT event_type, event_id, value, r.rep
       |  FROM events CROSS JOIN (SELECT UNNEST(range(1, 101)) AS rep) r
       |), wtd AS (
       |  SELECT event_type, rep, value,
       |         CASE WHEN u < 36788 THEN 0 WHEN u < 73576 THEN 1
       |              WHEN u < 91970 THEN 2 WHEN u < 98101 THEN 3
       |              WHEN u < 99634 THEN 4 ELSE 5 END AS w
       |  FROM (SELECT event_type, rep, value, $u % 100000 AS u FROM ev)
       |), rm AS (
       |  SELECT event_type, rep, sum(w * value) / sum(w) AS m
       |  FROM wtd GROUP BY 1, 2
       |), rk AS (
       |  SELECT event_type, m,
       |         row_number() OVER (PARTITION BY event_type ORDER BY m, rep) AS rk
       |  FROM rm
       |)
       |SELECT event_type, round(avg(m), 4) AS boot_mean,
       |       round(min(CASE WHEN rk = 3 THEN m END), 4) AS ci_lo,
       |       round(min(CASE WHEN rk = 98 THEN m END), 4) AS ci_hi
       |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // -------------------------------------------------------------- q148
  /** Equi-DEPTH value histogram per event type (10 equal-mass buckets
    * with realized bounds and counts) — q116's equi-width twin and the
    * optimizer-statistics shape ANALYZE actually keeps (equi-depth
    * bounds adapt to density, so selectivity estimates stay tight on
    * skewed values where fixed-width bins collapse into one hot bin).
    *
    * Determinism: ntile splits TIES POSITIONALLY, so the window orders
    * by (value, event_id) — the unique integer key makes the total
    * order engine-independent (q107's tie discipline). Bounds are raw
    * stored doubles selected by min/max — no arithmetic, no rounding.
    *
    * Scale shape: one shuffle per event type for the ntile sort, then
    * a partial+final count keyed (type, bucket). The full per-key sort
    * is the exact form; at 100 TB the same report derives from q54's
    * mergeable approx_percentile sketch (boundaries at k/10 quantiles)
    * without a global sort — exact here, sketch there, same columns. */
  /** Open-knob equi-depth core over ANY frame, shared by q148 and
    * [[graft.Graft.equidepthHistogram]]. `tieCol` must be a unique
    * per-row key — ntile splits ties positionally, so without it the
    * bucket boundary on a tied value would be engine- and
    * run-dependent. */
  private[graft] def equidepthHistogram(df: DataFrame, groupCol: String,
      valueCol: String, tieCol: String, bins: Int): DataFrame = {
    require(bins > 1 && bins <= 1000, s"need 1 < bins <= 1000 (got $bins)")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol), col(tieCol))
    df.select(col(groupCol), col(tieCol), col(valueCol))
      .withColumn("bucket", ntile(bins).over(w))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
      .orderBy(col(groupCol), col("bucket"))
  }

  private def q148(spark: SparkSession, dir: String): DataFrame =
    equidepthHistogram(Tables.events(spark, dir),
      groupCol = "event_type", valueCol = "value", tieCol = "event_id",
      bins = 10)

  private val q148Sql: String =
    """SELECT event_type, CAST(bucket AS INTEGER) AS bucket,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       min(value) AS lo, max(value) AS hi
      |FROM (SELECT event_type, value,
      |             ntile(10) OVER (PARTITION BY event_type
      |                             ORDER BY value, event_id) AS bucket
      |      FROM events)
      |GROUP BY 1, 2
      |ORDER BY event_type, bucket""".stripMargin

  // -------------------------------------------------------------- q169
  /** Full Pearson correlation matrix over the four numeric lineitem
    * measures — q115's sufficient-sum algebra generalized from one pair
    * to all C(4,2)=6: ONE partial+final aggregate computes every
    * first/second moment (n, Σxᵢ, Σxᵢ², Σxᵢxⱼ) in a single scan, and
    * the matrix is per-pair scalar math on the 1-row result. At 100 TB
    * the moment vector is the mergeable daily rollup (14 doubles per
    * partition, union-merge associative); widening from 4 to 400
    * features changes the aggregate width, never the scan count — the
    * standard feature-covariance pattern for training-data profiling.
    * Derived corr rounds at 6 dp (identical algebra both sides; only
    * summation-order ulp drift). */
  private val CorrCols = IndexedSeq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** Generic core (the facade's `Graft.correlationMatrix`): upper
    * triangle of the Pearson matrix over `cs` of any frame. */
  private[graft] def correlationMatrixOf(df: DataFrame, cs: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = cs.length
    val sums =
      Seq(count(lit(1)).cast("double").as("n")) ++
        cs.indices.map(i => sum(col(cs(i))).as(s"s$i")) ++
        cs.indices.map(i => sum(col(cs(i)) * col(cs(i))).as(s"q$i")) ++
        (for { i <- 0 until n; j <- (i + 1) until n }
          yield sum(col(cs(i)) * col(cs(j))).as(s"p${i}_$j"))
    val m = df.agg(sums.head, sums.tail: _*)
    val pairs = for { i <- 0 until n; j <- (i + 1) until n } yield
      m.select(
        lit(cs(i)).as("var_a"), lit(cs(j)).as("var_b"),
        $"n".cast("long").as("n_rows"),
        round(($"n" * col(s"p${i}_$j") - col(s"s$i") * col(s"s$j")) /
          sqrt(($"n" * col(s"q$i") - col(s"s$i") * col(s"s$i")) *
            ($"n" * col(s"q$j") - col(s"s$j") * col(s"s$j"))), 6).as("corr"))
    pairs.reduce(_ unionByName _).orderBy($"var_a", $"var_b")
  }

  private def q169(spark: SparkSession, dir: String): DataFrame =
    correlationMatrixOf(Tables.lineitem(spark, dir), CorrCols)

  private val q169Sql: String = {
    val n = CorrCols.length
    val moments =
      CorrCols.indices.map(i => s"sum(${CorrCols(i)}) AS s$i, sum(${CorrCols(i)} * ${CorrCols(i)}) AS q$i") ++
        (for { i <- 0 until n; j <- (i + 1) until n }
          yield s"sum(${CorrCols(i)} * ${CorrCols(j)}) AS p${i}_$j")
    val rows = (for { i <- 0 until n; j <- (i + 1) until n } yield
      s"""  SELECT '${CorrCols(i)}' AS var_a, '${CorrCols(j)}' AS var_b,
         |         CAST(n AS BIGINT) AS n_rows,
         |         round((n * p${i}_$j - s$i * s$j) /
         |               sqrt((n * q$i - s$i * s$i) * (n * q$j - s$j * s$j)), 6) AS corr
         |  FROM m""".stripMargin).mkString("\nUNION ALL\n")
    s"""WITH m AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n,
       |         ${moments.mkString(",\n         ")}
       |  FROM lineitem
       |)
       |$rows
       |ORDER BY var_a, var_b""".stripMargin
  }

  // -------------------------------------------------------------- q174
  /** Quantile normalization across event types — map every value onto
    * the POOLED distribution at its within-group rank, the batch-effect
    * harmonization standard from expression-array statistics (Bolstad
    * et al., Bioinformatics 2003) and the score-calibration step a
    * multi-source curation mix needs before thresholding quality scores
    * produced by different scorers: after the map, every group has an
    * identical value distribution, so one global cutoff means the same
    * thing in every group.
    *
    * Exactness across engines is all INTEGER rank algebra: within-group
    * rank r ∈ [0, n_g), pooled index `(r·(N−1)) div (n_g−1)` (midpoint
    * for a singleton group), then an equi-join against the pooled
    * order-statistics table — the emitted `norm_value` is a RAW input
    * double from the pooled table, never arithmetic, so nothing rounds.
    * Ties order by (value, event_id) on both sides.
    *
    * Scale: the per-group window partitions by event_type; the pooled
    * ranking runs DISTRIBUTED through [[Ranks.withGlobalRank]] (bucketed
    * two-phase prefix sum — no single-task full-table window; the
    * oracle's naive global-window spelling is the parity proof). The
    * pooled table joins back on the computed index: equi-join, shuffle
    * width = N rows of three columns. */
  private[graft] def quantileNormalize(events: DataFrame): DataFrame = {
    val wg = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val ranked = events
      .select(col("event_id"), col("event_type"), col("value"))
      .withColumn("rg", row_number().over(wg).cast("long") - 1)
      .withColumn("ng",
        count(lit(1)).over(Window.partitionBy(col("event_type"))))
    val pooled = Ranks.withGlobalRank(
        events.select(col("value").as("norm_value"), col("event_id").as("pid")),
        "norm_value", "pid", rn = "__prn", n = "__pn")
      .withColumn("gidx", col("__prn") - 1)
      .select(col("norm_value"), col("gidx"))
    val n = events.agg(count(lit(1)).as("nn"))
    ranked.crossJoin(broadcast(n))
      .withColumn("gidx",
        when(col("ng") > 1, expr("(rg * (nn - 1)) div (ng - 1)"))
          .otherwise(expr("(nn - 1) div 2")))
      .join(pooled, "gidx")
      .select(col("event_id"), col("event_type"), col("value"),
        col("norm_value"))
      .orderBy(col("event_id"))
  }

  private def q174(spark: SparkSession, dir: String): DataFrame =
    quantileNormalize(Tables.events(spark, dir))

  private val q174Sql: String =
    """WITH ranked AS (
      |  SELECT event_id, event_type, value,
      |         row_number() OVER (PARTITION BY event_type
      |                            ORDER BY value, event_id) - 1 AS rg,
      |         count(*) OVER (PARTITION BY event_type) AS ng
      |  FROM events
      |), pooled AS (
      |  SELECT value AS norm_value,
      |         row_number() OVER (ORDER BY value, event_id) - 1 AS gidx
      |  FROM events
      |), nn AS (SELECT count(*) AS nn FROM events)
      |SELECT r.event_id, r.event_type, r.value, p.norm_value
      |FROM ranked r CROSS JOIN nn
      |JOIN pooled p
      |  ON p.gidx = CASE WHEN r.ng > 1 THEN (r.rg * (nn.nn - 1)) // (r.ng - 1)
      |                   ELSE (nn.nn - 1) // 2 END
      |ORDER BY r.event_id""".stripMargin

  // -------------------------------------------------------------- q176
  /** EXACT per-group median WITHOUT a per-group full sort — the
    * histogram-refinement selection algorithm (the iterative
    * Blum-style distributed selection every large-scale exact-quantile
    * engine uses): pass 1 builds a 256-bucket equi-width histogram per
    * group (one hash aggregate, shuffle width = groups × 256); the
    * running bucket totals locate the single bucket holding the
    * median rank; pass 2 ranks ONLY that bucket's rows (the window
    * sort touches #rows/256 per group in expectation, recursable if a
    * bucket is still hot). Result is the exact lower-median order
    * statistic — rank ⌈n/2⌉ under (value, event_id) order — so the
    * oracle is DuckDB's own `quantile_disc(0.5)` and the gate
    * cross-validates the selection against a true sorted quantile.
    * Bucketing only needs to be MONOTONE in the value (any consistent
    * cut works — the rank arithmetic is exact), so the float bucket
    * arithmetic never needs cross-engine parity. Contrast q17 (exact
    * sort-based quartiles) and q54 (mergeable sketch, bounded error):
    * this is the third point on the quantile cost/exactness surface —
    * exact AND sort-free. */
  private[graft] def exactMedian(events: DataFrame, buckets: Int = 256): DataFrame = {
    require(buckets >= 2, s"need buckets >= 2 (got $buckets)")
    val vals = events.select(col("event_type").as("g"),
      col("value").as("v"), col("event_id").as("id"))
    val stats = vals.groupBy(col("g")).agg(
      count(lit(1)).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
    val bucketed = vals.join(broadcast(stats), "g")
      .withColumn("bkt",
        when(col("hi") === col("lo"), lit(0)).otherwise(
          least(floor((col("v") - col("lo")) / (col("hi") - col("lo"))
            * buckets), lit(buckets - 1))).cast("int"))
    val hist = bucketed.groupBy(col("g"), col("bkt"))
      .agg(count(lit(1)).as("cnt"))
    val wcum = Window.partitionBy(col("g")).orderBy(col("bkt"))
    val target = hist
      .withColumn("before", sum(col("cnt")).over(wcum) - col("cnt"))
      .join(broadcast(stats.select(col("g"),
        expr("(n + 1) div 2").as("k"))), "g")
      .filter(col("before") < col("k") &&
        col("k") <= col("before") + col("cnt"))
      .select(col("g"), col("bkt"), col("before"), col("k"))
    val wsel = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    bucketed.join(broadcast(target), Seq("g", "bkt"))
      .withColumn("rn", row_number().over(wsel).cast("long"))
      .filter(col("rn") === col("k") - col("before"))
      .select(col("g").as("event_type"), col("v").as("median"))
      .orderBy(col("event_type"))
  }

  private def q176(spark: SparkSession, dir: String): DataFrame =
    exactMedian(Tables.events(spark, dir))

  private val q176Sql: String =
    """SELECT event_type, quantile_disc(value, 0.5) AS median
      |FROM events
      |GROUP BY 1
      |ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------- q208
  /** EXACT weight-cumulative quartiles of a value under a weight column
    * — "what price level covers 25/50/75% of shipped QUANTITY", the
    * token-weighted percentile a training-mixture builder asks of
    * document length/quality distributions (quantiles of tokens, not
    * of documents — a 1M-token doc moves the curve 1M times more than
    * a 1-token doc). q176 selects by ROW rank; this selects by weight
    * mass: quartile k = min value v with cumWeight(≤v) ≥ k·W/4, cum
    * over DISTINCT values ascending (per-value weights pre-aggregated,
    * so tie order inside a value can't exist and the definition is
    * total).
    *
    * Exactness across engines is pure integer algebra: weights cast to
    * BIGINT (guarded — a fractional weight aborts loudly rather than
    * silently truncating), threshold test `cum·4 ≥ k·W` (never a
    * fractional q·W), and the emitted value is a RAW input double.
    *
    * Scale (q176's histogram-refinement, lifted to weight mass): one
    * hash aggregate to per-value weights (shuffle keyed by value), one
    * ≤`buckets`-row weighted histogram + constant-bounded prefix
    * window to locate each quartile's bucket, then a window over ONLY
    * the ≤3 target buckets' values (partitioned by quartile — touches
    * ~#values/buckets rows, recursable the same way). No full-table
    * sort, no single-task window; the oracle's naive
    * cumulative-over-all-values spelling is the parity proof. */
  private[graft] def weightedQuartiles(df: DataFrame, valueCol: String,
      weightCol: String, buckets: Int = 1024): DataFrame = {
    require(buckets >= 2, s"need buckets >= 2 (got $buckets)")
    // null values carry no weight mass: a quantile over NULL is
    // undefined, and engines disagree on where nulls cumulate (Spark
    // windows sort them first, DuckDB's naive cumulative last) — so
    // they are excluded by definition, not by accident of engine order
    val byVal = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).as("v"),
        when(col(weightCol) =!= floor(col(weightCol)), raise_error(format_string(
          "weightedQuartiles: fractional weight %s — integerize upstream",
          col(weightCol).cast("string"))))
          .otherwise(col(weightCol)).cast("long").as("w"))
      .groupBy(col("v")).agg(sum(col("w")).as("wv"))
    val stats = byVal.agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
      sum(col("wv")).as("tw"))
    val bucketed = byVal.crossJoin(broadcast(stats))
      .withColumn("bkt",
        when(col("hi") === col("lo"), lit(0)).otherwise(
          least(floor((col("v") - col("lo")) / (col("hi") - col("lo"))
            * buckets), lit(buckets - 1))).cast("int"))
      .drop("lo", "hi")
    val hist = bucketed.groupBy(col("bkt"))
      .agg(sum(col("wv")).as("bw"), min(col("tw")).as("tw"))
    // ≤`buckets` rows: constant-bounded global window (q111 discipline)
    val wcum = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val target = hist
      .withColumn("before", coalesce(sum(col("bw")).over(wcum), lit(0L)))
      .select(col("bkt"), col("before"), col("tw"),
        explode(array(lit(1), lit(2), lit(3))).as("quartile"))
      .filter(col("before") * 4 < col("quartile") * col("tw") &&
        (col("before") + col("bw")) * 4 >= col("quartile") * col("tw"))
      .select(col("quartile"), col("bkt"), col("before"), col("tw"))
    val wsel = Window.partitionBy(col("quartile")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.drop("tw").join(broadcast(target), "bkt")
      .withColumn("cum", col("before") + sum(col("wv")).over(wsel))
      .filter(col("cum") * 4 >= col("quartile") * col("tw"))
      .groupBy(col("quartile"))
      // cum is monotone in v inside the one target bucket, so min(cum)
      // belongs to min(v) — no min_by needed
      .agg(min(col("v")).as("value"), min(col("cum")).as("cum_w"),
        min(col("tw")).as("total_w"))
      .orderBy(col("quartile"))
  }

  private def q208(spark: SparkSession, dir: String): DataFrame =
    weightedQuartiles(Tables.lineitem(spark, dir),
      "l_extendedprice", "l_quantity")

  private val q208Sql: String =
    """WITH byv AS (
      |  SELECT l_extendedprice AS v,
      |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wv
      |  FROM lineitem GROUP BY 1
      |), c AS (
      |  SELECT v,
      |         sum(wv) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
      |         sum(wv) OVER () AS tw
      |  FROM byv
      |), ks AS (SELECT unnest([1, 2, 3]) AS quartile)
      |SELECT quartile, min(v) AS value,
      |       CAST(min(cum) AS BIGINT) AS cum_w,
      |       CAST(min(tw) AS BIGINT) AS total_w
      |FROM c JOIN ks ON c.cum * 4 >= ks.quartile * c.tw
      |GROUP BY quartile
      |ORDER BY quartile""".stripMargin

  // -------------------------------------------------------------- q179
  /** Weight-of-evidence binning of order value against fulfillment —
    * the credit-scoring feature diagnostic (Siddiqi, "Credit Risk
    * Scorecards"): 10 equi-depth bins of o_totalprice (q148's
    * ntile-with-unique-tiebreak discipline), per bin the
    * positive/negative split (outcome = orderstatus 'F'), WOE =
    * ln((posᵢ/pos)/(negᵢ/neg)), and the bin's information-value term
    * (distₚ − distₙ)·WOE — Σ iv over bins is the feature's predictive
    * power. Binning runs DISTRIBUTED through [[Ranks.withGlobalRank]] +
    * [[Ranks.ntileFromRank]] (no single-task full-table window — the
    * oracle's naive ntile spelling is the parity proof) + one hash
    * aggregate; counts are exact integers, WOE/IV are single libm
    * expressions over count ratios rounded at 6 dp on both engines. */
  private[graft] def woeBinning(orders: DataFrame, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need bins >= 2 (got $bins)")
    val binned = Ranks.withGlobalRank(
        orders.select(col("o_totalprice"),
          (col("o_orderstatus") === "F").cast("long").as("pos"),
          col("o_orderkey")),
        "o_totalprice", "o_orderkey", rn = "__rn", n = "__n")
      .withColumn("bin", Ranks.ntileFromRank("__rn", "__n", bins))
    val cells = binned.groupBy(col("bin")).agg(
      count(lit(1)).as("n"),
      sum(col("pos")).as("n_pos"),
      min(col("o_totalprice")).as("lo"),
      max(col("o_totalprice")).as("hi"))
    val tot = cells.agg(sum(col("n_pos")).cast("double").as("tp"),
      (sum(col("n")) - sum(col("n_pos"))).cast("double").as("tn"))
    cells.crossJoin(broadcast(tot))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("n") - col("n_pos")).as("n_neg"), col("lo"), col("hi"),
        round(log((col("n_pos") / col("tp")) /
          ((col("n") - col("n_pos")) / col("tn"))), 6).as("woe"),
        round((col("n_pos") / col("tp") - (col("n") - col("n_pos")) / col("tn")) *
          log((col("n_pos") / col("tp")) /
            ((col("n") - col("n_pos")) / col("tn"))), 6).as("iv_term"))
      .orderBy(col("bin"))
  }

  private def q179(spark: SparkSession, dir: String): DataFrame =
    woeBinning(Tables.orders(spark, dir))

  // -------------------------------------------------------------- q182
  /** Median/MAD robust outlier report per event type — the SCALE-PATH
    * twin of q91: q91 computes the same robust fence with the
    * interpolating `percentile` aggregate (per-group sort inside the
    * aggregate, Iglewicz–Hoaglin 3.5 fence); this variant computes
    * DISCRETE (lower) medians by sort-free histogram-refinement
    * selection and the Hampel 3.0 fence — the form that survives when
    * per-group value volume makes sort-based percentile aggregation
    * the bottleneck, exactly the q17 → q54 exact↔approx pairing but
    * staying EXACT (different median convention, hence different
    * oracle: quantile_disc vs quantile_cont). Composes
    * [[exactMedian]] TWICE — median of values, then median of absolute
    * deviations — so the whole report inherits q176's sort-free
    * selection economics (two histogram aggregates + two one-bucket
    * rank windows per level; never a per-group full sort). The
    * emitted median/MAD are raw order statistics (nothing rounds);
    * the fence multiply `3 · 1.4826 · mad` is the same left-to-right
    * IEEE expression both engines fold identically. */
  private[graft] def madOutliers(events: DataFrame): DataFrame = {
    val med = exactMedian(events)
      .select(col("event_type"), col("median"))
    val joined = events.select(col("event_type"), col("value"), col("event_id"))
      .join(broadcast(med), "event_type")
    val mad = exactMedian(
        joined.select(col("event_type"),
          abs(col("value") - col("median")).as("value"), col("event_id")))
      .select(col("event_type"), col("median").as("mad"))
    joined.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(first(col("median")).as("median"), first(col("mad")).as("mad"),
        count(lit(1)).as("n"),
        sum((abs(col("value") - col("median")) > lit(3) * lit(1.4826) * col("mad"))
          .cast("long")).as("n_outliers"))
      .select(col("event_type"), col("median"), col("mad"), col("n"),
        col("n_outliers"),
        round(col("n_outliers") / col("n").cast("double"), 6).as("outlier_frac"))
      .orderBy(col("event_type"))
  }

  private def q182(spark: SparkSession, dir: String): DataFrame =
    madOutliers(Tables.events(spark, dir))

  private val q182Sql: String =
    """WITH med AS (
      |  SELECT event_type, quantile_disc(value, 0.5) AS median
      |  FROM events GROUP BY 1
      |), dev AS (
      |  SELECT e.event_type, e.value, m.median
      |  FROM events e JOIN med m USING (event_type)
      |), mad AS (
      |  SELECT event_type, quantile_disc(abs(value - median), 0.5) AS mad
      |  FROM dev GROUP BY 1
      |)
      |SELECT d.event_type, d.median, a.mad,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(count(*) FILTER (WHERE abs(d.value - d.median)
      |                                   > 3 * 1.4826 * a.mad) AS BIGINT)
      |         AS n_outliers,
      |       round(CAST(count(*) FILTER (WHERE abs(d.value - d.median)
      |                                         > 3 * 1.4826 * a.mad) AS DOUBLE)
      |             / count(*), 6) AS outlier_frac
      |FROM dev d JOIN mad a USING (event_type)
      |GROUP BY 1, 2, 3
      |ORDER BY event_type""".stripMargin

  private val q179Sql: String =
    """WITH binned AS (
      |  SELECT o_totalprice,
      |         CAST(o_orderstatus = 'F' AS BIGINT) AS pos,
      |         ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
      |  FROM orders
      |), cells AS (
      |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(pos) AS BIGINT) AS n_pos,
      |         min(o_totalprice) AS lo, max(o_totalprice) AS hi
      |  FROM binned GROUP BY 1
      |), tot AS (
      |  SELECT CAST(sum(n_pos) AS DOUBLE) AS tp,
      |         CAST(sum(n) - sum(n_pos) AS DOUBLE) AS tn
      |  FROM cells
      |)
      |SELECT CAST(bin AS INTEGER) AS bin, n, n_pos, n - n_pos AS n_neg, lo, hi,
      |       round(ln((n_pos / tp) / ((n - n_pos) / tn)), 6) AS woe,
      |       round((n_pos / tp - (n - n_pos) / tn) *
      |             ln((n_pos / tp) / ((n - n_pos) / tn)), 6) AS iv_term
      |FROM cells CROSS JOIN tot
      |ORDER BY bin""".stripMargin

  // -------------------------------------------------------------- q191
  /** Functional-dependency discovery over the orders dimension columns
    * — the ANALYZE-adjacent profiling step schema tools run before
    * normalization / dedup-key selection (Papenbrock et al. VLDB'15
    * frame the search; this is the bounded-column-set audit tier):
    * A → B holds iff every A-group sees exactly one B value. For every
    * ordered pair over the 4-column candidate set, emits the group
    * count, how many groups violate, the worst per-group RHS
    * cardinality, and the verdict — all exact integers, hash-exact.
    *
    * Scale shape: each pair is a two-level partial+final aggregate
    * (groupBy LHS with countDistinct RHS, then one contraction row) —
    * shuffle width = LHS cardinality. The pair set is a compile-time
    * profiling budget (k² aggregates over one pruned 4-column scan);
    * at 100 TB you run it with the same budget, or seed candidates
    * from q106's NDV stats (NDV(A) ≈ NDV(A,B) is the cheap prefilter). */
  private val FdCols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")

  private def q191(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.orders(spark, dir).select(FdCols.map(col): _*)
    val pairFrames = for {
      a <- FdCols; b <- FdCols if a != b
    } yield base
      .groupBy(col(a))
      .agg(countDistinct(col(b)).as("ndb"))
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when($"ndb" > 1, 1L).otherwise(0L)).as("violating_groups"),
        max($"ndb").as("max_rhs"))
      .select(lit(a).as("lhs"), lit(b).as("rhs"),
        $"n_groups", $"violating_groups", $"max_rhs",
        ($"max_rhs" === 1L).cast("int").as("holds"))
    pairFrames.reduce(_ unionAll _).orderBy($"lhs", $"rhs")
  }

  private val q191Sql: String = {
    val selects = for { a <- FdCols; b <- FdCols if a != b } yield
      s"""  SELECT '$a' AS lhs, '$b' AS rhs,
         |         CAST(count(*) AS BIGINT) AS n_groups,
         |         CAST(sum(CASE WHEN ndb > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating_groups,
         |         CAST(max(ndb) AS BIGINT) AS max_rhs,
         |         CAST(max(ndb) = 1 AS INTEGER) AS holds
         |  FROM (SELECT $a, CAST(count(DISTINCT $b) AS BIGINT) AS ndb
         |        FROM orders GROUP BY 1)""".stripMargin
    selects.mkString("", "\n  UNION ALL\n", "\nORDER BY lhs, rhs")
  }

  // -------------------------------------------------------------- q192
  /** Mutual information between event type and global value decile —
    * the NONLINEAR dependence profile next to q169's linear
    * correlations and q117's chi-square: MI = Σ p_td·ln(p_td/(p_t·p_d))
    * measured over the (type, decile) contingency cells. Emitted
    * per-cell so the report localizes WHERE the dependence lives
    * (which type concentrates in which value band); the spec sums the
    * terms to the scalar MI and checks non-negativity.
    *
    * Determinism: deciles are ntile(10) ordered by (value, event_id) —
    * q148's unique tiebreak, engine-identical; `lift` is the exact
    * integer cross-ratio n_td·n / (n_t·n_d) in one fixed
    * parenthesization (BIGINT products — exact through ~3·10⁹ rows,
    * past that the same formula runs in doubles); only the ln display
    * term rounds (detRound 6). Shape: deciles via the DISTRIBUTED exact
    * rank ([[Ranks.withGlobalRank]] + [[Ranks.ntileFromRank]] — no
    * single-task full-table window; the oracle's naive ntile spelling
    * is the parity proof), then partial+final cell counts + two
    * broadcast margins. */
  private def q192(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val binned = Ranks.withGlobalRank(
        Tables.events(spark, dir).select($"event_type", $"value", $"event_id"),
        "value", "event_id", rn = "__rn", n = "__n")
      .withColumn("decile", Ranks.ntileFromRank("__rn", "__n", 10))
    val cells = binned.groupBy($"event_type", $"decile")
      .agg(count(lit(1)).as("n_td"))
    val mt = cells.groupBy($"event_type").agg(sum($"n_td").as("n_t"))
    val md = cells.groupBy($"decile").agg(sum($"n_td").as("n_d"))
    val n = cells.agg(sum($"n_td").as("n"))
    val lift = ($"n_td" * $"n").cast("double") / ($"n_t" * $"n_d")
    cells
      .join(broadcast(mt), Seq("event_type"))
      .join(broadcast(md), Seq("decile"))
      .crossJoin(broadcast(n))
      .select($"event_type", $"decile", $"n_td", $"n_t", $"n_d",
        lift.as("lift"),
        round(($"n_td".cast("double") / $"n") * log(lift), 6).as("mi_term"))
      .orderBy($"event_type", $"decile")
  }

  private val q192Sql: String =
    """WITH binned AS (
      |  SELECT event_type,
      |         ntile(10) OVER (ORDER BY value, event_id) AS decile
      |  FROM events
      |), cells AS (
      |  SELECT event_type, decile, CAST(count(*) AS BIGINT) AS n_td
      |  FROM binned GROUP BY 1, 2
      |), mt AS (SELECT event_type, CAST(sum(n_td) AS BIGINT) AS n_t FROM cells GROUP BY 1),
      |md AS (SELECT decile, CAST(sum(n_td) AS BIGINT) AS n_d FROM cells GROUP BY 1),
      |nt AS (SELECT CAST(sum(n_td) AS BIGINT) AS n FROM cells)
      |SELECT c.event_type, CAST(c.decile AS INTEGER) AS decile, c.n_td, mt.n_t, md.n_d,
      |       CAST(c.n_td * n AS DOUBLE) / (mt.n_t * md.n_d) AS lift,
      |       round((CAST(c.n_td AS DOUBLE) / n) *
      |             ln(CAST(c.n_td * n AS DOUBLE) / (mt.n_t * md.n_d)), 6) AS mi_term
      |FROM cells c
      |JOIN mt ON mt.event_type = c.event_type
      |JOIN md ON md.decile = c.decile
      |CROSS JOIN nt
      |ORDER BY c.event_type, c.decile""".stripMargin

  // -------------------------------------------------------------- q199
  /** Simpson's-paradox audit: mean order value of fulfilled ('F') vs
    * open ('O') orders, POOLED and per priority stratum, with a
    * reversal flag where a stratum's effect sign contradicts the
    * pooled sign — the confounding detector (Simpson '51; Bickel et
    * al., Science '75 — the Berkeley admissions structure) every A/B
    * readout and observational comparison should run before trusting a
    * pooled difference. Emitted per stratum so the report localizes
    * WHERE the reversal lives.
    *
    * Determinism: means are q40's exact-decimal form — round(Σ, 2)
    * (construction-exact cents) divided by the exact count, one IEEE
    * divide per mean; diffs subtract identical doubles; the terminal
    * 4 dp round absorbs nothing but presentation. Shape: one
    * partial+final aggregate to the #strata×2 cell frame, a 1-row
    * pooled broadcast, all-scalar algebra after. */
  private def q199(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.orders(spark, dir)
      .filter($"o_orderstatus".isin("F", "O"))
      .groupBy($"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("s"))
    def side(st: String, c: String) =
      sum(when($"o_orderstatus" === st, col(c))).as(s"${c}_$st")
    val strata = cells.groupBy($"o_orderpriority")
      .agg(side("F", "n"), side("F", "s"), side("O", "n"), side("O", "s"))
      .withColumn("mean_f", $"s_F" / $"n_F")
      .withColumn("mean_o", $"s_O" / $"n_O")
    val pooled = cells.groupBy()
      .agg(
        sum(when($"o_orderstatus" === "F", $"n")).as("pn_F"),
        round(sum(when($"o_orderstatus" === "F", $"s")), 2).as("ps_F"),
        sum(when($"o_orderstatus" === "O", $"n")).as("pn_O"),
        round(sum(when($"o_orderstatus" === "O", $"s")), 2).as("ps_O"))
      .select(($"ps_F" / $"pn_F").as("pmean_F"), ($"ps_O" / $"pn_O").as("pmean_O"))
    strata.crossJoin(broadcast(pooled))
      .withColumn("pooled_diff", $"pmean_F" - $"pmean_O")
      .select($"o_orderpriority",
        $"n_F", $"n_O",
        round($"mean_f", 4).as("mean_f"),
        round($"mean_o", 4).as("mean_o"),
        round($"mean_f" - $"mean_o", 4).as("diff"),
        round($"pooled_diff", 4).as("pooled_diff"),
        (($"mean_f" - $"mean_o" > 0) =!= ($"pooled_diff" > 0))
          .cast("int").as("reversed"))
      .orderBy($"o_orderpriority")
  }

  private val q199Sql: String =
    """WITH cells AS (
      |  SELECT o_orderpriority, o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      |         round(sum(o_totalprice), 2) AS s
      |  FROM orders WHERE o_orderstatus IN ('F', 'O')
      |  GROUP BY 1, 2
      |), strata AS (
      |  SELECT o_orderpriority,
      |         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN n END) AS BIGINT) AS n_F,
      |         sum(CASE WHEN o_orderstatus = 'F' THEN s END) AS s_F,
      |         CAST(sum(CASE WHEN o_orderstatus = 'O' THEN n END) AS BIGINT) AS n_O,
      |         sum(CASE WHEN o_orderstatus = 'O' THEN s END) AS s_O
      |  FROM cells GROUP BY 1
      |), pooled AS (
      |  SELECT sum(CASE WHEN o_orderstatus = 'F' THEN n END) AS pn_F,
      |         round(sum(CASE WHEN o_orderstatus = 'F' THEN s END), 2) AS ps_F,
      |         sum(CASE WHEN o_orderstatus = 'O' THEN n END) AS pn_O,
      |         round(sum(CASE WHEN o_orderstatus = 'O' THEN s END), 2) AS ps_O
      |  FROM cells
      |)
      |SELECT o_orderpriority, n_F, n_O,
      |       round(s_F / n_F, 4) AS mean_f,
      |       round(s_O / n_O, 4) AS mean_o,
      |       round(s_F / n_F - s_O / n_O, 4) AS diff,
      |       round(ps_F / pn_F - ps_O / pn_O, 4) AS pooled_diff,
      |       CAST((s_F / n_F - s_O / n_O > 0) <> (ps_F / pn_F - ps_O / pn_O > 0)
      |            AS INTEGER) AS reversed
      |FROM strata CROSS JOIN pooled
      |ORDER BY o_orderpriority""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q199_simpson_reversal", q199, Some(q199Sql)),
    Q("q191_fd_discovery", q191, Some(q191Sql)),
    Q("q192_mutual_information", q192, Some(q192Sql)),
    Q("q115_bivariate_profile", q115, Some(q115Sql)),
    Q("q174_quantile_normalize", q174, Some(q174Sql)),
    Q("q176_exact_median", q176, Some(q176Sql)),
    Q("q208_weighted_quartiles", q208, Some(q208Sql)),
    Q("q179_woe_binning", q179, Some(q179Sql)),
    Q("q182_mad_outliers", q182, Some(q182Sql)),
    Q("q169_correlation_matrix", q169, Some(q169Sql)),
    Q("q116_value_histogram", q116, Some(q116Sql)),
    Q("q148_equidepth_histogram", q148, Some(q148Sql)),
    Q("q117_chi_square_cells", q117, Some(q117Sql)),
    Q("q129_robust_means", q129, Some(q129Sql)),
    Q("q132_pareto_classes", q132, Some(q132Sql)),
    Q("q135_gini_concentration", q135, Some(q135Sql)),
    Q("q144_benford_digits", q144, Some(q144Sql)),
    Q("q145_bootstrap_ci", q145, Some(q145Sql)),
  )
}
