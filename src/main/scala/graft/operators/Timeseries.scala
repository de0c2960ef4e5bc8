package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.Q
import graft.sources.Tables

/** Time-series monitoring operators over the events stream: CUSUM
  * changepoint detection, seasonal decomposition with residual
  * anomalies, and a seasonal-naive forecast backtest. These are the
  * drift monitors a pipeline runs over its OWN ingest telemetry — the
  * batch generalization of the reference's per-window anomaly loop
  * (lambda-sample analyzer/src/main/scala/analyzer/Analyzer.scala:47-59
  * scores one sliding window; these score the whole history per key).
  *
  * Scale design shared by the family: the raw scan reduces to a
  * (key, time-bucket) grid in ONE partial+final aggregate — 100 TB of
  * events becomes #keys × #buckets rows (thousands) — and every window
  * function after runs on that tiny grid, partitioned by key. Nothing
  * downstream of the first aggregate ever rescans the corpus, and the
  * per-key window state is bounded by the bucket count, not the row
  * count.
  *
  * Determinism: bucket counts are integers, and integer-valued doubles
  * below 2^53 sum EXACTLY in any order — so the sufficient sums
  * (n, Σx, Σx²) here are bit-identical across engines despite partial
  * aggregation, sqrt is IEEE exact-rounded (not libm-approximate), and
  * running window sums evaluate in ORDER BY order on both engines.
  * q125's whole pipeline is therefore drift-free by construction;
  * q126's residual sums are the one non-integer reduction, so its flag
  * comparison runs on 6-dp-rounded operands on both sides.
  */
object Timeseries extends DetRounding {

  // -------------------------------------------------------------- q125
  /** One-sided CUSUM changepoint detection on daily event volume per
    * type. The textbook recurrence S_t = max(0, S_{t-1} + y_t) is not
    * a window function — but it has a closed scan form:
    *
    *   S_t = P_t − min(0, min_{j≤t} P_j),  P_t = Σ_{i≤t} y_i
    *
    * (a reset happens exactly where the prefix sum attains a new
    * minimum), so the sequential recurrence becomes two running
    * windows — prefix sum + running min — and DISTRIBUTES: per-key
    * ordered scans over the daily grid, no iterative driver loop. The
    * slack y_t = x_t − μ − 0.5σ and threshold 4σ are the standard
    * CUSUM parameterization (Page 1954); μ, σ derive from raw
    * sufficient sums (catalog rule: never engine stddev built-ins —
    * their streaming-moment low bits differ).
    *
    * `breach` compares UNROUNDED doubles safely: every input to both
    * sides is integer-exact or IEEE-exact-rounded (see object doc), so
    * the comparison is bit-deterministic across engines. */
  private def q125(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy($"event_type", to_date(date_trunc("day", $"ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("cnt"))
    // per-type moments as UNORDERED windows over the grid, not a
    // grouped-join — the grid is derived once from one corpus scan
    // (a join would re-derive it: AQE defers exchange reuse to
    // runtime, so the initial plan carries two scans), and integer
    // window sums are order-independent, so the unordered frame costs
    // nothing in determinism
    val wType = Window.partitionBy($"event_type")
    val wRun = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("n", count(lit(1)).over(wType).cast("double"))
      .withColumn("sx", sum($"cnt").over(wType))
      .withColumn("sxx", sum($"cnt" * $"cnt").over(wType))
      .withColumn("sigma", sqrt($"n" * $"sxx" - $"sx" * $"sx") / $"n")
      .withColumn("yv", $"cnt" - $"sx" / $"n" - lit(0.5) * $"sigma")
      .withColumn("pre", sum($"yv").over(wRun))
      .withColumn("runmin", least(min($"pre").over(wRun), lit(0.0)))
      .select($"event_type", $"day", $"cnt".cast("long").as("cnt"),
        round($"pre" - $"runmin", 4).as("cusum"),
        ($"pre" - $"runmin" > lit(4.0) * $"sigma").cast("int").as("breach"))
      .orderBy($"event_type", $"day")
  }

  /** Identical algebra, spelled operation-for-operation the same:
    * sigma is computed ONCE and reused so `0.5 * sigma` and
    * `4.0 * sigma` share the exact operand bits with the Spark side. */
  private val q125Sql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |         CAST(count(*) AS DOUBLE) AS cnt
      |  FROM events GROUP BY 1, 2
      |), st AS (
      |  SELECT event_type, day, cnt,
      |         CAST(count(*) OVER (PARTITION BY event_type) AS DOUBLE) AS n,
      |         sum(cnt) OVER (PARTITION BY event_type) AS sx,
      |         sum(cnt * cnt) OVER (PARTITION BY event_type) AS sxx
      |  FROM daily
      |), y AS (
      |  SELECT event_type, day, cnt,
      |         sqrt(n * sxx - sx * sx) / n AS sigma,
      |         cnt - sx / n - 0.5 * (sqrt(n * sxx - sx * sx) / n) AS yv
      |  FROM st
      |), p AS (
      |  SELECT event_type, day, cnt, sigma,
      |         sum(yv) OVER (PARTITION BY event_type ORDER BY day
      |                       ROWS UNBOUNDED PRECEDING) AS pre
      |  FROM y
      |), m AS (
      |  SELECT event_type, day, cnt, sigma, pre,
      |         least(min(pre) OVER (PARTITION BY event_type ORDER BY day
      |                              ROWS UNBOUNDED PRECEDING), 0.0) AS runmin
      |  FROM p
      |)
      |SELECT event_type, day, CAST(cnt AS BIGINT) AS cnt,
      |       round(pre - runmin, 4) AS cusum,
      |       CAST(pre - runmin > 4.0 * sigma AS INTEGER) AS breach
      |FROM m ORDER BY event_type, day""".stripMargin

  // -------------------------------------------------------------- q126
  /** Additive seasonal decomposition of hourly volume per event type:
    * seasonal component = hour-of-day mean, residual = observed −
    * seasonal, and a 3σ residual outlier flag — "which hours deviated
    * from this key's daily rhythm", the shape q48's gap-fill resample
    * feeds into dashboards. Seasonal means are exact (integer sums /
    * integer counts); the residual second moment is the family's one
    * non-integer reduction, so the outlier comparison rounds BOTH
    * operands to 6 dp on both sides — a flag can flip only if the true
    * margin sits within summation ulp of a 1e-6 grid midpoint.
    *
    * Plan: corpus → hourly grid (one aggregate); the seasonal means
    * and residual moments are unordered windows OVER the grid itself —
    * one corpus scan, zero joins, no window wider than a per-type
    * slice of the grid. */
  private def q126(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wCell = Window.partitionBy($"event_type", $"hod")
    val wType = Window.partitionBy($"event_type")
    Tables.events(spark, dir)
      .groupBy($"event_type", date_trunc("hour", $"ts").as("hour_ts"))
      .agg(count(lit(1)).cast("double").as("cnt"))
      .withColumn("hod", hour($"hour_ts"))
      // q125's one-scan discipline: seasonal means and residual moments
      // are unordered windows over the grid, never joins back onto it
      .withColumn("s", sum($"cnt").over(wCell) / count(lit(1)).over(wCell))
      .withColumn("resid", $"cnt" - $"s")
      .withColumn("rn", count(lit(1)).over(wType).cast("double"))
      .withColumn("rsx", sum($"resid").over(wType))
      .withColumn("rsxx", sum($"resid" * $"resid").over(wType))
      .select($"event_type", $"hour_ts", $"cnt".cast("long").as("cnt"),
        round($"s", 4).as("seasonal"), round($"resid", 4).as("resid"),
        (round(abs($"resid" - $"rsx" / $"rn"), 6) >
          round(lit(3.0) * (sqrt($"rn" * $"rsxx" - $"rsx" * $"rsx") / $"rn"), 6))
          .cast("int").as("outlier"))
      .orderBy($"event_type", $"hour_ts")
  }

  private val q126Sql: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour_ts,
      |         CAST(count(*) AS DOUBLE) AS cnt, hour(date_trunc('hour', ts)) AS hod
      |  FROM events GROUP BY 1, 2, 4
      |), seas AS (
      |  SELECT event_type, hour_ts, cnt,
      |         sum(cnt) OVER (PARTITION BY event_type, hod) /
      |           count(*) OVER (PARTITION BY event_type, hod) AS s
      |  FROM hourly
      |), r AS (
      |  SELECT event_type, hour_ts, cnt, s, cnt - s AS resid FROM seas
      |), rs AS (
      |  SELECT event_type, hour_ts, cnt, s, resid,
      |         CAST(count(*) OVER (PARTITION BY event_type) AS DOUBLE) AS rn,
      |         sum(resid) OVER (PARTITION BY event_type) AS rsx,
      |         sum(resid * resid) OVER (PARTITION BY event_type) AS rsxx
      |  FROM r
      |)
      |SELECT event_type, hour_ts, CAST(cnt AS BIGINT) AS cnt,
      |       round(s, 4) AS seasonal, round(resid, 4) AS resid,
      |       CAST(round(abs(resid - rsx / rn), 6) >
      |            round(3.0 * (sqrt(rn * rsxx - rsx * rsx) / rn), 6)
      |         AS INTEGER) AS outlier
      |FROM rs
      |ORDER BY event_type, hour_ts""".stripMargin

  // -------------------------------------------------------------- q127
  /** Forecast backtest: score a seasonal-naive model (ŷ_t = y_{t−7},
    * weekly seasonality) against the last-value naive baseline over
    * the final 7 days of each type's daily series — MAE for both and
    * sMAPE for the model. The go/no-go check before trusting any
    * volume forecast for capacity planning; the pattern (lag-k
    * predictor + holdout tail + error aggregate) extends to any
    * window-expressible model. MAE sums are integer-exact; sMAPE's
    * rational terms round at 6 dp. Lags and the holdout rank run over
    * the observed daily grid, identical on both sides. */
  private def q127(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy($"event_type", to_date(date_trunc("day", $"ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("cnt"))
    val wLag = Window.partitionBy($"event_type").orderBy($"day")
    val wTail = Window.partitionBy($"event_type").orderBy($"day".desc)
    daily
      .withColumn("snaive", lag($"cnt", 7).over(wLag))
      .withColumn("naive", lag($"cnt", 1).over(wLag))
      .withColumn("rn", row_number().over(wTail))
      .filter($"rn" <= 7)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("test_days"),
        round(sum(abs($"cnt" - $"snaive")) / count(lit(1)), 4).as("mae_snaive"),
        round(sum(abs($"cnt" - $"naive")) / count(lit(1)), 4).as("mae_naive"),
        round(sum(lit(2.0) * abs($"cnt" - $"snaive") /
          (abs($"cnt") + abs($"snaive"))) / count(lit(1)), 6).as("smape_snaive"))
      .orderBy($"event_type")
  }

  private val q127Sql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |         CAST(count(*) AS DOUBLE) AS cnt
      |  FROM events GROUP BY 1, 2
      |), lagged AS (
      |  SELECT event_type, day, cnt,
      |         lag(cnt, 7) OVER (PARTITION BY event_type ORDER BY day) AS snaive,
      |         lag(cnt, 1) OVER (PARTITION BY event_type ORDER BY day) AS naive,
      |         row_number() OVER (PARTITION BY event_type ORDER BY day DESC) AS rn
      |  FROM daily
      |)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS test_days,
      |       round(sum(abs(cnt - snaive)) / count(*), 4) AS mae_snaive,
      |       round(sum(abs(cnt - naive)) / count(*), 4) AS mae_naive,
      |       round(sum(2.0 * abs(cnt - snaive) / (abs(cnt) + abs(snaive)))
      |             / count(*), 6) AS smape_snaive
      |FROM lagged WHERE rn <= 7
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------- q130
  /** Rolling 7-day correlation between two daily series (click vs
    * purchase volume) — "do these streams move together this week",
    * the pairwise drift monitor between q115's static regression and
    * q125's single-series changepoints. The two series come out of ONE
    * corpus scan as conditional counts on the daily grid; the rolling
    * sufficient sums (n, Σx, Σy, Σxy, Σx², Σy²) are frame windows over
    * that grid and stay integer-exact, so the correlation is
    * bit-deterministic (object doc). Rows before a full 7-day frame
    * are suppressed on both sides. */
  private def q130(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(date_trunc("day", $"ts")).as("day"))
      .agg(sum(when($"event_type" === "click", 1).otherwise(0)).cast("double").as("x"),
        sum(when($"event_type" === "purchase", 1).otherwise(0)).cast("double").as("y"))
    val w = Window.orderBy($"day").rowsBetween(-6, Window.currentRow)
    val wSeq = Window.orderBy($"day")
    daily
      .withColumn("n", count(lit(1)).over(w).cast("double"))
      .withColumn("sx", sum($"x").over(w)).withColumn("sy", sum($"y").over(w))
      .withColumn("sxy", sum($"x" * $"y").over(w))
      .withColumn("sxx", sum($"x" * $"x").over(w))
      .withColumn("syy", sum($"y" * $"y").over(w))
      .withColumn("rn", row_number().over(wSeq))
      .filter($"rn" >= 7)
      .select($"day", $"x".cast("long").as("clicks"), $"y".cast("long").as("purchases"),
        round(($"n" * $"sxy" - $"sx" * $"sy") /
          sqrt(($"n" * $"sxx" - $"sx" * $"sx") *
            ($"n" * $"syy" - $"sy" * $"sy")), 6).as("corr_7d"))
      .orderBy($"day")
  }

  /** The day grid is one global ordered window — fine for a daily
    * series (#days rows at any corpus scale); a per-key variant would
    * partition by key exactly like q125/q131. */
  private val q130Sql: String =
    """WITH daily AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
      |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |              AS DOUBLE) AS x,
      |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |              AS DOUBLE) AS y
      |  FROM events GROUP BY 1
      |), s AS (
      |  SELECT day, x, y,
      |         CAST(count(*) OVER w AS DOUBLE) AS n,
      |         sum(x) OVER w AS sx, sum(y) OVER w AS sy,
      |         sum(x*y) OVER w AS sxy, sum(x*x) OVER w AS sxx,
      |         sum(y*y) OVER w AS syy,
      |         row_number() OVER (ORDER BY day) AS rn
      |  FROM daily
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      |)
      |SELECT day, CAST(x AS BIGINT) AS clicks, CAST(y AS BIGINT) AS purchases,
      |       round((n * sxy - sx * sy) /
      |             sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_7d
      |FROM s WHERE rn >= 7 ORDER BY day""".stripMargin

  // -------------------------------------------------------------- q131
  /** Rolling volatility bands (Bollinger): per-type 7-day rolling mean
    * ± 2 rolling σ with a breakout flag — q125 detects sustained level
    * shifts, this flags single-day excursions against the RECENT
    * regime rather than the whole-history stats q126 uses. Same
    * one-scan daily grid, same integer-exact window sums, so the
    * unrounded breakout comparison is bit-deterministic. Warm-up rows
    * (< 7 days of history) are suppressed on both sides. */
  private def q131(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy($"event_type", to_date(date_trunc("day", $"ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("cnt"))
    val w = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(-6, Window.currentRow)
    val wSeq = Window.partitionBy($"event_type").orderBy($"day")
    daily
      .withColumn("n", count(lit(1)).over(w).cast("double"))
      .withColumn("sx", sum($"cnt").over(w))
      .withColumn("sxx", sum($"cnt" * $"cnt").over(w))
      .withColumn("rn", row_number().over(wSeq))
      .filter($"rn" >= 7)
      .withColumn("mid", $"sx" / $"n")
      .withColumn("band", lit(2.0) * (sqrt($"n" * $"sxx" - $"sx" * $"sx") / $"n"))
      .select($"event_type", $"day", $"cnt".cast("long").as("cnt"),
        round($"mid", 4).as("mid"),
        round($"mid" - $"band", 4).as("lower_band"),
        round($"mid" + $"band", 4).as("upper_band"),
        ($"cnt" > $"mid" + $"band" || $"cnt" < $"mid" - $"band")
          .cast("int").as("breakout"))
      .orderBy($"event_type", $"day")
  }

  private val q131Sql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |         CAST(count(*) AS DOUBLE) AS cnt
      |  FROM events GROUP BY 1, 2
      |), s AS (
      |  SELECT event_type, day, cnt,
      |         CAST(count(*) OVER w AS DOUBLE) AS n,
      |         sum(cnt) OVER w AS sx, sum(cnt*cnt) OVER w AS sxx,
      |         row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      |  FROM daily
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day
      |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      |), m AS (
      |  SELECT event_type, day, cnt, sx / n AS mid,
      |         2.0 * (sqrt(n * sxx - sx * sx) / n) AS band
      |  FROM s WHERE rn >= 7
      |)
      |SELECT event_type, day, CAST(cnt AS BIGINT) AS cnt,
      |       round(mid, 4) AS mid, round(mid - band, 4) AS lower_band,
      |       round(mid + band, 4) AS upper_band,
      |       CAST(cnt > mid + band OR cnt < mid - band AS INTEGER) AS breakout
      |FROM m ORDER BY event_type, day""".stripMargin

  // -------------------------------------------------------------- q142
  /** Population Stability Index per event type between the two halves
    * of the observation window — THE score-drift monitor ML platforms
    * run between a model's training and serving windows:
    *
    *   PSI = Σ_bins (p_b − q_b) · ln(p_b / q_b)
    *
    * over 10 equal-width value bins (q116's exact-min/max edges, so
    * the bin function is bit-identical IEEE algebra in both engines;
    * the same NaN guard pins degenerate zero-width types to bin 0).
    * Bins missing from a half clamp their share to 1e-6 — the
    * standard floor that keeps ln finite while still charging
    * appeared/vanished bins (dropping them would hide exactly the
    * drift PSI exists to catch); the spine that makes those bins
    * EXIST comes from a literal 0..9 sequence per type (q117's
    * densification — no second scan). q74 is this monitor for
    * categorical/token distributions; this covers the numeric
    * columns. Shape: one corpus scan → #types stats broadcast back →
    * one (type, bin) partial+final count → ≤ types×10-row spine ⟕ →
    * per-type Σ over 10 values, rounded 6 dp (ln is libm — the round
    * absorbs its low bits, q52's rule; conventional drift bands:
    * <0.1 stable, 0.1–0.25 moderate, >0.25 major). */
  private val PsiCutoffUs = 1705363200000000L // 2024-01-16, the window's midpoint

  /** q142's engine with the cutoff and bin count open — the facade's
    * [[graft.Graft.psiDrift]]. */
  private[graft] def psiDrift(spark: SparkSession, dir: String,
      cutoffUs: Long, bins: Int): DataFrame = {
    require(bins > 1, s"need bins > 1 (got $bins)")
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_type", $"value",
        (unix_micros($"ts") < cutoffUs).as("is_pre"))
    val stats = ev.groupBy($"event_type")
      .agg(min($"value").as("lo"), max($"value").as("hi"),
        sum(when($"is_pre", 1L).otherwise(0L)).as("n_pre"),
        sum(when(!$"is_pre", 1L).otherwise(0L)).as("n_post"))
      .withColumn("w", ($"hi" - $"lo") / lit(bins.toDouble))
    val counts = ev.join(broadcast(stats), Seq("event_type"))
      .select($"event_type",
        when($"w" === 0, lit(0))
          .otherwise(least(floor(($"value" - $"lo") / $"w"), lit(bins - 1.0)).cast("int"))
          .as("bin"),
        $"is_pre")
      .groupBy($"event_type", $"bin")
      .agg(sum(when($"is_pre", 1L).otherwise(0L)).as("c_pre"),
        sum(when(!$"is_pre", 1L).otherwise(0L)).as("c_post"))
    val spine = stats.select($"event_type", $"n_pre", $"n_post",
      explode(sequence(lit(0), lit(bins - 1))).as("bin"))
    spine.join(counts, Seq("event_type", "bin"), "left_outer")
      .select($"event_type", $"n_pre", $"n_post",
        greatest(coalesce($"c_pre", lit(0L)) / $"n_pre", lit(1e-6)).as("p"),
        greatest(coalesce($"c_post", lit(0L)) / $"n_post", lit(1e-6)).as("q"))
      .groupBy($"event_type")
      .agg(min($"n_pre").as("n_pre"), min($"n_post").as("n_post"),
        round(sum(($"p" - $"q") * log($"p" / $"q")), 6).as("psi"))
      .orderBy($"event_type")
  }

  private def q142(spark: SparkSession, dir: String): DataFrame =
    psiDrift(spark, dir, PsiCutoffUs, bins = 10)

  private val q142Sql: String =
    s"""WITH e AS (
       |  SELECT event_type, value, epoch_us(ts) < $PsiCutoffUs AS is_pre
       |  FROM events
       |), stats AS (
       |  SELECT event_type, min(value) AS lo, max(value) AS hi,
       |         (max(value) - min(value)) / 10.0 AS w,
       |         CAST(sum(CASE WHEN is_pre THEN 1 ELSE 0 END) AS BIGINT) AS n_pre,
       |         CAST(sum(CASE WHEN is_pre THEN 0 ELSE 1 END) AS BIGINT) AS n_post
       |  FROM e GROUP BY 1
       |), counts AS (
       |  SELECT e.event_type,
       |         CASE WHEN s.w = 0 THEN 0
       |              ELSE CAST(least(floor((e.value - s.lo) / s.w), 9.0) AS INTEGER)
       |         END AS bin,
       |         CAST(sum(CASE WHEN e.is_pre THEN 1 ELSE 0 END) AS BIGINT) AS c_pre,
       |         CAST(sum(CASE WHEN e.is_pre THEN 0 ELSE 1 END) AS BIGINT) AS c_post
       |  FROM e JOIN stats s USING (event_type)
       |  GROUP BY 1, 2
       |), spine AS (
       |  SELECT s.event_type, s.n_pre, s.n_post, b.bin
       |  FROM stats s CROSS JOIN (SELECT UNNEST(range(0, 10)) AS bin) b
       |), shares AS (
       |  SELECT sp.event_type, sp.n_pre, sp.n_post,
       |         greatest(COALESCE(c.c_pre, 0) / sp.n_pre, 1e-6) AS p,
       |         greatest(COALESCE(c.c_post, 0) / sp.n_post, 1e-6) AS q
       |  FROM spine sp
       |  LEFT JOIN counts c ON sp.event_type = c.event_type AND sp.bin = c.bin
       |)
       |SELECT event_type, min(n_pre) AS n_pre, min(n_post) AS n_post,
       |       round(sum((p - q) * ln(p / q)), 6) AS psi
       |FROM shares
       |GROUP BY 1
       |ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------- q143
  /** Autocorrelation function of the daily activity series, lags 1-7
    * per event type — the diagnostic read before fitting any seasonal
    * model (q126 assumes a 24h cycle; the ACF is what PROVES the cycle
    * and its strength; Box & Jenkins' identification step):
    *
    *   r_k = Σ_{t>k} devₜ·devₜ₋ₖ / Σₜ devₜ²,  dev = cnt − mean
    *
    * The corpus contracts to the (type, day) grid in one scan (q125's
    * shape); mean and the denominator attach as full-partition windows
    * over the tiny grid; the seven lags are seven window functions
    * over ONE (type, day-ordered) sort that `stack` unpivots to
    * (lag_k, lagged-dev) rows — the grid is ≤ #types·#days rows
    * regardless of corpus size, so nothing past the first aggregate
    * scales with volume. Same-spelled deviation algebra both sides
    * (exact integer counts, one division); the double sums carry only
    * summation-order ulp, absorbed by the terminal 6-dp round. */
  /** q143's engine with the lag horizon open — the facade's
    * [[graft.Graft.acf]]. */
  private[graft] def acf(spark: SparkSession, dir: String, maxLag: Int): DataFrame = {
    require(maxLag > 0, s"need maxLag > 0 (got $maxLag)")
    import spark.implicits._
    val wAll = Window.partitionBy($"event_type")
    val wOrd = Window.partitionBy($"event_type").orderBy($"day")
    val grid = Tables.events(spark, dir)
      .groupBy($"event_type", to_date(date_trunc("day", $"ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val dev = grid
      .withColumn("dev", $"cnt" - sum($"cnt").over(wAll).cast("double") /
        count(lit(1)).over(wAll))
      .withColumn("den", sum($"dev" * $"dev").over(wAll))
    val stackArgs = (1 to maxLag).map(k => s"$k, l$k").mkString(", ")
    dev
      .select(($"event_type" +: $"dev" +: $"den" +:
        (1 to maxLag).map(k => lag($"dev", k).over(wOrd).as(s"l$k"))): _*)
      .selectExpr("event_type", "dev", "den",
        s"stack($maxLag, $stackArgs) AS (lag_k, ldev)")
      .filter($"ldev".isNotNull)
      .groupBy($"event_type", $"lag_k")
      .agg(round(sum($"dev" * $"ldev") / min($"den"), 6).as("acf"))
      .orderBy($"event_type", $"lag_k")
  }

  private def q143(spark: SparkSession, dir: String): DataFrame =
    acf(spark, dir, maxLag = 7)

  private val q143Sql: String = {
    val lags = (1 to 7).map(k => s"lag(dev, $k) OVER wo AS l$k").mkString(",\n       |         ")
    val unpivot = (1 to 7).map(k =>
      s"SELECT event_type, $k AS lag_k, dev, l$k AS ldev, den FROM w").mkString("\n       |  UNION ALL\n       |  ")
    s"""WITH g AS (
       |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
       |         CAST(count(*) AS BIGINT) AS cnt
       |  FROM events GROUP BY 1, 2
       |), d AS (
       |  SELECT event_type, day,
       |         cnt - CAST(sum(cnt) OVER (PARTITION BY event_type) AS DOUBLE) /
       |               count(*) OVER (PARTITION BY event_type) AS dev
       |  FROM g
       |), w AS (
       |  SELECT event_type, dev,
       |         sum(dev * dev) OVER (PARTITION BY event_type) AS den,
       |         $lags
       |  FROM d
       |  WINDOW wo AS (PARTITION BY event_type ORDER BY day)
       |), s AS (
       |  $unpivot
       |)
       |SELECT event_type, CAST(lag_k AS INTEGER) AS lag_k,
       |       round(sum(dev * ldev) / min(den), 6) AS acf
       |FROM s WHERE ldev IS NOT NULL
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  // -------------------------------------------------------------- q186
  /** Two-sample Kolmogorov–Smirnov drift test per event type between
    * the window halves (q142's cutoff) — the DISTRIBUTION-SHAPE
    * complement of PSI: PSI charges binned mass movement (and needs a
    * bin count + clamp), KS is binless and exact — D = sup_x |F_pre(x)
    * − F_post(x)| over the empirical CDFs, the standard
    * training-vs-serving feature-drift gate next to q142 (numeric),
    * q74 (categorical) and q161 (rank shift).
    *
    * EXACT integer algebra end-to-end: the corpus contracts to the
    * (type, value) grid with pre/post counts (one partial+final
    * aggregate), cumulative counts are BIGINT window sums, and the sup
    * is max |cum_pre·n_post − cum_post·n_pre| — an exact integer
    * numerator (≤ 2⁶³ through ~3·10⁹ rows per half; at corpus scale
    * past that the same algebra runs on the q54 sketch's ECDF). The
    * emitted `ks_d` and the α=0.05 critical value c(α)·√((n₁+n₂)/n₁n₂)
    * (c = 1.358, the asymptotic Smirnov constant) are single IEEE
    * divisions/sqrt of exact integers — bit-identical across engines,
    * nothing rounds. Shape: shuffle on (type, value) to the grid, then
    * the type-keyed window+max rides one #grid-row exchange. */
  private[graft] def ksDrift(spark: SparkSession, dir: String,
      cutoffUs: Long): DataFrame = {
    import spark.implicits._
    val cnt = Tables.events(spark, dir)
      .select($"event_type", $"value",
        (unix_micros($"ts") < cutoffUs).as("is_pre"))
      .groupBy($"event_type", $"value")
      .agg(sum(when($"is_pre", 1L).otherwise(0L)).as("c_pre"),
        sum(when(!$"is_pre", 1L).otherwise(0L)).as("c_post"))
    val byType = Window.partitionBy($"event_type")
    val cum = byType.orderBy($"value")
    cnt
      .withColumn("cum_pre", sum($"c_pre").over(cum))
      .withColumn("cum_post", sum($"c_post").over(cum))
      .withColumn("n_pre", sum($"c_pre").over(byType))
      .withColumn("n_post", sum($"c_post").over(byType))
      .groupBy($"event_type")
      .agg(min($"n_pre").as("n_pre"), min($"n_post").as("n_post"),
        max(abs($"cum_pre" * $"n_post" - $"cum_post" * $"n_pre")).as("d_num"))
      .select($"event_type", $"n_pre", $"n_post", $"d_num",
        ($"d_num".cast("double") / ($"n_pre" * $"n_post")).as("ks_d"),
        (lit(1.358) * sqrt(($"n_pre" + $"n_post").cast("double") /
          ($"n_pre" * $"n_post"))).as("crit_05"))
      .withColumn("drifted",
        ($"ks_d" > $"crit_05").cast("int"))
      .orderBy($"event_type")
  }

  private def q186(spark: SparkSession, dir: String): DataFrame =
    ksDrift(spark, dir, PsiCutoffUs)

  private val q186Sql: String =
    s"""WITH e AS (
       |  SELECT event_type, value, epoch_us(ts) < $PsiCutoffUs AS is_pre
       |  FROM events
       |), grid AS (
       |  SELECT event_type, value,
       |         CAST(sum(CASE WHEN is_pre THEN 1 ELSE 0 END) AS BIGINT) AS c_pre,
       |         CAST(sum(CASE WHEN is_pre THEN 0 ELSE 1 END) AS BIGINT) AS c_post
       |  FROM e GROUP BY 1, 2
       |), cum AS (
       |  SELECT event_type,
       |         sum(c_pre) OVER (PARTITION BY event_type ORDER BY value) AS cum_pre,
       |         sum(c_post) OVER (PARTITION BY event_type ORDER BY value) AS cum_post,
       |         sum(c_pre) OVER (PARTITION BY event_type) AS n_pre,
       |         sum(c_post) OVER (PARTITION BY event_type) AS n_post
       |  FROM grid
       |), d AS (
       |  SELECT event_type,
       |         CAST(min(n_pre) AS BIGINT) AS n_pre,
       |         CAST(min(n_post) AS BIGINT) AS n_post,
       |         CAST(max(abs(cum_pre * n_post - cum_post * n_pre)) AS BIGINT) AS d_num
       |  FROM cum GROUP BY 1
       |)
       |SELECT event_type, n_pre, n_post, d_num,
       |       CAST(d_num AS DOUBLE) / (n_pre * n_post) AS ks_d,
       |       1.358 * sqrt(CAST(n_pre + n_post AS DOUBLE) / (n_pre * n_post)) AS crit_05,
       |       CAST(CAST(d_num AS DOUBLE) / (n_pre * n_post) >
       |            1.358 * sqrt(CAST(n_pre + n_post AS DOUBLE) / (n_pre * n_post)) AS INTEGER)
       |         AS drifted
       |FROM d
       |ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------- q190
  /** EWMA control chart on daily event volume per type (Roberts '59) —
    * the small-persistent-shift monitor next to q125's CUSUM (CUSUM
    * accumulates slack; EWMA forgets geometrically, so it localizes
    * WHERE the level moved): s_t = λ·x_t + (1−λ)·s_{t−1}, s_1 = x_1.
    *
    * λ = ½ makes the whole recurrence EXACT DYADIC ARITHMETIC with a
    * closed scan form: 2ᵗ·s_t = Σ_{i≤t} x_i·2^{i−1} + x_1, so the
    * smoother is one integer bit-shift cumulative sum plus a
    * first_value — every intermediate is an exact BIGINT (< 2⁵³ for
    * series up to ~35 points of ≤10⁵ counts — the 30-day grid; longer
    * horizons need a chunk-rescale, and in-query raise_error guards
    * abort LOUDLY past the horizon instead of wrapping), and the
    * single terminal division by the
    * exact power 2ᵗ is correctly rounded, so `ewma` is bit-identical
    * across engines with ZERO rounding anywhere (the q136 "all-integer
    * algebra" discipline applied to an exponential smoother). The
    * sequential recurrence thus DISTRIBUTES as two ordered windows per
    * type — q125's prefix-sum trick for the geometric-decay family.
    *
    * `resid` (today vs yesterday's smoothed level) and the 3σ shock
    * flag compare IEEE-exact values derived from integer sufficient
    * sums — the q125 unrounded-compare contract. */
  private def q190(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy($"event_type", to_date(date_trunc("day", $"ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val wType = Window.partitionBy($"event_type")
    val wOrd = Window.partitionBy($"event_type").orderBy($"day")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("rn", row_number().over(wOrd))
      // LOUD degradation guards: Java long shifts wrap mod 64 (silent
      // garbage past ~62 points) and dyadic exactness dies past 2⁵³ —
      // DuckDB's << raises instead, so without these the two engines
      // would fail DIFFERENTLY. Three layers: (1) series longer than 45
      // points abort; (2) any SINGLE term with cnt·2^(rn−1) > 2⁵³
      // aborts — this is the guard the horizon check alone misses (a
      // large count late in the series wraps Long silently and the
      // cumulative check below can't see the now-negative sum); with
      // every term ≤ 2⁵³ and ≤ 45 terms the Long sum can't wrap
      // (45·2⁵³ < 2⁵⁹); (3) the cumulative sum past 2⁵³ aborts
      // (exactness of the terminal division dies first there). The
      // threshold shiftright(2⁵³, rn−1) is exact — both operands are
      // powers-of-two territory and rn ≤ 45 keeps the shift in range.
      .withColumn("term",
        when($"rn" > 45, raise_error(format_string(
          "q190 dyadic EWMA: series length %d exceeds the exact-shift " +
            "horizon (45 points); chunk-rescale the recurrence", $"rn")))
          .when($"cnt" > expr(
            "shiftright(CAST(9007199254740992 AS BIGINT), CAST(rn - 1 AS INT))"),
            raise_error(format_string(
              "q190 dyadic EWMA: daily count %d at position %d overflows " +
                "the exact dyadic term (cnt*2^(rn-1) > 2^53); " +
                "chunk-rescale the recurrence", $"cnt", $"rn")))
          .otherwise(expr("shiftleft(cnt, CAST(rn - 1 AS INT))")))
      .withColumn("csum", sum($"term").over(wRun))
      .withColumn("csum",
        when($"csum" > lit(9007199254740992L), raise_error(format_string(
          "q190 dyadic EWMA: cumulative dyadic sum %d exceeds 2^53 — " +
            "exactness lost; chunk-rescale the recurrence", $"csum")))
          .otherwise($"csum"))
      .withColumn("x1", first($"cnt").over(wRun))
      .withColumn("ewma",
        ($"csum" + $"x1").cast("double") /
          expr("shiftleft(CAST(1 AS BIGINT), CAST(rn AS INT))"))
      .withColumn("prev", lag($"ewma", 1).over(wOrd))
      .withColumn("n", count(lit(1)).over(wType).cast("double"))
      .withColumn("sx", sum($"cnt".cast("double")).over(wType))
      .withColumn("sxx", sum(($"cnt" * $"cnt").cast("double")).over(wType))
      .withColumn("sigma", sqrt($"n" * $"sxx" - $"sx" * $"sx") / $"n")
      .withColumn("resid",
        when($"prev".isNull, lit(0.0)).otherwise($"cnt" - $"prev"))
      .select($"event_type", $"day", $"cnt", $"ewma", $"resid",
        (abs($"resid") > lit(3.0) * $"sigma").cast("int").as("shock"))
      .orderBy($"event_type", $"day")
  }

  private val q190Sql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2
      |), g AS (
      |  SELECT event_type, day, cnt,
      |         row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
      |         CAST(count(*) OVER (PARTITION BY event_type) AS DOUBLE) AS n,
      |         sum(CAST(cnt AS DOUBLE)) OVER (PARTITION BY event_type) AS sx,
      |         sum(CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE))
      |           OVER (PARTITION BY event_type) AS sxx
      |  FROM daily
      |), s AS (
      |  SELECT event_type, day, cnt, rn, n, sx, sxx,
      |         CAST(sum(cnt << (rn - 1)) OVER (PARTITION BY event_type ORDER BY day
      |                                         ROWS UNBOUNDED PRECEDING) +
      |              first_value(cnt) OVER (PARTITION BY event_type ORDER BY day
      |                                     ROWS UNBOUNDED PRECEDING) AS DOUBLE) /
      |           (CAST(1 AS BIGINT) << rn) AS ewma
      |  FROM g
      |), r AS (
      |  SELECT event_type, day, cnt, ewma, n, sx, sxx,
      |         lag(ewma, 1) OVER (PARTITION BY event_type ORDER BY day) AS prev
      |  FROM s
      |)
      |SELECT event_type, day, cnt, ewma,
      |       CASE WHEN prev IS NULL THEN 0.0 ELSE cnt - prev END AS resid,
      |       CAST(abs(CASE WHEN prev IS NULL THEN 0.0 ELSE cnt - prev END) >
      |            3.0 * (sqrt(n * sxx - sx * sx) / n) AS INTEGER) AS shock
      |FROM r
      |ORDER BY event_type, day""".stripMargin

  // -------------------------------------------------------------- q197
  /** Largest-Triangle series downsampling of the hourly event-volume
    * curve per type — Steinarsson's LTTB (2013), the visualization
    * downsampler every monitoring stack runs before charting: keep the
    * ~`LttbOut` points per series that preserve the curve's SHAPE
    * (spikes, knees) rather than uniform strides that alias them. The
    * PARALLEL anchor variant: buckets are equal-count rank ranges with
    * the endpoints pinned, and each bucket keeps the point maximizing
    * the triangle area against the NEIGHBOR BUCKETS' mean points (the
    * standard distributed spelling — true LTTB anchors on the previous
    * SELECTED point, a sequential dependency; anchoring on the bucket
    * mean is the published parallel approximation and is deterministic).
    *
    * Exactness engineering: hourly sums quantize to integer CENTS
    * (sum-order drift absorbed by the 2 dp quantum), hour indexes
    * re-base per type to small integers, and the argmax area is the
    * anchor-denominator-cleared ALL-INTEGER cross product
    * |(XL·nr − XR·nl)(y·nl − YL) − (XL − x·nl)(YR·nl − YL·nr)| — no
    * float enters the comparison, so the selection is bit-identical
    * across engines and partitionings (tiebreak x asc). Magnitudes
    * stay < 2⁶³ by the re-based x ≤ 10³ and cents ≤ 10¹⁰ per bucket.
    *
    * Shape: one partial+final hourly aggregate, per-type rank/count
    * windows (PARTITIONED by type), a #types×#buckets bucket frame
    * with lag/lead anchors, one broadcast join back, one per-bucket
    * argmax window. Nothing unpartitioned touches the fact scan. */
  private val LttbOut = 24

  private def q197(spark: SparkSession, dir: String): DataFrame =
    lttb(spark, dir, LttbOut)

  /** Open-knob core of q197, shared with [[graft.Graft.lttb]]: the
    * output budget is the knob (chart width / context budget). */
  private[graft] def lttb(spark: SparkSession, dir: String,
      nOut: Int): DataFrame = {
    require(nOut >= 2, s"need nOut >= 2 (got $nOut)")
    import spark.implicits._
    val pts = Tables.events(spark, dir)
      .groupBy($"event_type",
        expr("unix_micros(ts) div 3600000000").as("hx"))
      .agg(floor(sum($"value") * 100 + 0.5).cast("long").as("cents"))
    val wT = Window.partitionBy($"event_type")
    val wOrd = wT.orderBy($"hx")
    val based = pts
      .withColumn("x", $"hx" - min($"hx").over(wT))
      .withColumn("n", count(lit(1)).over(wT))
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .filter($"n" >= 2)
      .withColumn("bucket",
        when($"rn" === 1, lit(0))
          .when($"rn" === $"n", lit(nOut - 1))
          .otherwise(lit(1) +
            expr(s"(rn - 2) * ${nOut - 2} div (n - 2)")).cast("int"))
    val bkt = based.groupBy($"event_type", $"bucket")
      .agg(count(lit(1)).as("nb"), sum($"x").as("xb"), sum($"cents").as("yb"))
    val wB = Window.partitionBy($"event_type").orderBy($"bucket")
    val anch = bkt
      .withColumn("nl", lag($"nb", 1).over(wB))
      .withColumn("xl", lag($"xb", 1).over(wB))
      .withColumn("yl", lag($"yb", 1).over(wB))
      .withColumn("nr", lead($"nb", 1).over(wB))
      .withColumn("xr", lead($"xb", 1).over(wB))
      .withColumn("yr", lead($"yb", 1).over(wB))
      .select($"event_type", $"bucket", $"nb",
        $"nl", $"xl", $"yl", $"nr", $"xr", $"yr")
    val area = abs(
      ($"xl" * $"nr" - $"xr" * $"nl") * ($"cents" * $"nl" - $"yl") -
        ($"xl" - $"x" * $"nl") * ($"yr" * $"nl" - $"yl" * $"nr"))
    val wSel = Window.partitionBy($"event_type", $"bucket")
      .orderBy($"__area".desc, $"x".asc)
    based.join(broadcast(anch), Seq("event_type", "bucket"))
      .withColumn("__area", coalesce(area, lit(0L)))
      .withColumn("__pick", row_number().over(wSel))
      .filter($"__pick" === 1)
      .select($"event_type", $"bucket", $"hx", $"nb".as("n_in_bucket"),
        ($"cents".cast("double") / 100).as("value"))
      .orderBy($"event_type", $"bucket")
  }

  private val q197Sql: String =
    s"""WITH pts AS (
       |  SELECT event_type, epoch_us(ts) // 3600000000 AS hx,
       |         CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS cents
       |  FROM events GROUP BY 1, 2
       |), based AS (
       |  SELECT event_type, hx, cents,
       |         hx - min(hx) OVER (PARTITION BY event_type) AS x,
       |         count(*) OVER (PARTITION BY event_type) AS n,
       |         row_number() OVER (PARTITION BY event_type ORDER BY hx) AS rn
       |  FROM pts
       |  QUALIFY n >= 2
       |), bucketed AS (
       |  SELECT *, CAST(CASE WHEN rn = 1 THEN 0
       |                      WHEN rn = n THEN ${LttbOut - 1}
       |                      ELSE 1 + (rn - 2) * ${LttbOut - 2} // (n - 2)
       |                 END AS INTEGER) AS bucket
       |  FROM based
       |), bkt AS (
       |  SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS nb,
       |         CAST(sum(x) AS BIGINT) AS xb, CAST(sum(cents) AS BIGINT) AS yb
       |  FROM bucketed GROUP BY 1, 2
       |), anch AS (
       |  SELECT event_type, bucket, nb,
       |         lag(nb) OVER w AS nl, lag(xb) OVER w AS xl, lag(yb) OVER w AS yl,
       |         lead(nb) OVER w AS nr, lead(xb) OVER w AS xr, lead(yb) OVER w AS yr
       |  FROM bkt
       |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
       |), scored AS (
       |  SELECT b.event_type, b.bucket, b.hx, b.x, b.cents, a.nb,
       |         COALESCE(abs((a.xl * a.nr - a.xr * a.nl) * (b.cents * a.nl - a.yl)
       |                      - (a.xl - b.x * a.nl) * (a.yr * a.nl - a.yl * a.nr)),
       |                  0) AS area
       |  FROM bucketed b JOIN anch a
       |    ON a.event_type = b.event_type AND a.bucket = b.bucket
       |)
       |SELECT event_type, CAST(bucket AS INTEGER) AS bucket,
       |       CAST(hx AS BIGINT) AS hx, nb AS n_in_bucket,
       |       CAST(cents AS DOUBLE) / 100 AS value
       |FROM (SELECT *, row_number() OVER (PARTITION BY event_type, bucket
       |                                   ORDER BY area DESC, x ASC) AS pick
       |      FROM scored) t
       |WHERE pick = 1
       |ORDER BY event_type, bucket""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q197_lttb_downsample", q197, Some(q197Sql)),
    Q("q125_cusum_changepoint", q125, Some(q125Sql)),
    Q("q190_ewma_control", q190, Some(q190Sql)),
    Q("q126_seasonal_decompose", q126, Some(q126Sql)),
    Q("q127_forecast_backtest", q127, Some(q127Sql)),
    Q("q130_rolling_correlation", q130, Some(q130Sql)),
    Q("q131_rolling_bands", q131, Some(q131Sql)),
    Q("q142_psi_drift", q142, Some(q142Sql)),
    Q("q143_autocorrelation", q143, Some(q143Sql)),
    Q("q186_ks_drift", q186, Some(q186Sql)),
  )
}
