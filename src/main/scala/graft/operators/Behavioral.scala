package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.Q
import graft.sources.Tables

/** Behavioral event analytics over the `events` stream table — the
  * classic user-journey workloads (sessionization, funnels, cohort
  * retention) that exercise exactly the engine's event-time machinery:
  * ordered windows per user, gap detection, step-ordered joins.
  *
  * Scale: every query shuffles once on user_id (sessionize) or runs
  * per-step aggregates joined on user keys (funnel/cohort) — no
  * self-join row explosion anywhere; timestamp arithmetic on epoch
  * micros for oracle parity.
  */
object Behavioral extends DetRounding {

  private[operators] val SessionGapUs = 1800000000L // 30 min

  /** Shared gap-sessionized event frame: `(user_id, event_id,
    * event_type, us, session_id)` — THE session derivation (one gap
    * constant, one (us, event_id) tie-break) consumed by q44's
    * aggregate, q111's interval sweep (via `Temporal.concurrency`),
    * and the path/transition queries (q120/q121), so every session
    * consumer agrees on boundaries by construction. One user_id
    * shuffle; every consumer's windows ride the same sort, and
    * consumers that don't touch `event_type` let Catalyst prune it
    * from the scan. */
  private[operators] def sessionized(spark: SparkSession, dir: String,
      gapUs: Long = SessionGapUs): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    graft.sources.Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("us"))
      .withColumn("new_s",
        when(lag($"us", 1).over(w).isNull ||
          $"us" - lag($"us", 1).over(w) > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum($"new_s").over(running).cast("int"))
      .drop("new_s")
  }

  /** The `g`/`s` CTE pair of [[sessionized]] in DuckDB form, shared by
    * the q120/q121 oracles. */
  private[operators] val sessionizedCtes: String =
    s"""e AS (
       |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
       |), g AS (
       |  SELECT user_id, event_id, event_type, us,
       |         CASE WHEN lag(us) OVER w IS NULL
       |                   OR us - lag(us) OVER w > $SessionGapUs
       |              THEN 1 ELSE 0 END AS new_s
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
       |), s AS (
       |  SELECT user_id, event_id, event_type, us,
       |         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
       |                               ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_id
       |  FROM g
       |)""".stripMargin

  // --------------------------------------------------------------- q44
  /** Gap-based sessionization: a new session starts when a user is idle
    * > 30 min; session ids are running counts of session starts. One
    * shuffle on user_id ([[sessionized]]); the running sum rides the
    * same window sort. */
  private def q44(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sessionized(spark, dir)
      .groupBy($"user_id", $"session_id")
      .agg(
        count(lit(1)).as("n_events"),
        (((max($"us") - min($"us")) / lit(1000000.0))).as("duration_s"))
      .orderBy($"user_id", $"session_id")
  }

  private val q44Sql =
    s"""WITH $sessionizedCtes
       |SELECT user_id, session_id,
       |       count(*) AS n_events,
       |       (max(us) - min(us)) / 1000000.0 AS duration_s
       |FROM s
       |GROUP BY 1, 2
       |ORDER BY user_id, session_id""".stripMargin

  // --------------------------------------------------------------- q45
  /** Ordered funnel signup → click → purchase: each step's first
    * occurrence must follow the previous step's. Per-step aggregates
    * joined on user_id — no event×event explosion. */
  private def q45(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
    val s1 = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"us").as("t1"))
    val s2 = ev.filter($"event_type" === "click").as("e")
      .join(s1, Seq("user_id"))
      .filter($"us" >= $"t1")
      .groupBy($"user_id").agg(min($"us").as("t2"))
    val s3 = ev.filter($"event_type" === "purchase").as("e")
      .join(s2, Seq("user_id"))
      .filter($"us" >= $"t2")
      .groupBy($"user_id").agg(min($"us").as("t3"))
    val step = (name: String, df: DataFrame) =>
      df.agg(count(lit(1)).as("n_users")).select(lit(name).as("step"), $"n_users")
    step("1_signup", s1)
      .unionByName(step("2_then_click", s2))
      .unionByName(step("3_then_purchase", s3))
      .orderBy($"step")
  }

  private val q45Sql =
    """WITH s1 AS (
      |  SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
      |  WHERE event_type = 'signup' GROUP BY 1
      |), s2 AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS t2
      |  FROM events e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= s1.t1
      |  GROUP BY 1
      |), s3 AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS t3
      |  FROM events e JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s2.t2
      |  GROUP BY 1
      |)
      |SELECT '1_signup' AS step, count(*) AS n_users FROM s1
      |UNION ALL SELECT '2_then_click', count(*) FROM s2
      |UNION ALL SELECT '3_then_purchase', count(*) FROM s3
      |ORDER BY step""".stripMargin

  // --------------------------------------------------------------- q46
  /** Weekly cohort retention: users grouped by first-seen week × the
    * weeks they were active, distinct-user counts. Weeks render as ISO
    * date strings (both engines truncate to Monday). */
  private def q46(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // weeks ride as truncated VALUES through distinct/min/groupBy; the
    // ISO render happens once per output cell (round-13, guide §2.3 —
    // the calendar format + string keys ran per event row; week values
    // are 1:1 with their rendered strings and order identically)
    val ev = Tables.events(spark, dir)
      .select($"user_id", date_trunc("week", $"ts").as("week"))
    val cohort = ev.groupBy($"user_id").agg(min($"week").as("cohort_week"))
    ev.distinct()
      .join(cohort, Seq("user_id"))
      .groupBy($"cohort_week", $"week".as("activity_week"))
      .agg(countDistinct($"user_id").as("n_users"))
      .select(date_format($"cohort_week", "yyyy-MM-dd").as("cohort_week"),
        date_format($"activity_week", "yyyy-MM-dd").as("activity_week"),
        $"n_users")
      .orderBy($"cohort_week", $"activity_week")
  }

  private val q46Sql =
    """WITH ev AS (
      |  SELECT DISTINCT user_id, strftime(date_trunc('week', ts), '%Y-%m-%d') AS week
      |  FROM events
      |), cohort AS (
      |  SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY 1
      |)
      |SELECT c.cohort_week, e.week AS activity_week,
      |       count(DISTINCT e.user_id) AS n_users
      |FROM ev e JOIN cohort c ON e.user_id = c.user_id
      |GROUP BY 1, 2
      |ORDER BY cohort_week, activity_week""".stripMargin

  // --------------------------------------------------------------- q91
  /** Robust outlier report per event type: median + MAD (median
    * absolute deviation) and the count of modified-z outliers
    * (|value − med| > 3.5 · 1.4826 · MAD — Iglewicz-Hoaglin). The
    * monitoring pass a pipeline runs over raw event values where mean/
    * stddev (q18's moments) are themselves dragged by the outliers
    * being hunted; MAD's 50% breakdown point is the reason SREs use it.
    *
    * Exact-by-construction: medians via `percentile` ↔ `quantile_cont`
    * (q17's proven parity), the outlier test is pure double algebra on
    * identical inputs, the final fraction one IEEE divide. Three
    * grouped passes over events (med → MAD → flag count) is inherent to
    * exact MAD; each is a partial+final aggregate to #event_types
    * cells with the tiny per-type stats broadcast back. At 100 TB the
    * q54-style sketch (approx_percentile) swaps in per pass with the
    * same plan shape. */
  private def q91(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).select($"event_type", $"value")
    val med = ev.groupBy($"event_type").agg(
      count(lit(1)).as("n"),
      percentile($"value", lit(0.5)).as("med"))
    val mad = ev.join(broadcast(med), Seq("event_type"))
      .groupBy($"event_type")
      .agg(percentile(abs($"value" - $"med"), lit(0.5)).as("mad"))
    val flagged = ev
      .join(broadcast(med), Seq("event_type"))
      .join(broadcast(mad), Seq("event_type"))
      .groupBy($"event_type")
      .agg(sum((abs($"value" - $"med") > lit(3.5) * lit(1.4826) * $"mad").cast("long"))
        .as("n_outliers"))
    med.join(mad, Seq("event_type")).join(flagged, Seq("event_type"))
      .select($"event_type", $"n", $"med", $"mad", $"n_outliers",
        ($"n_outliers".cast("double") / $"n").as("outlier_frac"))
      .orderBy($"event_type")
  }

  private val q91Sql: String =
    """WITH s1 AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |         quantile_cont(value, 0.5) AS med
      |  FROM events GROUP BY 1
      |), s2 AS (
      |  SELECT e.event_type, quantile_cont(abs(e.value - s1.med), 0.5) AS mad
      |  FROM events e JOIN s1 USING (event_type)
      |  GROUP BY e.event_type
      |), s3 AS (
      |  SELECT e.event_type,
      |         CAST(sum(CASE WHEN abs(e.value - s1.med) > 3.5 * 1.4826 * s2.mad
      |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |  FROM events e JOIN s1 USING (event_type) JOIN s2 USING (event_type)
      |  GROUP BY e.event_type
      |)
      |SELECT s1.event_type, s1.n, s1.med, s2.mad, s3.n_outliers,
      |       CAST(s3.n_outliers AS DOUBLE) / s1.n AS outlier_frac
      |FROM s1 JOIN s2 USING (event_type) JOIN s3 USING (event_type)
      |ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------- q104
  /** Incremental rollup maintenance: per-type stats computed as TWO
    * independent partial rollups (an "old corpus" and a "new shard",
    * split by event_id parity) merged by the aggregates' own merge
    * algebra — count/sum add, min/max take extremes, mean re-derives
    * from merged sums. The ORACLE is the straight full-table rollup,
    * so the gate proves merge ≡ recompute: the contract that lets a
    * 100 TB pipeline maintain daily rollups by folding in each new
    * shard (q57's incremental-dedup story for aggregates; the same
    * algebra `MinHashAggregator`/q95's sketches rely on). Nothing
    * here scans history twice — at scale the "even" side is the
    * persisted rollup table, and only the "odd" shard is aggregated
    * fresh. */
  private def q104(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).select($"event_id", $"event_type", $"value")
    def rollup(part: DataFrame): DataFrame =
      part.groupBy($"event_type").agg(
        count(lit(1)).as("n"),
        sum($"value").as("sv"),
        min($"value").as("lo"),
        max($"value").as("hi"))
    val old = rollup(ev.filter($"event_id" % 2 === 0))
    val fresh = rollup(ev.filter($"event_id" % 2 === 1))
    old.union(fresh)
      .groupBy($"event_type")
      .agg(sum($"n").as("n"), sum($"sv").as("sv"),
        min($"lo").as("lo"), max($"hi").as("hi"))
      .select($"event_type", $"n",
        round($"sv", 4).as("sum_value"),
        round($"lo", 6).as("lo"),
        round($"hi", 6).as("hi"),
        round($"sv" / $"n", 6).as("mean_value"))
      .orderBy($"event_type")
  }

  /** Straight full-table rollup — merged partials must equal it. */
  private val q104Sql: String =
    """SELECT event_type,
      |       CAST(count(*) AS BIGINT) AS n,
      |       round(sum(value), 4) AS sum_value,
      |       round(min(value), 6) AS lo,
      |       round(max(value), 6) AS hi,
      |       round(sum(value) / count(*), 6) AS mean_value
      |FROM events
      |GROUP BY 1
      |ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------- q107
  /** The distribution-rank window family — ntile / percent_rank /
    * cume_dist over each user's per-type activity (the quartile-
    * bucketing a curriculum or cohort cut consumes). The window orders
    * by an INTEGER-exact measure (event count) with a user tiebreak:
    * ntile splits ties positionally, so only a TOTAL order over exact
    * values is engine-stable — a double sum in the sort key would let
    * one-ulp drift flip bucket boundaries. One shuffle to event_type
    * cells. The ratios ship UNROUNDED (q49's discipline): rank
    * arithmetic is integer-exact and the divide is a single IEEE op,
    * so both engines are bit-identical — while round()ing them would
    * REINTRODUCE divergence (Spark half-up vs DuckDB binary rounding
    * disagree on e.g. 41/640 at 6 dp). */
  private def q107(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables.events(spark, dir)
      .groupBy($"event_type", $"user_id").agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy($"event_type").orderBy($"n_events", $"user_id")
    per.select($"event_type", $"user_id", $"n_events",
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy($"event_type", $"user_id")
  }

  private val q107Sql: String =
    """WITH per AS (
      |  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT event_type, user_id, n_events,
      |       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      |       percent_rank() OVER w AS pr,
      |       cume_dist() OVER w AS cd
      |FROM per
      |WINDOW w AS (PARTITION BY event_type ORDER BY n_events, user_id)
      |ORDER BY event_type, user_id""".stripMargin

  // -------------------------------------------------------------- q120
  /** Top-20 three-step paths within sessions — "what do users actually
    * do in order", the product-analytics report funnels (q45) assume an
    * answer to. Steps come from two leads over the session sort (the
    * same one user_id shuffle as q44 — session boundaries cut paths, so
    * a night's idle gap never fabricates a sequence); path counts are a
    * partial+final aggregate keyed by the trigram and the top-20 is
    * TakeOrdered under a total (n DESC, path ASC) order, never a global
    * sort. */
  private def q120(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id", $"session_id")
      .orderBy($"us", $"event_id")
    sessionized(spark, dir)
      .withColumn("e2", lead($"event_type", 1).over(w))
      .withColumn("e3", lead($"event_type", 2).over(w))
      .filter($"e3".isNotNull)
      .select(concat_ws(">", $"event_type", $"e2", $"e3").as("path"))
      .groupBy($"path").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"path")
      .limit(20)
  }

  private val q120Sql: String =
    s"""WITH $sessionizedCtes, p AS (
       |  SELECT event_type || '>' ||
       |         lead(event_type, 1) OVER w || '>' ||
       |         lead(event_type, 2) OVER w AS path,
       |         lead(event_type, 2) OVER w AS e3
       |  FROM s WINDOW w AS (PARTITION BY user_id, session_id
       |                      ORDER BY us, event_id)
       |)
       |SELECT path, CAST(count(*) AS BIGINT) AS n
       |FROM p WHERE e3 IS NOT NULL
       |GROUP BY 1
       |ORDER BY n DESC, path
       |LIMIT 20""".stripMargin

  // -------------------------------------------------------------- q121
  /** First-order Markov transition matrix between event types within
    * sessions: P(next = b | current = a) with transition counts — the
    * behavioral model behind next-action prediction and anomaly flags
    * on broken flows. One lead over the session sort, one aggregate to
    * ≤ #types² cells; the conditional probability is a window share
    * over those cells (q37's normalization on a 25-row frame),
    * integer-exact operands in one IEEE divide, shipped unrounded
    * (q107's discipline). */
  private def q121(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id", $"session_id")
      .orderBy($"us", $"event_id")
    val wf = Window.partitionBy($"from_type")
    sessionized(spark, dir)
      .withColumn("to_type", lead($"event_type", 1).over(w))
      .filter($"to_type".isNotNull)
      .groupBy($"event_type".as("from_type"), $"to_type")
      .agg(count(lit(1)).as("n"))
      .select($"from_type", $"to_type", $"n",
        ($"n".cast("double") / sum($"n").over(wf)).as("p"))
      .orderBy($"from_type", $"to_type")
  }

  private val q121Sql: String =
    s"""WITH $sessionizedCtes, t AS (
       |  SELECT event_type AS from_type,
       |         lead(event_type, 1) OVER (PARTITION BY user_id, session_id
       |                                   ORDER BY us, event_id) AS to_type
       |  FROM s
       |), c AS (
       |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
       |  FROM t WHERE to_type IS NOT NULL
       |  GROUP BY 1, 2
       |)
       |SELECT from_type, to_type, n,
       |       CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type) AS p
       |FROM c
       |ORDER BY from_type, to_type""".stripMargin

  // -------------------------------------------------------------- q122
  /** User survival curve: S(d) = fraction of users still active ≥ d
    * days after their first event, for d in 0..30 (the observed window)
    * — the retention/churn report next to q46's cohort grid
    * (Kaplan-Meier's empirical core with a single full-observation
    * window, so no censoring correction is needed). Per-user lifetime
    * is one min/max aggregate; the curve is a reverse cumulative sum
    * over the ≤31-row day histogram densified from a literal spine
    * (q117's no-second-scan trick) — the share is integer-exact ÷
    * shipped unrounded, and nothing after the first aggregate scales
    * with event volume. */
  private def q122(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lt = Tables.events(spark, dir)
      .select($"user_id", unix_micros($"ts").as("us"))
      .groupBy($"user_id")
      .agg((expr("max(us) div 86400000000") - expr("min(us) div 86400000000"))
        .as("lt_days"))
    val hist = lt.groupBy($"lt_days").agg(count(lit(1)).as("n"))
      .agg(map_from_entries(collect_list(struct($"lt_days", $"n"))).as("m"))
      .select(explode(sequence(lit(0L), lit(30L))).as("d"), $"m")
      .select($"d", coalesce(element_at($"m", $"d"), lit(0L)).as("n"))
    val surv = Window.orderBy($"d")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wall = Window.partitionBy()
    hist
      .select($"d", sum($"n").over(surv).as("n_surviving"),
        sum($"n").over(wall).as("total"))
      .select($"d".cast("int").as("d"), $"n_surviving",
        ($"n_surviving".cast("double") / $"total").as("s"))
      .orderBy($"d")
  }

  /** Lifetime in calendar-day indices (floor-div of epoch micros), so
    * a user spanning a midnight counts the day boundary, not 24 h. */
  private val q122Sql: String =
    """WITH lt AS (
      |  SELECT user_id,
      |         (max(epoch_us(ts)) // 86400000000) -
      |         (min(epoch_us(ts)) // 86400000000) AS lt_days
      |  FROM events GROUP BY 1
      |), hist AS (
      |  SELECT d.d, CAST(count(lt.user_id) AS BIGINT) AS n
      |  FROM (SELECT UNNEST(range(0, 31)) AS d) d
      |  LEFT JOIN lt ON lt.lt_days = d.d
      |  GROUP BY 1
      |)
      |SELECT CAST(d AS INTEGER) AS d,
      |       CAST(sum(n) OVER (ORDER BY d ROWS BETWEEN CURRENT ROW
      |                         AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_surviving,
      |       CAST(sum(n) OVER (ORDER BY d ROWS BETWEEN CURRENT ROW
      |                         AND UNBOUNDED FOLLOWING) AS DOUBLE) /
      |         sum(n) OVER () AS s
      |FROM hist
      |ORDER BY d""".stripMargin

  // -------------------------------------------------------------- q123
  /** Conversion-lag percentiles: quartiles of signup → first subsequent
    * purchase time (q45's funnel chain measured in TIME, the metric
    * behind "how long does conversion take") — exact interpolated
    * percentiles over integer micros (q17's proven `percentile` ↔
    * `quantile_cont` parity; durations convert to seconds with one
    * shared ÷ 1e6 association per quartile). Two per-user min
    * aggregates on the user key, a one-row output — corpus-scale work
    * ends at the first aggregate. */
  private def q123(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
    val s1 = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"us").as("t1"))
    val durs = ev.filter($"event_type" === "purchase")
      .join(s1, Seq("user_id"))
      .filter($"us" >= $"t1")
      .groupBy($"user_id").agg((min($"us") - min($"t1")).as("dur_us"))
    durs.agg(
      count(lit(1)).as("n_converted"),
      (percentile($"dur_us", lit(0.25)) / lit(1000000.0)).as("p25_s"),
      (percentile($"dur_us", lit(0.5)) / lit(1000000.0)).as("p50_s"),
      (percentile($"dur_us", lit(0.75)) / lit(1000000.0)).as("p75_s"))
  }

  private val q123Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
      |), s1 AS (
      |  SELECT user_id, min(us) AS t1 FROM e
      |  WHERE event_type = 'signup' GROUP BY 1
      |), durs AS (
      |  SELECT e.user_id, min(e.us) - min(s1.t1) AS dur_us
      |  FROM e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.us >= s1.t1
      |  GROUP BY 1
      |)
      |SELECT CAST(count(*) AS BIGINT) AS n_converted,
      |       quantile_cont(dur_us, 0.25) / 1000000.0 AS p25_s,
      |       quantile_cont(dur_us, 0.5) / 1000000.0 AS p50_s,
      |       quantile_cont(dur_us, 0.75) / 1000000.0 AS p75_s
      |FROM durs""".stripMargin

  // -------------------------------------------------------------- q133
  /** Rolling active users: DAU, trailing-7-day WAU, and the
    * DAU/WAU stickiness ratio per day — the engagement headline next
    * to q46's cohort retention. The scale trick is the WAU side:
    * sliding-window COUNT DISTINCT does not decompose into window
    * frames, and the naive form is a 7-day range join (each day
    * rescans a week — the ORACLE computes exactly that form, so the
    * gate proves the rewrite). Instead each distinct (day, user) pair
    * EXPLODES into the ≤ 7 window-days it supports (`sequence(0,6)`),
    * and WAU is a plain hash countDistinct on window-day: linear 7×
    * fan-out, partial+final aggregation, no range join anywhere. Days
    * without a full trailing week are suppressed on both sides; WAU
    * window-days that fall past the observed spine drop in the inner
    * join with the DAU frame. All integers + one rounded divide. */
  private def q133(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val du = Tables.events(spark, dir)
      .select(to_date(date_trunc("day", $"ts")).as("day"), $"user_id")
      .distinct()
    val dau = du.groupBy($"day").agg(countDistinct($"user_id").as("dau"))
    val wau = du
      .select(explode(sequence(lit(0), lit(6))).as("off"), $"day", $"user_id")
      .select(date_add($"day", $"off").as("day"), $"user_id")
      .groupBy($"day").agg(countDistinct($"user_id").as("wau"))
    val lo = du.agg(date_add(min($"day"), 6).as("d0"))
    dau.join(wau, Seq("day"))
      .crossJoin(broadcast(lo))
      .filter($"day" >= $"d0")
      .select($"day", $"dau", $"wau",
        round($"dau".cast("double") / $"wau", 6).as("stickiness"))
      .orderBy($"day")
  }

  private val q133Sql: String =
    """WITH du AS (
      |  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
      |  FROM events
      |), spine AS (SELECT DISTINCT day FROM du),
      |wau AS (
      |  SELECT s.day, count(DISTINCT d.user_id) AS wau
      |  FROM spine s JOIN du d ON d.day BETWEEN s.day - 6 AND s.day
      |  GROUP BY 1
      |), dau AS (
      |  SELECT day, count(DISTINCT user_id) AS dau FROM du GROUP BY 1
      |)
      |SELECT d.day, d.dau, w.wau,
      |       round(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
      |FROM dau d JOIN wau w ON w.day = d.day
      |WHERE d.day >= (SELECT min(day) FROM du) + 6
      |ORDER BY d.day""".stripMargin

  // -------------------------------------------------------------- q146
  /** Activity streaks per user: longest run of CONSECUTIVE active days,
    * streak count, total active days, and the length of the latest
    * streak — the engagement-habit report next to q133's DAU/WAU
    * (Duolingo's headline metric; q122 measures lifetime, this measures
    * continuity inside it). Classic gaps-and-islands: on the distinct
    * (user, day-index) grid, `day − row_number()` is constant exactly
    * within a consecutive run (both step by 1), so streaks fall out of
    * ONE per-user window + two hash-aggs — no self-join, no recursion.
    *
    * Everything is integer day indices and counts (floor-div of epoch
    * micros — zero doubles in the whole query, nothing to round, hash-
    * deterministic by construction). Scale shape: the corpus contracts
    * to the distinct (user, day) grid in one partial+final aggregate
    * (≤ users × days rows at any volume); the window and both
    * aggregates ride the same user_id shuffle. */
  private def q146(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wOrd = Window.partitionBy($"user_id").orderBy($"d")
    val wUser = Window.partitionBy($"user_id")
    Tables.events(spark, dir)
      .select($"user_id", expr("unix_micros(ts) div 86400000000").as("d"))
      .distinct()
      .withColumn("grp", $"d" - row_number().over(wOrd))
      .groupBy($"user_id", $"grp")
      .agg(count(lit(1)).as("len"), max($"d").as("d_end"))
      .withColumn("d_last", max($"d_end").over(wUser))
      .groupBy($"user_id")
      .agg(
        sum($"len").as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max($"len").as("longest_streak"),
        max(when($"d_end" === $"d_last", $"len")).as("latest_streak"))
      .orderBy($"user_id")
  }

  private val q146Sql: String =
    """WITH du AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d
      |  FROM events
      |), g AS (
      |  SELECT user_id, d,
      |         d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
      |  FROM du
      |), s AS (
      |  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len, max(d) AS d_end
      |  FROM g GROUP BY 1, 2
      |), m AS (
      |  SELECT user_id, len, d_end,
      |         max(d_end) OVER (PARTITION BY user_id) AS d_last
      |  FROM s
      |)
      |SELECT user_id,
      |       CAST(sum(len) AS BIGINT) AS n_active_days,
      |       CAST(count(*) AS BIGINT) AS n_streaks,
      |       max(len) AS longest_streak,
      |       max(CASE WHEN d_end = d_last THEN len END) AS latest_streak
      |FROM m GROUP BY 1 ORDER BY user_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q44_sessionize", q44, Some(q44Sql)),
    Q("q133_active_users", q133, Some(q133Sql)),
    Q("q146_activity_streaks", q146, Some(q146Sql)),
    Q("q45_funnel", q45, Some(q45Sql)),
    Q("q46_cohort_retention", q46, Some(q46Sql)),
    Q("q91_event_outliers", q91, Some(q91Sql)),
    Q("q104_incremental_rollup", q104, Some(q104Sql)),
    Q("q107_rank_family", q107, Some(q107Sql)),
    Q("q120_session_paths", q120, Some(q120Sql)),
    Q("q121_markov_transitions", q121, Some(q121Sql)),
    Q("q122_survival_curve", q122, Some(q122Sql)),
    Q("q123_conversion_lag", q123, Some(q123Sql)),
  )
}
