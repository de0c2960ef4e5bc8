package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.Q
import graft.sources.Tables

/** Temporal state-management operators over the `events` stream table —
  * the warehouse side of the reference's upsert/versioned-state model
  * (lambda-sample keeps ONLY the latest row per (sensor, ts) via CQL
  * UPDATE, `cassandra/schema.sql`; an analytics engine over the same
  * feed also needs the history those upserts discard): dimension
  * versioning (SCD Type 2), interval concurrency, as-of snapshot
  * reconciliation, and conversion attribution.
  *
  * Scale: every query shuffles the events table at most once on
  * user_id; everything downstream of the per-user window is either
  * per-row algebra or aggregates over frames that are orders of
  * magnitude smaller than the input (versions, boundary deltas,
  * per-user state rows). Timestamp math runs on epoch micros
  * (`unix_micros` ↔ `epoch_us`, exact integers) — the catalog's
  * determinism convention.
  */
object Temporal extends DetRounding {

  /** q44's session gap — THE shared constant ([[Behavioral]] owns the
    * session derivation; re-declaring it here is how oracles drift). */
  private def SessionGapUs = Behavioral.SessionGapUs
  private val DayUs = 86400000000L
  private val WeekUs = 7L * DayUs

  // -------------------------------------------------------------- q110
  /** SCD Type-2 history build: collapse each user's event-type run into
    * a versioned validity interval `[valid_from_us, valid_to_us)` with
    * `valid_to_us` NULL on the open current version — the dimension-
    * versioning shape every warehouse keeps for "what was true at time
    * T" joins (Kimball SCD2), and the exact history the reference's
    * last-write-wins upsert throws away.
    *
    * One shuffle on user_id; change detection is a lag window, version
    * ids a running sum over the SAME window sort (no second shuffle),
    * and the interval close is a lead over the version frame — which is
    * #versions rows, not #events. All columns are integer/string exact,
    * so the oracle needs no rounding at all. */
  private def q110(spark: SparkSession, dir: String): DataFrame =
    scd2History(spark, dir, attrCol = "event_type")

  /** Parameterized core of q110, shared with [[graft.Graft.scd2History]]
    * — any event column can be the tracked attribute. */
  private[graft] def scd2History(spark: SparkSession, dir: String,
      attrCol: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val vers = Tables.events(spark, dir)
      .select($"user_id", $"event_id", col(attrCol).as("attr"),
        unix_micros($"ts").as("us"))
      // null-safe change detection: `attr =!= lag(attr)` is NULL when
      // either side is NULL, so a null-valued attribute (reachable via
      // the facade's attrCol knob) would silently merge into the prior
      // version AND make the next non-null row open a spurious one.
      // First-row detection rides lag(us) — us is never null.
      .withColumn("new_v",
        when(lag($"us", 1).over(w).isNull ||
          !($"attr" <=> lag($"attr", 1).over(w)), 1).otherwise(0))
      .withColumn("ver", sum($"new_v").over(running).cast("int"))
      .groupBy($"user_id", $"ver")
      // min(attr): every row in a version carries the same attr by
      // construction; min is order-independent where first() is not
      .agg(min($"attr").as("attr"), min($"us").as("valid_from_us"),
        count(lit(1)).as("n_obs"))
    val wv = Window.partitionBy($"user_id").orderBy($"ver")
    vers
      .withColumn("valid_to_us", lead($"valid_from_us", 1).over(wv))
      .select($"user_id", $"ver", $"attr", $"valid_from_us", $"valid_to_us",
        $"n_obs",
        when($"valid_to_us".isNull, 1).otherwise(0).cast("int").as("is_current"))
      .orderBy($"user_id", $"ver")
  }

  private val q110Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type AS attr, epoch_us(ts) AS us
      |  FROM events
      |), g AS (
      |  SELECT user_id, event_id, attr, us,
      |         CASE WHEN lag(us) OVER w IS NULL
      |                   OR attr IS DISTINCT FROM lag(attr) OVER w
      |              THEN 1 ELSE 0 END AS new_v
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
      |), v AS (
      |  SELECT user_id, attr, us,
      |         CAST(sum(new_v) OVER (PARTITION BY user_id ORDER BY us, event_id
      |                               ROWS UNBOUNDED PRECEDING) AS INTEGER) AS ver
      |  FROM g
      |), grp AS (
      |  SELECT user_id, ver, min(attr) AS attr, min(us) AS valid_from_us,
      |         CAST(count(*) AS BIGINT) AS n_obs
      |  FROM v GROUP BY 1, 2
      |)
      |SELECT user_id, ver, attr, valid_from_us,
      |       lead(valid_from_us) OVER wv AS valid_to_us,
      |       n_obs,
      |       CAST(CASE WHEN lead(valid_from_us) OVER wv IS NULL
      |                 THEN 1 ELSE 0 END AS INTEGER) AS is_current
      |FROM grp
      |WINDOW wv AS (PARTITION BY user_id ORDER BY ver)
      |ORDER BY user_id, ver""".stripMargin

  // -------------------------------------------------------------- q111
  /** Peak session concurrency per day by distributed sweep line. q44's
    * session intervals become boundary deltas (+1 at start, −1 just
    * after end — closed intervals, so a single-event session still
    * counts while it lasts), and the running sum over time-ordered
    * deltas is the concurrency curve.
    *
    * The prefix sum is the scale trick: a naive global ORDER BY window
    * serializes 100 TB of boundaries through one task. Instead the
    * classic two-phase parallel prefix (Blelloch scan) as DataFrame
    * algebra: (a) per-day partitioned running sums — one shuffle, each
    * day sorts independently; (b) per-day totals prefix-summed on a
    * #days-row frame (the only global window, deliberately tiny) and
    * broadcast back as offsets. `offset + local running` ≡ the global
    * running sum — the ORACLE computes the naive global form, so the
    * gate proves the decomposition exact.
    *
    * Peak is measured at session boundaries (concurrency only rises at
    * a start, so the daily max over boundary points equals the
    * continuous-time max for any day with a session start; a day whose
    * deltas are all ends reports the level just after its first end —
    * documented boundary-measurement semantics, identical in both
    * engines). */
  private def q111(spark: SparkSession, dir: String): DataFrame =
    concurrency(spark, dir, gapUs = SessionGapUs, bucketUs = DayUs)

  /** Parameterized core of q111, shared with [[graft.Graft.concurrency]]
    * — session gap and prefix-sum bucket width are the knobs (hour or
    * minute buckets at higher boundary densities, same algebra). */
  private[graft] def concurrency(spark: SparkSession, dir: String,
      gapUs: Long, bucketUs: Long): DataFrame = {
    import spark.implicits._
    // the shared session derivation (Behavioral.sessionized — same gap
    // semantics as q44/q120/q121), reduced to intervals
    val intervals = Behavioral.sessionized(spark, dir, gapUs)
      .groupBy($"user_id", $"session_id")
      .agg(min($"us").as("s_us"), max($"us").as("e_us"))
    val deltas = intervals
      .select(explode(array(
        struct($"s_us".as("us"), lit(1).as("d")),
        struct(($"e_us" + 1).as("us"), lit(-1).as("d")))).as("b"))
      .select($"b.us", $"b.d")
      .groupBy($"us")
      .agg(sum($"d").as("ds"), sum(when($"d" > 0, 1L).otherwise(0L)).as("ns"))
      .withColumn("day_idx", expr(s"us div $bucketUs"))
    // phase 1: per-bucket local running sums (parallel across buckets)
    val wd = Window.partitionBy($"day_idx").orderBy($"us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = deltas.withColumn("run_local", sum($"ds").over(wd))
    // phase 2: bucket totals → exclusive prefix over the #buckets-row
    // frame (global window on purpose: ~30 rows here, #buckets at any
    // scale)
    val wo = Window.orderBy($"day_idx")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = deltas.groupBy($"day_idx").agg(sum($"ds").as("tot"))
      .withColumn("offset", coalesce(sum($"tot").over(wo), lit(0L)))
      .select($"day_idx", $"offset")
    local.join(broadcast(offsets), "day_idx")
      .withColumn("run", $"offset" + $"run_local")
      .groupBy($"day_idx")
      .agg(max($"run").cast("int").as("peak_concurrency"),
        sum($"ns").as("n_sessions_started"))
      .select(
        date_format(timestamp_micros($"day_idx" * bucketUs),
          if (bucketUs == DayUs) "yyyy-MM-dd" else "yyyy-MM-dd HH:mm").as("day"),
        $"peak_concurrency", $"n_sessions_started")
      .orderBy($"day")
  }

  /** Naive global-window form over the SHARED sessionization CTEs
    * ([[Behavioral.sessionizedCtes]] — one derivation, one oracle
    * spelling) — the two-phase decomposition must equal it. */
  private val q111Sql: String =
    s"""WITH ${Behavioral.sessionizedCtes}, iv AS (
       |  SELECT user_id, session_id, min(us) AS s_us, max(us) AS e_us
       |  FROM s GROUP BY 1, 2
       |), d AS (
       |  SELECT s_us AS us, 1 AS d FROM iv
       |  UNION ALL
       |  SELECT e_us + 1 AS us, -1 AS d FROM iv
       |), a AS (
       |  SELECT us, sum(d) AS ds,
       |         sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS ns
       |  FROM d GROUP BY 1
       |), r AS (
       |  SELECT us, ns,
       |         sum(ds) OVER (ORDER BY us ROWS UNBOUNDED PRECEDING) AS run
       |  FROM a
       |)
       |SELECT strftime(make_timestamp((us // $DayUs) * $DayUs), '%Y-%m-%d') AS day,
       |       CAST(max(run) AS INTEGER) AS peak_concurrency,
       |       CAST(sum(ns) AS BIGINT) AS n_sessions_started
       |FROM r
       |GROUP BY 1
       |ORDER BY day""".stripMargin

  // -------------------------------------------------------------- q113
  /** As-of snapshot reconciliation: each user's latest (event_type,
    * value) state as of T1 = 2024-01-16 vs as of the full table,
    * labeled added / changed / unchanged — the table-diff a pipeline
    * runs between two loads to audit what an upsert feed actually did
    * (the batch twin of the reference's continuous last-write-wins
    * consumer).
    *
    * ONE corpus scan and ONE user_id shuffle: a single descending
    * window ranks every event (`rn` overall, `rn_old` among
    * pre-cutoff rows — a conditional running count over the same
    * sort), and a groupBy on the window's own partitioning key picks
    * both states with conditional aggregates — no second scan, no
    * diff join at all (the ORACLE keeps the naive two-CTE full-outer
    * form, so the gate proves the fused plan equal). Raw doubles are
    * compared and emitted, never computed with — so no rounding is
    * needed for engine parity. */
  private def q113(spark: SparkSession, dir: String): DataFrame =
    snapshotDiff(spark, dir, cutoffUs = CutoffUs)

  /** Parameterized core of q113, shared with [[graft.Graft.snapshotDiff]]
    * — the as-of cutoff is the knob. */
  private[graft] def snapshotDiff(spark: SparkSession, dir: String,
      cutoffUs: Long): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us".desc, $"event_id".desc)
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type", $"value",
        unix_micros($"ts").as("us"))
      .withColumn("rn", row_number().over(w))
      .withColumn("rn_old",
        sum(when($"us" < cutoffUs, 1).otherwise(0)).over(running))
      .groupBy($"user_id")
      .agg(
        // exactly one row matches each predicate; max over one non-null
        // value + nulls selects it without ordering sensitivity
        max(when($"rn" === 1, $"event_type")).as("new_type"),
        max(when($"rn" === 1, $"value")).as("new_value"),
        max(when($"us" < cutoffUs && $"rn_old" === 1, $"event_type")).as("old_type"),
        max(when($"us" < cutoffUs && $"rn_old" === 1, $"value")).as("old_value"))
      .select($"user_id",
        when($"old_type".isNull, lit("added"))
          .when($"old_type" =!= $"new_type" || $"old_value" =!= $"new_value",
            lit("changed"))
          .otherwise(lit("unchanged")).as("status"),
        $"old_type", $"old_value", $"new_type", $"new_value")
      .orderBy($"user_id")
  }

  /** 2024-01-16T00:00:00Z — mid-range of the 2024-01 events window, so
    * both sides of the diff are non-trivial at every scale factor. */
  private val CutoffUs = 1705363200000000L

  private val q113Sql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us
       |  FROM events
       |), old AS (
       |  SELECT user_id, event_type AS old_type, value AS old_value
       |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
       |                                     ORDER BY us DESC, event_id DESC) AS rn
       |        FROM e WHERE us < $CutoffUs)
       |  WHERE rn = 1
       |), cur AS (
       |  SELECT user_id, event_type AS new_type, value AS new_value
       |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
       |                                     ORDER BY us DESC, event_id DESC) AS rn
       |        FROM e)
       |  WHERE rn = 1
       |)
       |SELECT COALESCE(old.user_id, cur.user_id) AS user_id,
       |       CASE WHEN old_type IS NULL THEN 'added'
       |            WHEN old_type <> new_type OR old_value <> new_value THEN 'changed'
       |            ELSE 'unchanged' END AS status,
       |       old_type, old_value, new_type, new_value
       |FROM old FULL OUTER JOIN cur ON old.user_id = cur.user_id
       |ORDER BY user_id""".stripMargin

  // -------------------------------------------------------------- q114
  /** Last-touch conversion attribution: each purchase is credited to
    * the user's most recent click/view within a 7-day lookback, else
    * 'organic' — the marketing-analytics report shape. The touch lookup
    * is `last(..., ignoreNulls)` over a strictly-preceding row frame on
    * the per-user time order (ONE shuffle on user_id) — never an
    * event×event self-join, which would go quadratic per user under
    * exactly the hot-key skew q102 measures. Channel totals then
    * collapse to #channels rows; the share divide is integer-exact
    * operands in one IEEE op, shipped unrounded (q107's discipline),
    * while revenue is a summed double and rounds to 4 dp. */
  private def q114(spark: SparkSession, dir: String): DataFrame =
    attribution(spark, dir, touchTypes = Seq("click", "view"),
      conversionType = "purchase", lookbackUs = WeekUs)

  /** Parameterized core of q114, shared with [[graft.Graft.attribution]]
    * — touch set, conversion event, and lookback horizon are the
    * knobs. */
  private[graft] def attribution(spark: SparkSession, dir: String,
      touchTypes: Seq[String], conversionType: String,
      lookbackUs: Long): DataFrame = {
    import spark.implicits._
    val isTouch = col("event_type").isin(touchTypes: _*)
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    val attributed = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type", $"value",
        unix_micros($"ts").as("us"))
      .withColumn("lt_type",
        last(when(isTouch, $"event_type"), ignoreNulls = true).over(prior))
      .withColumn("lt_us",
        last(when(isTouch, $"us"), ignoreNulls = true).over(prior))
      .filter($"event_type" === conversionType)
      .select(
        when($"lt_type".isNull || $"us" - $"lt_us" > lookbackUs, lit("organic"))
          .otherwise($"lt_type").as("channel"),
        $"value")
    val perChannel = attributed.groupBy($"channel")
      .agg(count(lit(1)).as("n_conversions"), round(sum($"value"), 4).as("revenue"))
    val wall = Window.partitionBy()
    perChannel
      .withColumn("share",
        $"n_conversions".cast("double") / sum($"n_conversions").over(wall))
      .select($"channel", $"n_conversions", $"revenue", $"share")
      .orderBy($"channel")
  }

  private val q114Sql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us
       |  FROM events
       |), t AS (
       |  SELECT user_id, event_type, value, us,
       |         last_value(CASE WHEN event_type IN ('click', 'view')
       |                         THEN event_type END IGNORE NULLS) OVER wp AS lt_type,
       |         last_value(CASE WHEN event_type IN ('click', 'view')
       |                         THEN us END IGNORE NULLS) OVER wp AS lt_us
       |  FROM e
       |  WINDOW wp AS (PARTITION BY user_id ORDER BY us, event_id
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |), conv AS (
       |  SELECT CASE WHEN lt_type IS NULL OR us - lt_us > $WeekUs
       |              THEN 'organic' ELSE lt_type END AS channel,
       |         value
       |  FROM t WHERE event_type = 'purchase'
       |), agg AS (
       |  SELECT channel, CAST(count(*) AS BIGINT) AS n_conversions,
       |         round(sum(value), 4) AS revenue
       |  FROM conv GROUP BY 1
       |)
       |SELECT channel, n_conversions, revenue,
       |       CAST(n_conversions AS DOUBLE) / sum(n_conversions) OVER () AS share
       |FROM agg
       |ORDER BY channel""".stripMargin

  // -------------------------------------------------------------- q119
  /** Time-weighted average state per user — Σ v·Δt / Σ Δt where each
    * event's value holds until the next event (the IoT/finance TWA that
    * plain avg() gets wrong whenever sampling is irregular: a value
    * held for a day must weigh more than one held a second — the
    * duration-weighted reading of q110's validity intervals). One
    * user_id shuffle; the interval close is the same lead the SCD2
    * build uses; users with a single event have no interval and drop
    * out (both engines, by construction).
    *
    * Determinism: Δt stays in integer micros (exact); the weighted sum
    * multiplies v·Δt with identical association both sides and rounds
    * at 6 dp (double ulp drift ~1e-14 at these magnitudes — micros are
    * well under the 2^53 exact-integer ceiling); span_s is an exact
    * integer divide re-expressed in seconds. */
  private def q119(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"value", unix_micros($"ts").as("us"))
      .withColumn("dt", lead($"us", 1).over(w) - $"us")
      .filter($"dt".isNotNull)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_intervals"),
        (sum($"dt") / lit(1000000L)).as("span_s"),
        round(sum($"value" * $"dt") / sum($"dt"), 6).as("twa_value"))
      .orderBy($"user_id")
  }

  private val q119Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events
      |), d AS (
      |  SELECT user_id, value,
      |         lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us AS dt
      |  FROM e
      |)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
      |       sum(dt) / 1000000 AS span_s,
      |       round(sum(value * dt) / sum(dt), 6) AS twa_value
      |FROM d
      |WHERE dt IS NOT NULL
      |GROUP BY 1
      |ORDER BY user_id""".stripMargin

  // -------------------------------------------------------------- q183
  /** NEAREST-event join with tolerance: each purchase matched to the
    * closest click by the same user within ±10 minutes, whichever side
    * of it — the attribution matcher q19's as-of join cannot express
    * (as-of looks strictly backward; "nearest" needs both directions
    * and an argmin). The third member of the event-join family:
    * as-of (q19), range (q20/q56), nearest (here).
    *
    * Scale shape is q56's bucket discipline: time buckets of exactly
    * the tolerance width, probe rows exploded into their 3 adjacent
    * buckets, equi-join on (user, bucket) — any pair within tolerance
    * shares a bucket by construction, so the residual |Δt| ≤ tol test
    * never misses, and per-task pair volume is bounded by per-(user,
    * bucket) density, never per-user history. The argmin is ONE
    * max-of-struct-style aggregate — min(struct(|Δt|, ts, id)) — the
    * order-independent tiebreak (earlier click, then lower id wins
    * ties), q147's no-window argmax idiom. All-integer micros. */
  private[graft] def nearestEvent(events: DataFrame, probeType: String,
      buildType: String, tolUs: Long): DataFrame = {
    require(tolUs > 0, s"need tolUs > 0 (got $tolUs)")
    val probe = events.filter(col("event_type") === probeType)
      .select(col("event_id").as("probe_id"), col("user_id"),
        unix_micros(col("ts")).as("pus"))
      .withColumn("bucket",
        explode(array(expr(s"pus div ${tolUs}L") - 1,
          expr(s"pus div ${tolUs}L"), expr(s"pus div ${tolUs}L") + 1)))
    val build = events.filter(col("event_type") === buildType)
      .select(col("event_id").as("build_id"), col("user_id"),
        unix_micros(col("ts")).as("bus"))
      .withColumn("bucket", expr(s"bus div ${tolUs}L"))
    probe.join(build, Seq("user_id", "bucket"))
      .filter(abs(col("bus") - col("pus")) <= tolUs)
      .groupBy(col("probe_id"))
      .agg(min(struct(abs(col("bus") - col("pus")).as("d"),
        col("bus").as("t"), col("build_id").as("i"),
        (col("bus") - col("pus")).as("s"))).as("m"),
        first(col("user_id")).as("user_id"))
      .select(col("probe_id").as("purchase_id"), col("user_id"),
        col("m.i").as("click_id"), col("m.s").as("dt_us"))
      .orderBy(col("purchase_id"))
  }

  private def q183(spark: SparkSession, dir: String): DataFrame =
    nearestEvent(Tables.events(spark, dir), "purchase", "click",
      tolUs = 600000000L)

  private val q183Sql: String =
    """WITH p AS (
      |  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pus
      |  FROM events WHERE event_type = 'purchase'
      |), c AS (
      |  SELECT event_id AS click_id, user_id, epoch_us(ts) AS bus
      |  FROM events WHERE event_type = 'click'
      |), cand AS (
      |  SELECT p.purchase_id, p.user_id, c.click_id, c.bus - p.pus AS dt_us,
      |         row_number() OVER (PARTITION BY p.purchase_id
      |                            ORDER BY abs(c.bus - p.pus), c.bus, c.click_id)
      |           AS rn
      |  FROM p JOIN c ON c.user_id = p.user_id
      |   AND abs(c.bus - p.pus) <= 600000000
      |)
      |SELECT purchase_id, user_id, click_id, dt_us
      |FROM cand WHERE rn = 1
      |ORDER BY purchase_id""".stripMargin

  // -------------------------------------------------------------- q134
  /** U-shaped (position-based) multi-touch attribution: every
    * non-purchase event is a touch credited to its user's NEXT
    * purchase — 40% to the first touch, 40% to the last, the middle
    * 20% split evenly (degenerate paths: one touch takes 1.0, two
    * take 0.5 each) — the multi-touch generalization of q114's
    * last-touch report, and the credit model marketing teams actually
    * reconcile against.
    *
    *  Scale shape: conversion assignment is NOT a touches×conversions
    * join (per-user quadratic, q20's density trap) — each touch finds
    * its next conversion with one `min(conv_ts)` over a FOLLOWING
    * frame, then position/path-length are windows over the assigned
    * (user, conversion) groups: three window passes on one user_id
    * shuffle, one corpus scan, zero joins. Credits are exact rationals
    * summed once per channel, rounded at 4 dp. */
  private def q134(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wNext = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      .rowsBetween(1, Window.unboundedFollowing)
    val wPath = Window.partitionBy($"user_id", $"conv_us")
      .orderBy($"us", $"event_id")
    val wLen = Window.partitionBy($"user_id", $"conv_us")
    Tables.events(spark, dir)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"), $"event_id")
      .withColumn("conv_us",
        min(when($"event_type" === "purchase", $"us")).over(wNext))
      .filter($"event_type" =!= "purchase" && $"conv_us".isNotNull)
      .withColumn("pos", row_number().over(wPath))
      .withColumn("m", count(lit(1)).over(wLen))
      .withColumn("credit",
        when($"m" === 1, lit(1.0))
          .when($"m" === 2, lit(0.5))
          .when($"pos" === 1 || $"pos" === $"m", lit(0.4))
          .otherwise(lit(0.2) / ($"m" - 2)))
      .groupBy($"event_type".as("channel"))
      .agg(count(lit(1)).as("n_touches"), round(sum($"credit"), 4).as("credit"))
      .orderBy($"channel")
  }

  private val q134Sql: String =
    """WITH assigned AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
      |         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
      |           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
      |           AS conv_us
      |  FROM events
      |), ranked AS (
      |  SELECT event_type AS channel,
      |         row_number() OVER (PARTITION BY user_id, conv_us
      |                            ORDER BY us, event_id) AS pos,
      |         count(*) OVER (PARTITION BY user_id, conv_us) AS m
      |  FROM assigned
      |  WHERE event_type <> 'purchase' AND conv_us IS NOT NULL
      |), credits AS (
      |  SELECT channel,
      |         CASE WHEN m = 1 THEN 1.0
      |              WHEN m = 2 THEN 0.5
      |              WHEN pos = 1 OR pos = m THEN 0.4
      |              ELSE 0.2 / (m - 2) END AS credit
      |  FROM ranked
      |)
      |SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
      |       round(sum(credit), 4) AS credit
      |FROM credits GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------- q136
  /** Interval union (coverage) per user: every event opens a 12-hour
    * presence interval `[us, us+Hold)`; overlapping or abutting
    * intervals merge into islands, and the report is each user's
    * island count, total covered time, and longest contiguous stretch
    * — the uptime/dwell-time reading of the event stream (q111 answers
    * "how many sessions are open at instant t" with a global boundary
    * sweep; this answers "how much of the timeline does each user
    * cover", which the sweep can't give per key).
    *
    * Classic sweep-line as pure window algebra on ONE user_id shuffle:
    * an island starts where the start exceeds the running `max(end)`
    * over all strictly-preceding intervals (strict `>`, so abutting
    * half-open intervals merge), the island id is the running count of
    * starts riding the SAME sort, and two hash-aggs collapse islands →
    * users. All arithmetic stays in integer micros until one terminal
    * IEEE divide per column — no rounding needed anywhere. At 100 TB
    * the sweep parallelizes by key with no global structure; a key
    * whose timeline outgrows a task splits into (user, coarse epoch)
    * chunks whose boundary islands stitch in one extra pass. */
  private[graft] val HoldUs = 43200000000L // 12 h

  private def q136(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val preceding = w.rowsBetween(Window.unboundedPreceding, -1)
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
      .withColumn("e_us", $"us" + HoldUs)
      .withColumn("pm", max($"e_us").over(preceding))
      .withColumn("new_i", when($"pm".isNull || $"us" > $"pm", 1).otherwise(0))
      .withColumn("island", sum($"new_i").over(running))
      .groupBy($"user_id", $"island")
      .agg(count(lit(1)).as("n_ev"), (max($"e_us") - min($"us")).as("span_us"))
      .groupBy($"user_id")
      .agg(
        sum($"n_ev").as("n_events"),
        count(lit(1)).as("n_islands"),
        (sum($"span_us") / lit(1000000.0)).as("covered_s"),
        (max($"span_us") / lit(1000000.0)).as("max_island_s"))
      .orderBy($"user_id")
  }

  private val q136Sql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS us,
       |         epoch_us(ts) + $HoldUs AS e_us
       |  FROM events
       |), m AS (
       |  SELECT user_id, event_id, us, e_us,
       |         max(e_us) OVER (PARTITION BY user_id ORDER BY us, event_id
       |                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |           AS pm
       |  FROM e
       |), isl AS (
       |  SELECT user_id, us, e_us,
       |         sum(CASE WHEN pm IS NULL OR us > pm THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY user_id ORDER BY us, event_id
       |                 ROWS UNBOUNDED PRECEDING) AS island
       |  FROM m
       |), sp AS (
       |  SELECT user_id, island, count(*) AS n_ev,
       |         max(e_us) - min(us) AS span_us
       |  FROM isl GROUP BY 1, 2
       |)
       |SELECT user_id,
       |       CAST(sum(n_ev) AS BIGINT) AS n_events,
       |       CAST(count(*) AS BIGINT) AS n_islands,
       |       CAST(sum(span_us) AS BIGINT) / 1000000.0 AS covered_s,
       |       max(span_us) / 1000000.0 AS max_island_s
       |FROM sp
       |GROUP BY 1
       |ORDER BY user_id""".stripMargin

  // -------------------------------------------------------------- q150
  /** Point-in-time version join: every event enriched with the SCD2
    * version (q110's intervals) that was VALID at its instant — the
    * lookup every "what was true when this fact happened" join needs,
    * and the join shape that makes or breaks a versioned-dimension
    * warehouse at scale.
    *
    * Spark side: the interval join FUSES into the q110 window pass —
    * version membership is the running change-count at the event's own
    * (us, event_id) sort position, version size and currency are two
    * more windows riding the SAME user_id shuffle (hash(user_id)
    * satisfies the (user_id, ver) clustering, so no second exchange).
    * The ORACLE stays the naive form: build the version intervals,
    * then a genuine per-user interval join on the row-ordinal axis
    * (rank ranges — integer-exact, tie-free where raw timestamps can
    * collide). The gate therefore proves fusion ≡ interval join —
    * q113's one-scan discipline applied to dimension versioning.
    *
    * At 100 TB with a PERSISTED dimension (facts and versions in
    * different tables, where no fusion exists): broadcast the
    * version table if it fits; else q56's bucketed range join. This
    * query is the same-table case, where the scale-safe form is to
    * never join at all. */
  private def q150(spark: SparkSession, dir: String): DataFrame =
    pointInTime(spark, dir, attrCol = "event_type")

  /** Open-knob core of q150, shared with [[graft.Graft.pointInTime]] —
    * any event column can be the versioned attribute (q110's
    * `scd2History` contract). */
  private[graft] def pointInTime(spark: SparkSession, dir: String,
      attrCol: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wv = Window.partitionBy($"user_id", $"ver")
    val wu = Window.partitionBy($"user_id")
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", col(attrCol).as("attr"),
        unix_micros($"ts").as("us"))
      // q110's null-safe change flag, verbatim — one attr definition
      .withColumn("new_v",
        when(lag($"us", 1).over(w).isNull ||
          !($"attr" <=> lag($"attr", 1).over(w)), 1).otherwise(0))
      .withColumn("ver", sum($"new_v").over(running).cast("int"))
      .withColumn("n_obs", count(lit(1)).over(wv))
      .withColumn("is_current",
        when($"ver" === max($"ver").over(wu), 1).otherwise(0).cast("int"))
      .select($"event_id", $"user_id", $"us", $"ver", $"attr",
        $"n_obs", $"is_current")
      .orderBy($"user_id", $"us", $"event_id")
  }

  /** The naive spelling the fusion must equal: versions as rank
    * intervals `[rn_from, rn_to)`, events interval-joined per user. */
  private val q150Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type AS attr, epoch_us(ts) AS us,
      |         row_number() OVER w AS rn,
      |         CASE WHEN lag(us) OVER w IS NULL
      |               OR attr <> lag(attr) OVER w THEN 1 ELSE 0 END AS new_v
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
      |), verd AS (
      |  SELECT *, CAST(sum(new_v) OVER (PARTITION BY user_id ORDER BY us, event_id
      |                                  ROWS UNBOUNDED PRECEDING) AS INTEGER) AS ver
      |  FROM ev
      |), vers AS (
      |  SELECT user_id, ver, min(attr) AS attr, min(rn) AS rn_from,
      |         CAST(count(*) AS BIGINT) AS n_obs
      |  FROM verd GROUP BY 1, 2
      |), intervals AS (
      |  SELECT *,
      |         lead(rn_from) OVER (PARTITION BY user_id ORDER BY ver) AS rn_to
      |  FROM vers
      |)
      |SELECT e.event_id, e.user_id, e.us, v.ver, v.attr, v.n_obs,
      |       CAST(CASE WHEN v.rn_to IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_current
      |FROM verd e
      |JOIN intervals v
      |  ON v.user_id = e.user_id
      | AND e.rn >= v.rn_from AND (v.rn_to IS NULL OR e.rn < v.rn_to)
      |ORDER BY e.user_id, e.us, e.event_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q110_scd2_history", q110, Some(q110Sql)),
    Q("q150_point_in_time", q150, Some(q150Sql)),
    Q("q111_concurrency", q111, Some(q111Sql)),
    Q("q113_snapshot_diff", q113, Some(q113Sql)),
    Q("q183_nearest_event", q183, Some(q183Sql)),
    Q("q114_attribution", q114, Some(q114Sql)),
    Q("q119_time_weighted_avg", q119, Some(q119Sql)),
    Q("q134_multitouch_attribution", q134, Some(q134Sql)),
    Q("q136_interval_coverage", q136, Some(q136Sql)),
  )
}
