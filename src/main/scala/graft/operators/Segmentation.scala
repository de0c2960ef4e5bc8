package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.Portable
import graft.sources.Tables

/** Population segmentation and experiment readout — the two workloads a
  * product analytics stack runs daily on top of the behavioral family:
  * RFM customer scoring (the classic recency/frequency/monetary
  * quintile cut, Hughes' segmentation every CRM implements) and a
  * two-proportion experiment readout over a deterministic hash-based
  * assignment (the q51 split discipline applied to A/B bucketing).
  *
  * Determinism: every ntile window orders by an INTEGER-exact key with
  * a customer tiebreak (q107's rule — monetary ranks on exact cents,
  * never on a drifting double sum); the z-statistic is computed from
  * integer sufficient counts with a fixed parenthesization and one
  * terminal round.
  */
object Segmentation extends DetRounding {

  // -------------------------------------------------------------- q137
  /** RFM quintile segmentation within market segment: per customer,
    * recency (last order date), frequency (order count), monetary
    * (lifetime spend) each cut into quintiles among segment peers, the
    * 3-digit RFM cell, and the canonical lifecycle label. Scoring
    * within c_mktsegment is both the analytically honest cut (segments
    * have different baseline spend) and the scale-right one: each
    * ntile is a window over a bounded peer partition, never a global
    * single-partition sort (at 100 TB with high-cardinality cohorts
    * the same shape holds; for a truly global cut, switch the boundary
    * source to q54's mergeable quantile sketch and assign by range —
    * same output contract).
    *
    * One orders scan collapses to #customers rows BEFORE the customer
    * join (partial+final agg), so the join and all three windows move
    * only aggregate rows. Monetary ORDERS on exact integer cents
    * (per-row half-up rounding identical both engines on identical
    * doubles) while the EMITTED lifetime spend is the double sum
    * rounded 2 dp; recency_days is one IEEE divide of exact integer
    * micros. */
  private val AnchorUs = 999302400000000L // 2001-09-01, just past max(o_orderdate)

  private def q137(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val m = Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(
        // o_orderdate reads as TIMESTAMP_NTZ; session tz is UTC at every
        // entry point, so the cast is the identity DuckDB's epoch_us uses
        max(unix_micros($"o_orderdate".cast("timestamp"))).as("last_us"),
        count(lit(1)).as("n_orders"),
        sum(round($"o_totalprice" * 100, 0).cast("long")).as("m_cents"),
        round(sum($"o_totalprice"), 2).as("monetary"))
    val joined = m.join(
      Tables.customer(spark, dir).select($"c_custkey", $"c_mktsegment"),
      $"o_custkey" === $"c_custkey")
    def quintile(key: String): org.apache.spark.sql.Column =
      ntile(5).over(Window.partitionBy($"c_mktsegment").orderBy(col(key), $"c_custkey"))
    joined
      .select($"c_custkey", $"c_mktsegment", $"n_orders", $"monetary",
        (lit(AnchorUs) - $"last_us") / lit(86400000000.0) as "recency_days",
        quintile("last_us").as("r_score"),
        quintile("n_orders").as("f_score"),
        quintile("m_cents").as("m_score"))
      .withColumn("rfm_cell", $"r_score" * 100 + $"f_score" * 10 + $"m_score")
      .withColumn("segment_label",
        when($"r_score" >= 4 && $"f_score" >= 4 && $"m_score" >= 4, "champion")
          .when($"r_score" >= 4 && $"f_score" <= 2, "new")
          .when($"r_score" <= 2 && $"f_score" >= 4, "at_risk")
          .when($"r_score" <= 2 && $"f_score" <= 2, "lapsed")
          .otherwise("core"))
      .orderBy($"c_custkey")
  }

  private val q137Sql: String =
    s"""WITH m AS (
       |  SELECT o_custkey,
       |         max(epoch_us(o_orderdate)) AS last_us,
       |         CAST(count(*) AS BIGINT) AS n_orders,
       |         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
       |           AS m_cents,
       |         round(sum(o_totalprice), 2) AS monetary
       |  FROM orders GROUP BY 1
       |), s AS (
       |  SELECT c.c_custkey, c.c_mktsegment, m.n_orders, m.monetary,
       |         ($AnchorUs - m.last_us) / 86400000000.0 AS recency_days,
       |         CAST(ntile(5) OVER (PARTITION BY c.c_mktsegment
       |                             ORDER BY m.last_us, c.c_custkey) AS INTEGER)
       |           AS r_score,
       |         CAST(ntile(5) OVER (PARTITION BY c.c_mktsegment
       |                             ORDER BY m.n_orders, c.c_custkey) AS INTEGER)
       |           AS f_score,
       |         CAST(ntile(5) OVER (PARTITION BY c.c_mktsegment
       |                             ORDER BY m.m_cents, c.c_custkey) AS INTEGER)
       |           AS m_score
       |  FROM m JOIN customer c ON m.o_custkey = c.c_custkey
       |)
       |SELECT c_custkey, c_mktsegment, n_orders, monetary, recency_days,
       |       r_score, f_score, m_score,
       |       r_score * 100 + f_score * 10 + m_score AS rfm_cell,
       |       CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
       |            WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
       |            WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
       |            WHEN r_score <= 2 AND f_score <= 2 THEN 'lapsed'
       |            ELSE 'core' END AS segment_label
       |FROM s
       |ORDER BY c_custkey""".stripMargin

  // -------------------------------------------------------------- q138
  /** Two-proportion experiment readout: users are assigned to arms by
    * the q51 hash-split discipline (a salted portable hash — stable
    * across reruns and backfills, never `rand()`), conversion is "any
    * purchase above the value threshold", and the readout is the
    * pooled two-proportion z-test — the go/no-go table an
    * experimentation platform serves.
    *
    * Scale shape: one events scan → per-user conditional max (partial+
    * final agg, #users rows) → a SINGLE conditional aggregate row of
    * integer sufficient counts (n, conversions per arm); the z
    * arithmetic is driver-free column algebra on that one row. The
    * arm rates ship as single IEEE divides of exact integers (q107's
    * discipline); z gets one terminal 6 dp round (its sqrt is an
    * IEEE-correctly-rounded op over a fixed parenthesization, the
    * decision threshold compares the UNROUNDED value). */
  private val ExpSalt = "#graft-exp1"
  private val ConvValue = 160.0

  /** The experiment arm as a pure function of the unit key — q51's
    * salted-hash split discipline applied to A/B bucketing; ONE
    * definition shared by q138 and q141 so both readouts agree on
    * assignment by construction. */
  private[operators] def armOf(user: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Portable.hash32(concat(user.cast("string"), lit(ExpSalt))) % 2

  private[operators] def armOfSql(e: String): String =
    Portable.hash32Sql(s"CAST($e AS VARCHAR) || '$ExpSalt'") + " % 2"

  private def q138(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perUser = Tables.events(spark, dir)
      .groupBy($"user_id")
      .agg(max(when($"event_type" === "purchase" && $"value" > ConvValue, 1)
        .otherwise(0)).as("converted"))
      .withColumn("variant", armOf($"user_id"))
    val s = perUser.agg(
      sum(when($"variant" === 0, 1).otherwise(0)).as("n_a"),
      sum(when($"variant" === 0, $"converted").otherwise(0)).as("conv_a"),
      sum(when($"variant" === 1, 1).otherwise(0)).as("n_b"),
      sum(when($"variant" === 1, $"converted").otherwise(0)).as("conv_b"))
    val pA = $"conv_a" / $"n_a"
    val pB = $"conv_b" / $"n_b"
    val pp = ($"conv_a" + $"conv_b") / ($"n_a" + $"n_b")
    val z = (pA - pB) /
      sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / $"n_a" + lit(1.0) / $"n_b"))
    s.select($"n_a", $"conv_a", $"n_b", $"conv_b",
      pA.as("p_a"), pB.as("p_b"),
      round(z, 6).as("z_stat"),
      when(abs(z) > 1.96, 1).otherwise(0).as("is_significant"))
  }

  private val q138Sql: String = {
    val variant = armOfSql("user_id")
    s"""WITH u AS (
       |  SELECT user_id,
       |         max(CASE WHEN event_type = 'purchase' AND value > $ConvValue
       |                  THEN 1 ELSE 0 END) AS converted,
       |         $variant AS variant
       |  FROM events GROUP BY user_id
       |), s AS (
       |  SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |         CAST(sum(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS BIGINT)
       |           AS conv_a,
       |         CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |         CAST(sum(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS BIGINT)
       |           AS conv_b
       |  FROM u
       |)
       |SELECT n_a, conv_a, n_b, conv_b,
       |       CAST(conv_a AS DOUBLE) / n_a AS p_a,
       |       CAST(conv_b AS DOUBLE) / n_b AS p_b,
       |       round((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b) /
       |             sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
       |                  (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
       |                  (1.0 / n_a + 1.0 / n_b)), 6) AS z_stat,
       |       CASE WHEN abs((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b) /
       |                     sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
       |                          (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
       |                          (1.0 / n_a + 1.0 / n_b))) > 1.96
       |            THEN 1 ELSE 0 END AS is_significant
       |FROM s""".stripMargin
  }

  // -------------------------------------------------------------- q141
  /** CUPED variance reduction for the experiment readout (Deng, Xu,
    * Kohavi & Walker, WSDM'13): each user's post-period purchase
    * revenue is adjusted by their PRE-period revenue — the covariate
    * the treatment cannot have touched — via
    *
    *   ŷᵢ = yᵢ − θ·(xᵢ − x̄),  θ = cov(x,y)/var(x)
    *
    * which shrinks metric variance by corr² without biasing the arm
    * difference. Per-arm adjusted means collapse to sufficient-sum
    * algebra: mean_adj = ȳₐ − θ·(x̄ₐ − x̄), so the whole readout is
    * one events scan → per-user conditional sums (#users rows) →
    * per-arm sums (2 rows) → window-over-the-2-rows global sums —
    * θ and x̄ derive from the ARM subtotals on both sides (identical
    * association), q115's raw-sufficient-sums discipline (never an
    * engine corr() builtin), fixed parenthesization, terminal rounds
    * only. Assignment is [[armOf]] — the same arms as q138 by
    * construction. Nothing downstream of the per-user aggregate
    * scales with event volume. */
  private val CupedCutoffUs = 1705363200000000L // 2024-01-16, q113's mid-range cutoff

  private def q141(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val isPurch = $"event_type" === "purchase"
    val us = unix_micros($"ts")
    val perUser = Tables.events(spark, dir)
      .groupBy($"user_id")
      .agg(
        sum(when(isPurch && us < CupedCutoffUs, $"value").otherwise(0.0)).as("x"),
        sum(when(isPurch && us >= CupedCutoffUs, $"value").otherwise(0.0)).as("y"))
      .withColumn("variant", armOf($"user_id"))
    val arms = perUser.groupBy($"variant").agg(
      count(lit(1)).as("n"),
      sum($"x").as("sx"), sum($"y").as("sy"),
      sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val theta = (sum($"n").over(wAll) * sum($"sxy").over(wAll) -
      sum($"sx").over(wAll) * sum($"sy").over(wAll)) /
      (sum($"n").over(wAll) * sum($"sxx").over(wAll) -
        sum($"sx").over(wAll) * sum($"sx").over(wAll))
    val xbar = sum($"sx").over(wAll) / sum($"n").over(wAll)
    arms
      .select($"variant", $"n".as("n_users"),
        round($"sx" / $"n", 4).as("mean_pre"),
        round($"sy" / $"n", 4).as("mean_post"),
        round($"sy" / $"n" - theta * ($"sx" / $"n" - xbar), 4).as("mean_post_adj"),
        round(theta, 6).as("theta"))
      .orderBy($"variant")
  }

  private val q141Sql: String = {
    val variant = armOfSql("user_id")
    val th = "(gn * gsxy - gsx * gsy) / (gn * gsxx - gsx * gsx)"
    s"""WITH u AS (
       |  SELECT user_id,
       |         sum(CASE WHEN event_type = 'purchase' AND epoch_us(ts) < $CupedCutoffUs
       |                  THEN value ELSE 0.0 END) AS x,
       |         sum(CASE WHEN event_type = 'purchase' AND epoch_us(ts) >= $CupedCutoffUs
       |                  THEN value ELSE 0.0 END) AS y,
       |         $variant AS variant
       |  FROM events GROUP BY user_id
       |), a AS (
       |  SELECT variant, CAST(count(*) AS BIGINT) AS n,
       |         sum(x) AS sx, sum(y) AS sy,
       |         sum(x * y) AS sxy, sum(x * x) AS sxx
       |  FROM u GROUP BY 1
       |), g AS (
       |  SELECT variant, n, sx, sy,
       |         CAST(sum(n) OVER () AS BIGINT) AS gn,
       |         sum(sx) OVER () AS gsx, sum(sy) OVER () AS gsy,
       |         sum(sxy) OVER () AS gsxy, sum(sxx) OVER () AS gsxx
       |  FROM a
       |)
       |SELECT variant, n AS n_users,
       |       round(sx / n, 4) AS mean_pre,
       |       round(sy / n, 4) AS mean_post,
       |       round(sy / n - $th * (sx / n - gsx / gn), 4) AS mean_post_adj,
       |       round($th, 6) AS theta
       |FROM g
       |ORDER BY variant""".stripMargin
  }

  // -------------------------------------------------------------- q161
  /** Mann–Whitney U experiment readout — the NONPARAMETRIC rung of the
    * experiment family (q138 tests proportions, q141 variance-reduces
    * means; this tests whole distributions): per-user activity counts
    * are midranked over the combined sample, U derives from arm A's
    * rank sum, and the z approximation carries the standard TIE
    * correction `var = n₁n₂/12 · ((N+1) − Σ(t³−t)/(N(N−1)))` — counts
    * tie heavily, so the correction is load-bearing, not decoration.
    * Arms are [[armOf]] — the same assignment as q138/q141 by
    * construction.
    *
    * Determinism is structural: the metric is an exact integer, so
    * ranks can't flip on ulp drift (a double-sum metric would make the
    * RANKING itself nondeterministic — q107's tie discipline); every
    * midrank is a multiple of 0.5 and every rank-sum term is exactly
    * representable, so `r_a`/`u_stat` are BIT-exact in any summation
    * order and only z needs its one terminal round (6 dp; the
    * significance flag compares the unrounded value, q138's rule).
    *
    * Scale shape: one events scan → per-user count (#users rows) →
    * value histogram (#distinct counts rows — the frame CONTRACTS
    * before any window) → cumulative-less window over that tiny frame
    * (q111's contracted-global-window shape) → ONE sufficient-stat
    * row. Nothing after the first aggregate scales with events. */
  private def q161(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perUser = Tables.events(spark, dir)
      .groupBy($"user_id").agg(count(lit(1)).as("m"))
      .withColumn("variant", armOf($"user_id"))
    mannWhitney(perUser)
  }

  /** q161's core over ANY per-unit frame carrying an integral metric
    * `m` and a 0/1 `variant` ([[graft.Graft.mannWhitney]]). The metric
    * must be integral: ranks over a drifting double sum would make the
    * RANKING itself nondeterministic (q107's tie discipline). */
  private[graft] def mannWhitney(perUnit: DataFrame): DataFrame = {
    val spark = perUnit.sparkSession
    import spark.implicits._
    require(Seq("m", "variant").forall(perUnit.columns.contains),
      s"need columns (m, variant), got ${perUnit.columns.mkString(", ")}")
    require(Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
      .contains(perUnit.schema("m").dataType),
      s"metric m must be integral for deterministic ranking (got ${perUnit.schema("m").dataType})")
    val hist = perUnit.groupBy($"m").agg(
      count(lit(1)).as("c"),
      sum(when($"variant" === 0, 1L).otherwise(0L)).as("ca"))
    val wv = Window.orderBy($"m").rowsBetween(Window.unboundedPreceding, -1)
    val ranked = hist
      .withColumn("cum_less", coalesce(sum($"c").over(wv), lit(0L)))
      .withColumn("midrank", $"cum_less" + ($"c" + 1L) / lit(2.0))
    val s = ranked.agg(
      sum($"ca").as("n_a"),
      sum($"c").as("n"),
      sum($"ca" * $"midrank").as("r_a"),
      sum($"c" * $"c" * $"c" - $"c").as("tie_sum"))
    val nb = $"n" - $"n_a"
    val uA = $"r_a" - ($"n_a" * ($"n_a" + 1L)).cast("double") / lit(2.0)
    val z = (uA - ($"n_a" * nb).cast("double") / lit(2.0)) /
      sqrt(($"n_a" * nb).cast("double") / lit(12.0) *
        (($"n" + 1L).cast("double") -
          $"tie_sum".cast("double") / ($"n" * ($"n" - 1L)).cast("double")))
    s.select($"n_a", nb.as("n_b"), $"r_a", uA.as("u_stat"),
      round(z, 6).as("z_stat"),
      when(abs(z) > 1.96, 1).otherwise(0).as("is_significant"))
  }

  private val q161Sql: String = {
    val variant = armOfSql("user_id")
    val uA = "r_a - CAST(n_a*(n_a+1) AS DOUBLE)/2.0"
    val z = s"($uA - CAST(n_a*(n - n_a) AS DOUBLE)/2.0) / " +
      "sqrt(CAST(n_a*(n - n_a) AS DOUBLE)/12.0 * " +
      "(CAST(n+1 AS DOUBLE) - CAST(tie_sum AS DOUBLE)/CAST(n*(n-1) AS DOUBLE)))"
    s"""WITH u AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS m, $variant AS variant
       |  FROM events GROUP BY user_id
       |), h AS (
       |  SELECT m, CAST(count(*) AS BIGINT) AS c,
       |         CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca
       |  FROM u GROUP BY m
       |), r AS (
       |  SELECT m, c, ca,
       |         COALESCE(CAST(sum(c) OVER (ORDER BY m
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
       |           AS cum_less
       |  FROM h
       |), s AS (
       |  SELECT CAST(sum(ca) AS BIGINT) AS n_a,
       |         CAST(sum(c) AS BIGINT) AS n,
       |         sum(ca * (cum_less + (c + 1) / 2.0)) AS r_a,
       |         CAST(sum(c*c*c - c) AS BIGINT) AS tie_sum
       |  FROM r
       |)
       |SELECT n_a, n - n_a AS n_b, r_a,
       |       $uA AS u_stat,
       |       round($z, 6) AS z_stat,
       |       CASE WHEN abs($z) > 1.96 THEN 1 ELSE 0 END AS is_significant
       |FROM s""".stripMargin
  }

  // -------------------------------------------------------------- q165
  /** Grid-density clustering over the embedding space — GRIDCLUS/
    * DBSCAN's density idea made shuffle-friendly (Schikuta '96; the
    * STING/CLIQUE family): quantize the first two embedding dimensions
    * to a fixed grid, keep cells with ≥ minPts points (core cells),
    * connect core cells that touch (Chebyshev-adjacent, 8 directions),
    * and label the connected patches with the shared pointer-jumping
    * engine ([[Components]] — q50/q57's core). Emits one row per
    * cluster with its cell/point mass and bounding box. Unlike the
    * centroid family (q41/q149) this finds arbitrary-shape dense
    * regions and leaves sparse cells unclustered — the outlier/
    * mode-discovery complement.
    *
    * Scale: points contract to cells in ONE partial+final aggregate
    * (the raw corpus is never touched again); adjacency is an
    * equi-join on neighbor cell id (9-fold explode of the CELL frame,
    * ≪ points), and component rounds run on the core-cell graph —
    * O(log diameter) tiny-frame joins. The oracle recomputes the
    * closure by recursive CTE, so the gate proves the distributed
    * labeling, not just self-consistency. Float→double quantization is
    * exact on both engines (same IEEE divide + floor on the same
    * widened value). */
  private val GridStep = 0.05
  private val GridMinPts = 3

  /** Generic core of q165, opened via [[graft.Graft.gridClusters]]:
    * density clustering of any (x, y) point frame. `memoKey` persists
    * the component labels as a shared intermediate (the catalog's
    * choice); facade callers with one-shot frames leave it None. */
  private[graft] def gridClusters(points: DataFrame, xCol: String,
      yCol: String, step: Double = GridStep, minPts: Long = GridMinPts,
      memoKey: Option[(String, String)] = None): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val cells = points
      .select(
        floor(col(xCol).cast("double") / step).cast("long").as("cx"),
        floor(col(yCol).cast("double") / step).cast("long").as("cy"))
      .groupBy($"cx", $"cy").agg(count(lit(1)).as("n"))
    def cellId(cx: Column, cy: Column): Column = (cx + 100L) * 1000L + (cy + 100L)
    val core = cells.filter($"n" >= minPts)
      .withColumn("cell_id", cellId($"cx", $"cy"))
    val offsets = for { dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0 }
      yield (dx, dy)
    val edges = core
      .select($"cell_id", explode(array(offsets.map { case (dx, dy) =>
        cellId($"cx" + dx, $"cy" + dy) }: _*)).as("nbr"))
      .join(core.select($"cell_id".as("nbr")), Seq("nbr"))
      .filter($"cell_id" < $"nbr")
      .select($"cell_id".as("src"), $"nbr".as("dst"))
    // the label table is a persisted intermediate like q50's — the memo
    // owns its lifecycle (release/clearAll), and repeated calls (bench
    // warmup + timed pass) reuse one component computation
    def ccLabels() = Components.run(edges).labels
    val labels = (memoKey match {
      case Some((dir, key)) =>
        graft.core.PersistedMemo.getOrBuild(spark, dir, key)(ccLabels())
      case None => ccLabels()
    }).withColumnRenamed("doc_id", "cell_id")
    core.join(labels, Seq("cell_id"), "left")
      .withColumn("cluster_id", coalesce($"lbl", $"cell_id"))
      .groupBy($"cluster_id")
      .agg(count(lit(1)).as("n_cells"), sum($"n").as("n_points"),
        min($"cx").as("cx_lo"), max($"cx").as("cx_hi"),
        min($"cy").as("cy_lo"), max($"cy").as("cy_hi"))
      .orderBy($"cluster_id")
  }

  private def q165(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    gridClusters(
      Tables.embeddings(spark, dir)
        .select(element_at($"embedding", 1).as("x"),
          element_at($"embedding", 2).as("y")),
      "x", "y", memoKey = Some((dir, "segmentation:grid-cc")))
  }

  private val q165Sql: String =
    s"""WITH RECURSIVE pts AS (
       |  SELECT floor(CAST(embedding[1] AS DOUBLE) / $GridStep) AS fx,
       |         floor(CAST(embedding[2] AS DOUBLE) / $GridStep) AS fy
       |  FROM embeddings
       |), cells AS (
       |  SELECT CAST(fx AS BIGINT) AS cx, CAST(fy AS BIGINT) AS cy,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM pts GROUP BY 1, 2
       |), core AS (
       |  SELECT cx, cy, n, (cx + 100) * 1000 + (cy + 100) AS cell_id
       |  FROM cells WHERE n >= $GridMinPts
       |), edges AS (
       |  SELECT a.cell_id AS src, b.cell_id AS dst
       |  FROM core a JOIN core b
       |    ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
       |   AND a.cell_id <> b.cell_id
       |), reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
       |), lbl AS (
       |  SELECT src AS cell_id, least(src, min(dst)) AS cluster_id
       |  FROM reach GROUP BY src
       |)
       |SELECT CAST(COALESCE(l.cluster_id, c.cell_id) AS BIGINT) AS cluster_id,
       |       CAST(count(*) AS BIGINT) AS n_cells,
       |       CAST(sum(c.n) AS BIGINT) AS n_points,
       |       min(c.cx) AS cx_lo, max(c.cx) AS cx_hi,
       |       min(c.cy) AS cy_lo, max(c.cy) AS cy_hi
       |FROM core c LEFT JOIN lbl l ON l.cell_id = c.cell_id
       |GROUP BY 1
       |ORDER BY cluster_id""".stripMargin

  // -------------------------------------------------------------- q212
  /** POINT-level DBSCAN (Ester et al. KDD'96) over the projected
    * embedding plane — the exact-semantics upgrade of q165's cell
    * approximation: q165 clusters dense CELLS (a point on the sparse
    * side of a cell boundary is mislabeled), this one computes every
    * point's true ε-neighborhood, the core/border/noise trichotomy,
    * and clusters = connected components of the core-core ε-graph with
    * border points attached to their MINIMUM-labeled core neighbor
    * (the deterministic tiebreak for DBSCAN's classic border
    * ambiguity). Emits per-cluster core/border/point counts plus the
    * noise row (cluster_id −1) — the arbitrary-shape mode/outlier
    * readout a semantic-curation pass runs on embedding projections.
    *
    * Scale: the ε-join is CELL-BUCKETED — grid width = ε, so every
    * true neighbor pair lies in Chebyshev-adjacent cells and the
    * candidate join is a 9-fold explode equi-join (never N²; the
    * oracle's quadratic spelling is the parity proof, viable only at
    * fixture scale). Degrees are one hash aggregate over candidates;
    * components run on the core ε-graph through the shared
    * pointer-jumping engine ([[Components]] — O(log diameter) rounds).
    * Distance compares are the same IEEE (Δx²+Δy² ≤ ε²) doubles on
    * both engines — exact parity, no rounding anywhere. */
  private val DbscanEps = 0.05
  private val DbscanMinPts = 4L // ε-neighbors INCLUDING the point itself

  /** Generic core, opened via [[graft.Graft.dbscan]].
    *
    * Round-11 rebuild of the heavy stage (the round-10 sf10 build tail:
    * the old form materialized the FULL directed ε-graph — ~3·10⁸ rows
    * at sf10 density — recomputed it three times (degrees, core edges,
    * border attach), and ran connected components over ~10⁸ core-core
    * edges). Three structural moves, every output bit unchanged:
    *
    *  1. **Half-ε grid, same-cell pairs free.** Cell width = ε/2, so
    *     the cell diagonal is ε/√2 < ε and every same-cell pair
    *     qualifies BY CONSTRUCTION (fp-safe: dist² < ε²/2, far below
    *     the ε² threshold on both engines) — the densest slice of the
    *     quadratic (|cell|² pairs per cell) is counted via one
    *     cell-size aggregate and never materialized or
    *     distance-checked. Qualifying CROSS-cell pairs span ≤ 2 cells
    *     per axis → 12 forward offsets enumerate each unordered pair
    *     exactly once (half the distance evaluations of a symmetric
    *     enumeration).
    *  2. **Clique→star compression feeding CC.** Same-cell cores are
    *     mutually ε-connected, so the per-cell clique is replaced by a
    *     star on the cell's min core id (the anchor), and EVERY
    *     qualifying cross-cell core-core pair contracts to one
    *     (anchorA, anchorB) edge per cell pair. Connectivity is
    *     preserved both ways (star/anchor edges are witnessed by real
    *     ε-edges; every real ε-edge is subsumed by stars + its cells'
    *     anchor edge), so components — and their min-id labels — are
    *     IDENTICAL to the full core graph's, while the CC input drops
    *     from ~10⁸ edges to #core + #adjacent-core-cell-pairs.
    *  3. **Memoize the MEMBERS frame, not the labels.** The catalog
    *     path used to re-run the ε-join every sweep for degrees and
    *     border attach; now the per-point (id, cluster_id, is_core)
    *     table is the shared intermediate (N rows — the natural
    *     materialization of a clustering) and a sweep pays one
    *     aggregate over it.
    *
    * The one candidate join that remains is persisted for its three
    * consumers (degrees, anchor edges, border attach) and unpersisted
    * once members materialize. Cell-boundary fp displacement (a point
    * within 1 ulp of a cell edge landing one cell over, pushing a
    * REAL pair past the 2-cell probe ring) needs Δx within an ulp of
    * 2w AND a boundary coincidence — the same measure-zero class the
    * old ε-width/±1-ring form accepted.
    *
    * Border parity detail: all same-cell cores of a non-core point are
    * its ε-neighbors and share one component, so the same-cell border
    * candidate is the cell anchor's cluster_id; cross-cell candidates
    * come from the pair table in both directions. min() over the union
    * equals the oracle's min over all core ε-neighbors. */
  /** The ε-join's candidate stage as a LAZY frame (PlanSpec inspects
    * this shape — the memoized q212 steady-state plan reads the members
    * table, so the join's scale contract must be assertable without
    * executing a build): every qualifying unordered CROSS-cell pair of
    * `pts` (id, x, y, cx, cy at cell width ε/2), exactly once.
    *
    * Joins on the RAW (jx, jy) pair — an encoded scalar cell id would
    * collide on grids wider than its stride (a tiny ε over a wide
    * range), silently inflating the candidate join toward quadratic.
    * The forward half of the 24-offset ring (dx > 0, or dx = 0 ∧
    * dy > 0) enumerates each unordered pair once — half the distance
    * evaluations of a symmetric ring. */
  private[graft] def epsCrossPairs(pts: DataFrame, eps: Double): DataFrame = {
    val spark = pts.sparkSession
    import spark.implicits._
    val eps2 = eps * eps
    val fwd = for { dx <- 0 to 2; dy <- -2 to 2
      if dx > 0 || (dx == 0 && dy > 0) } yield (dx, dy)
    val probe = pts.select($"id", $"x", $"y", explode(array(
      fwd.map { case (dx, dy) =>
        struct(($"cx" + dx).as("jx"), ($"cy" + dy).as("jy")) }: _*)).as("c"))
      .select($"id", $"x", $"y", $"c.jx".as("jx"), $"c.jy".as("jy"))
    val build = pts.select($"id".as("idb"), $"x".as("xb"), $"y".as("yb"),
      $"cx".as("jx"), $"cy".as("jy"))
    probe.join(build, Seq("jx", "jy"))
      .filter(($"x" - $"xb") * ($"x" - $"xb") +
        ($"y" - $"yb") * ($"y" - $"yb") <= eps2)
      .select($"id", $"idb")
  }

  /** `points` projected to (id, x, y) with ε/2-grid cell coordinates —
    * [[dbscan]]'s working frame, shared with [[epsCrossPairs]]. */
  private[graft] def dbscanPts(points: DataFrame, idCol: String,
      xCol: String, yCol: String, eps: Double): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val w = eps / 2
    points.select(col(idCol).as("id"),
        col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      .withColumn("cx", floor($"x" / w).cast("long"))
      .withColumn("cy", floor($"y" / w).cast("long"))
  }

  private[graft] def dbscan(points: DataFrame, idCol: String, xCol: String,
      yCol: String, eps: Double = DbscanEps, minPts: Long = DbscanMinPts,
      memoKey: Option[(String, String)] = None): DataFrame = {
    require(eps > 0, s"need eps > 0 (got $eps)")
    require(minPts >= 1, s"need minPts >= 1 (got $minPts)")
    val spark = points.sparkSession
    import spark.implicits._
    val pts = dbscanPts(points, idCol, xCol, yCol, eps)
    // every qualifying unordered CROSS-cell pair, exactly once; the
    // persist serves its three consumers below. Bounded by the true
    // ε-graph edge count (the inherent output of a fixed-ε density
    // scan), spills to disk past memory.
    val cp = epsCrossPairs(pts, eps)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Joins AGAINST the pair table must never shuffle it: at fixed-ε
    // density cp is ~N²πε²/area rows (1.3·10⁹ at the sf30 rehearsal —
    // each sort-shuffle of it writes ~20 GB, and three of them blew a
    // 70 GB disk), while every other side is id-keyed and ≤ N rows.
    // Past the 10 MB auto-broadcast threshold Spark picks sort-merge,
    // so hint the small sides explicitly while N is broadcast-sane;
    // beyond that a real cluster shuffles — the standard trade.
    val hintBroadcast = {
      // one cheap count decides the hint; the memo-hit path never gets
      // here (this sits inside the build-only consumers below)
      lazy val n = pts.count()
      (df: DataFrame) => if (n <= 8000000L) broadcast(df) else df
    }
    // deg = |own cell| (every same-cell point incl. self qualifies —
    // cell diagonal ε/√2) + qualifying cross-cell neighbors
    val cellSize = pts.groupBy($"cx", $"cy").agg(count(lit(1)).as("csz"))
    val crossDeg = cp.select(explode(array($"id", $"idb")).as("id"))
      .groupBy($"id").agg(count(lit(1)).as("xdeg"))
    val core = pts.join(cellSize, Seq("cx", "cy"))
      .join(crossDeg, Seq("id"), "left")
      .filter($"csz" + coalesce($"xdeg", lit(0L)) >= minPts)
      .select($"id", $"cx", $"cy")
      .persist()
    // clique→star: per-cell anchor + spokes; cross-cell core pairs
    // contract to one undirected anchor edge per qualifying cell pair
    val anchors = core.groupBy($"cx", $"cy").agg(min($"id").as("anchor"))
    val coreAnchor = core.join(anchors, Seq("cx", "cy"))
      .select($"id", $"anchor").persist()
    def buildMembers(): DataFrame = {
      val bc = hintBroadcast
      val starEdges = coreAnchor.filter($"id" =!= $"anchor")
        .select($"anchor".as("src"), $"id".as("dst"))
      val crossCoreEdges = cp
        .join(bc(coreAnchor.select($"id", $"anchor".as("aa"))), Seq("id"))
        .join(bc(coreAnchor.select($"id".as("idb"), $"anchor".as("ab"))), Seq("idb"))
        .select(least($"aa", $"ab").as("src"), greatest($"aa", $"ab").as("dst"))
        .distinct()
      val lblRes = Components.run(starEdges.unionByName(crossCoreEdges))
      val lbl = lblRes.labels.withColumnRenamed("doc_id", "id")
      val corelbl = core.select($"id").join(lbl, Seq("id"), "left")
        .select($"id", coalesce($"lbl", $"id").as("cluster_id"))
        .persist()
      // border attach: same-cell candidates ride the anchor's label
      // (one per core cell), cross-cell candidates read the pair table
      // in both directions
      val anchorLbl = anchors
        .join(corelbl.withColumnRenamed("id", "anchor"), Seq("anchor"))
        .select($"cx", $"cy", $"cluster_id")
      val coreIds = core.select($"id")
      val nonCore = pts.join(coreIds, Seq("id"), "left_anti")
        .select($"id", $"cx", $"cy")
      val sameCellCand = nonCore.join(anchorLbl, Seq("cx", "cy"))
        .select($"id", $"cluster_id")
      val cl = corelbl.withColumnRenamed("cluster_id", "cl")
      val crossCand1 = cp
        .join(bc(cl.withColumnRenamed("id", "idb")), Seq("idb"))
        .join(bc(coreIds), Seq("id"), "left_anti")
        .select($"id", $"cl".as("cluster_id"))
      val crossCand2 = cp
        .join(bc(cl), Seq("id"))
        .join(bc(coreIds.withColumnRenamed("id", "idb")), Seq("idb"), "left_anti")
        .select($"idb".as("id"), $"cl".as("cluster_id"))
      val border = sameCellCand.unionByName(crossCand1).unionByName(crossCand2)
        .groupBy($"id").agg(min($"cluster_id").as("cluster_id"))
      val m = corelbl.withColumn("is_core", lit(1L))
        .unionByName(border.withColumn("is_core", lit(0L)))
      // snapshot members THROUGH the intermediates, then drop them: the
      // checkpoint is lineage-free, so the unpersists below can never
      // force recomputation through a released cache
      val snap = m.localCheckpoint(true)
      lblRes.labels.unpersist()
      corelbl.unpersist()
      snap
    }
    val members = memoKey match {
      case Some((dir, key)) =>
        graft.core.PersistedMemo.getOrBuild(spark, dir, key)(buildMembers())
      case None => buildMembers()
    }
    // the heavy intermediates are scoped to the build: on a memo HIT
    // none of them was ever materialized and these are no-ops
    cp.unpersist()
    core.unpersist()
    coreAnchor.unpersist()
    val noise = pts.select($"id")
      .join(members.select($"id"), Seq("id"), "left_anti")
    members.groupBy($"cluster_id")
      .agg(sum($"is_core").as("n_core"),
        sum(lit(1L) - $"is_core").as("n_border"),
        count(lit(1)).as("n_points"))
      .unionByName(noise.agg(count(lit(1)).as("n_points"))
        .select(lit(-1L).as("cluster_id"), lit(0L).as("n_core"),
          lit(0L).as("n_border"), $"n_points"))
      .orderBy($"cluster_id")
  }

  private def q212(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    dbscan(
      Tables.embeddings(spark, dir)
        .select($"vec_id", element_at($"embedding", 1).as("x"),
          element_at($"embedding", 2).as("y")),
      "vec_id", "x", "y", memoKey = Some((dir, "segmentation:dbscan-members")))
  }

  private val q212Sql: String =
    s"""WITH RECURSIVE p AS (
       |  SELECT vec_id AS id, CAST(embedding[1] AS DOUBLE) AS x,
       |         CAST(embedding[2] AS DOUBLE) AS y
       |  FROM embeddings
       |), nb AS (
       |  SELECT a.id AS ida, b.id AS idb
       |  FROM p a JOIN p b
       |    ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
       |       <= ${DbscanEps * DbscanEps}
       |), core AS (
       |  SELECT ida AS id FROM nb GROUP BY 1 HAVING count(*) >= $DbscanMinPts
       |), e AS (
       |  SELECT n.ida AS src, n.idb AS dst
       |  FROM nb n JOIN core ca ON ca.id = n.ida JOIN core cb ON cb.id = n.idb
       |  WHERE n.ida <> n.idb
       |), reach(src, dst) AS (
       |  SELECT src, dst FROM e
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
       |), lbl AS (
       |  SELECT src AS id, least(src, min(dst)) AS cluster_id
       |  FROM reach GROUP BY 1
       |), corelbl AS (
       |  SELECT c.id, COALESCE(l.cluster_id, c.id) AS cluster_id
       |  FROM core c LEFT JOIN lbl l ON l.id = c.id
       |), border AS (
       |  SELECT n.ida AS id, min(cl.cluster_id) AS cluster_id
       |  FROM nb n
       |  JOIN corelbl cl ON cl.id = n.idb
       |  LEFT JOIN core isc ON isc.id = n.ida
       |  WHERE isc.id IS NULL
       |  GROUP BY 1
       |), members AS (
       |  SELECT id, cluster_id, 1 AS is_core FROM corelbl
       |  UNION ALL
       |  SELECT id, cluster_id, 0 AS is_core FROM border
       |)
       |SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
       |       CAST(sum(is_core) AS BIGINT) AS n_core,
       |       CAST(sum(1 - is_core) AS BIGINT) AS n_border,
       |       CAST(count(*) AS BIGINT) AS n_points
       |FROM members GROUP BY 1
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
       |       CAST((SELECT count(*) FROM p
       |             WHERE id NOT IN (SELECT id FROM members)) AS BIGINT)
       |ORDER BY cluster_id""".stripMargin

  // -------------------------------------------------------------- q223
  /** Density-NORMALIZED DBSCAN — the production form q212's scaladoc
    * points to, oracle-gated as its own row. q212 keeps ε fixed at the
    * sf0.1 calibration (0.05), so its ε-graph edge count grows as
    * N²·πε²/area — the right parity calibration, the wrong production
    * contract: at growing corpus density a fixed radius degenerates
    * toward one giant cluster AND a quadratic edge volume. The
    * production rule scales the radius to hold the EXPECTED
    * ε-neighborhood constant:
    *
    *   ε(N) = ε₀ / √(N / N₀)      (ε₀ = 0.05, N₀ = 2000 — the sf0.1
    *                               calibration corpus)
    *
    * so E[deg] ≈ ρπε² = const and the edge volume — hence the whole
    * build: candidate pairs, degrees, CC input — is LINEAR in N at
    * every scale factor (the q212 ladder accelerates 1.5× → 38× across
    * the decade; this row's ratio stays ~linear by construction).
    * Exact-semantics DBSCAN at that radius: same core/border/noise
    * trichotomy, same min-label components, same output contract as
    * q212.
    *
    * Engine parity of the radius itself: both engines compute
    * ε = ε₀ / sqrt(N / N₀) over the same BIGINT N with the same IEEE
    * divide/sqrt/divide chain, and the predicate compares against
    * ε·ε spelled as the same multiply — bit-identical thresholds, no
    * rounding anywhere (q212's discipline). */
  private[graft] val DbscanCalibN = 2000L // embeddings rows at the sf0.1 calibration

  /** ε(N) = ε₀ / √(N / N₀) — the density-normalized radius, one shared
    * arithmetic chain (divide, sqrt, divide — no rounding) so the q223
    * oracle, the catalog row, and the facade default can never fork
    * bitwise. */
  private[graft] def scaledEps(n: Long, eps0: Double = DbscanEps,
      n0: Long = DbscanCalibN): Double =
    eps0 / math.sqrt(n / n0.toDouble)

  private def q223(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n = Tables.embeddings(spark, dir).count()
    val eps = scaledEps(n)
    dbscan(
      Tables.embeddings(spark, dir)
        .select($"vec_id", element_at($"embedding", 1).as("x"),
          element_at($"embedding", 2).as("y")),
      "vec_id", "x", "y", eps = eps,
      memoKey = Some((dir, "segmentation:dbscan-scaled-members")))
  }

  private val q223Sql: String =
    s"""WITH RECURSIVE nn AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings
       |), ee AS (
       |  SELECT ($DbscanEps / sqrt(n / $DbscanCalibN.0)) *
       |         ($DbscanEps / sqrt(n / $DbscanCalibN.0)) AS eps2 FROM nn
       |), p AS (
       |  SELECT vec_id AS id, CAST(embedding[1] AS DOUBLE) AS x,
       |         CAST(embedding[2] AS DOUBLE) AS y
       |  FROM embeddings
       |), nb AS (
       |  SELECT a.id AS ida, b.id AS idb
       |  FROM p a JOIN p b ON (a.x - b.x) * (a.x - b.x) +
       |                       (a.y - b.y) * (a.y - b.y)
       |                       <= (SELECT eps2 FROM ee)
       |), core AS (
       |  SELECT ida AS id FROM nb GROUP BY 1 HAVING count(*) >= $DbscanMinPts
       |), e AS (
       |  SELECT n.ida AS src, n.idb AS dst
       |  FROM nb n JOIN core ca ON ca.id = n.ida JOIN core cb ON cb.id = n.idb
       |  WHERE n.ida <> n.idb
       |), reach(src, dst) AS (
       |  SELECT src, dst FROM e
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
       |), lbl AS (
       |  SELECT src AS id, least(src, min(dst)) AS cluster_id
       |  FROM reach GROUP BY 1
       |), corelbl AS (
       |  SELECT c.id, COALESCE(l.cluster_id, c.id) AS cluster_id
       |  FROM core c LEFT JOIN lbl l ON l.id = c.id
       |), border AS (
       |  SELECT n.ida AS id, min(cl.cluster_id) AS cluster_id
       |  FROM nb n
       |  JOIN corelbl cl ON cl.id = n.idb
       |  LEFT JOIN core isc ON isc.id = n.ida
       |  WHERE isc.id IS NULL
       |  GROUP BY 1
       |), members AS (
       |  SELECT id, cluster_id, 1 AS is_core FROM corelbl
       |  UNION ALL
       |  SELECT id, cluster_id, 0 AS is_core FROM border
       |)
       |SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
       |       CAST(sum(is_core) AS BIGINT) AS n_core,
       |       CAST(sum(1 - is_core) AS BIGINT) AS n_border,
       |       CAST(count(*) AS BIGINT) AS n_points
       |FROM members GROUP BY 1
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
       |       CAST((SELECT count(*) FROM p
       |             WHERE id NOT IN (SELECT id FROM members)) AS BIGINT)
       |ORDER BY cluster_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q137_rfm_segments", q137, Some(q137Sql)),
    Q("q138_ab_test", q138, Some(q138Sql)),
    Q("q141_cuped_adjustment", q141, Some(q141Sql)),
    Q("q161_mann_whitney", q161, Some(q161Sql)),
    Q("q165_grid_density", q165, Some(q165Sql)),
    Q("q212_dbscan", q212, Some(q212Sql)),
    Q("q223_dbscan_scaled", q223, Some(q223Sql)),
  )
}
