package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.Q
import graft.sources.Tables

/** The flagship analysis pipeline of the reference (lambda-sample
  * analyzer/Analyzer.scala:104-151 + lib/CassandraClient.scala:38-43),
  * re-expressed as declarative column algebra:
  *
  *   entries → per-sensor recent window (top-N by ts DESC)
  *           → groupBy(sensor).agg(count, mean, stddev_pop, latest)
  *           → heuristic clamp score (speed layer)
  *           → left-outer model-score join, −1 sentinel, 35/65 blend
  *
  * The reference's per-sensor actor loop and keyed-store round-trips
  * collapse into ONE shuffle (the window/groupBy on `sensor`); model
  * scores join broadcast (4 rows). At 100 TB the same plan holds:
  * the window shuffle partitions by sensor key, aggregation is
  * partial+final, and nothing collects to the driver.
  */
object Anomaly extends DetRounding {

  /** Per-sensor most-recent-N window (reference `recent`/`full` reads,
    * CassandraClient.scala:38-43 under ts-DESC clustering): the
    * canonical W2 operator. `tiebreak` makes row_number deterministic
    * when ts values can collide. */
  def recentWindow(entries: DataFrame, n: Int, tiebreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(col("sensor"))
      .orderBy(col("ts").desc +: tiebreak.map(_.desc): _*)
    entries.withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
  }

  /** `clamp((|sample−mean|−σ)/(2σ), 0, 1)` — Analyzer.scala:54-58 as a
    * single codegen'd expression (no UDF). */
  def heuristicScore(sample: Column, mean: Column, std: Column): Column =
    least(greatest((abs(sample - mean) - std) / (lit(2.0) * std), lit(0.0)), lit(1.0))

  /** Speed-layer analysis over a recent window produced by
    * [[recentWindow]] (expects its `rn` column): per sensor — window
    * size, mean, population σ, latest value (rn=1), heuristic score. */
  def fastAnalysis(recent: DataFrame): DataFrame =
    recent.groupBy(col("sensor"))
      .agg(
        max(col("ts")).as("ts"),
        count(lit(1)).as("n"),
        avg(col("value")).as("avg_v"),
        stddev_pop(col("value")).as("std_v"),
        max(when(col("rn") === 1, col("value"))).as("last_v"))
      .withColumn("fast_anomaly", heuristicScore(col("last_v"), col("avg_v"), col("std_v")))

  /** Full analysis: fast scores joined left-outer with per-sensor model
    * scores (`sensor`, `full_score` = P(anomaly) of the latest value) —
    * left-outer because a model may be absent (single-class training,
    * Trainer.scala:43-49): then fullAnomaly = score | −1 sentinel and
    * avgAnomaly = (35·fast + 65·full)/100 | fast (Analyzer.scala:138-151). */
  def analysis(fast: DataFrame, modelScores: DataFrame): DataFrame =
    fast.join(broadcast(modelScores), Seq("sensor"), "left_outer")
      .select(
        col("sensor").as("name"),
        col("ts"),
        col("fast_anomaly").as("fastAnomaly"),
        coalesce(col("full_score"), lit(-1.0)).as("fullAnomaly"),
        coalesce(
          (col("fast_anomaly") * 35 + col("full_score") * 65) / 100,
          col("fast_anomaly")).as("avgAnomaly"))

  // --------------------------------------------------------------- q35
  /** Oracle-checked flagship: the full speed-layer pipeline over the
    * events table (event_type ≈ sensor), recent window = 200, heuristic
    * + sentinel + fallback blend (no model in oracle scope — RF parity
    * is covered by tolerance-based tests instead, as in the reference's
    * own AnalyzerSpec). */
  private def q35(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val entries = Tables.events(spark, dir).select(
      $"event_type".as("sensor"),
      unix_micros($"ts").as("us"),
      $"event_id",
      $"value")
    val w = Window.partitionBy($"sensor").orderBy($"us".desc, $"event_id".desc)
    val recent = entries.withColumn("rn", row_number().over(w)).filter($"rn" <= 200)
    recent.groupBy($"sensor")
      .agg(
        count(lit(1)).as("n"),
        avg($"value").as("avg_v"),
        sum($"value").as("sum_v"),
        stddev_pop($"value").as("std_v"),
        max(when($"rn" === 1, $"value")).as("last_v"))
      .select(
        $"sensor",
        $"n",
        // exact decimal mean: round the sum to the data scale, divide
        (round($"sum_v", 2) / $"n").as("avg_value"),
        round($"std_v", 4).as("std_value"),
        $"last_v".as("last_value"),
        // σ=0 guard for oracle parity: Spark 0/0 → NULL, DuckDB → NaN;
        // both sides CASE to NULL explicitly
        when($"std_v" === 0.0, lit(null).cast("double"))
          .otherwise(round(heuristicScore($"last_v", $"avg_v", $"std_v"), 4)).as("fast_anomaly"),
        lit(-1.0).as("full_anomaly"),
        when($"std_v" === 0.0, lit(null).cast("double"))
          .otherwise(round(heuristicScore($"last_v", $"avg_v", $"std_v"), 4)).as("avg_anomaly"))
      .orderBy($"sensor")
  }

  private val q35Sql =
    """WITH r AS (
      |  SELECT * FROM (
      |    SELECT event_type AS sensor, value,
      |           row_number() OVER (PARTITION BY event_type
      |                              ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      |    FROM events) t
      |  WHERE rn <= 200
      |), s AS (
      |  SELECT sensor,
      |         count(*) AS n,
      |         avg(value) AS avg_v,
      |         sum(value) AS sum_v,
      |         stddev_pop(value) AS std_v,
      |         max(CASE WHEN rn = 1 THEN value END) AS last_v
      |  FROM r GROUP BY 1
      |)
      |SELECT sensor, n,
      |       round(sum_v, 2) / n AS avg_value,
      |       round(std_v, 4) AS std_value,
      |       last_v AS last_value,
      |       CASE WHEN std_v = 0.0 THEN NULL ELSE
      |         round(least(greatest((abs(last_v - avg_v) - std_v) / (2.0 * std_v), 0.0), 1.0), 4)
      |       END AS fast_anomaly,
      |       -1.0 AS full_anomaly,
      |       CASE WHEN std_v = 0.0 THEN NULL ELSE
      |         round(least(greatest((abs(last_v - avg_v) - std_v) / (2.0 * std_v), 0.0), 1.0), 4)
      |       END AS avg_anomaly
      |FROM s
      |ORDER BY sensor""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q35_flagship_analysis", q35, Some(q35Sql)),
  )
}
