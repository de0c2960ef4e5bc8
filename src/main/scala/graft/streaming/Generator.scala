package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic sensor-reading generator — the reference's MQTT Producer
  * (lambda-sample mqtt/Producer.scala:55-74) re-expressed on the `rate`
  * streaming source: per tick, each sensor emits ±rand[0,bound) in the
  * normal state or ±(bound + rand[0,bound/2)) when anomalous, with the
  * label set exactly when the state is anomalous.
  *
  * The reference flips state via an HTTP control; here anomaly episodes
  * are drawn per record with `anomalyRate` (equivalent marginal
  * distribution, no side channel). Rows/sec × #sensors reproduces the
  * 20 msg/s reference cadence (4 sensors / 200 ms tick) by default.
  */
object Generator {

  def mqttStream(
      spark: SparkSession,
      sensors: Seq[String],
      bound: Double = 100.0,
      anomalyRate: Double = 0.03,
      rowsPerSecond: Int = 20): DataFrame = {
    val src = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
    // materialize the random draws once: nondeterministic expressions
    // block projection collapse, so u1/u2/u3 are single evaluations and
    // the label can never disagree with the magnitude drawn from u1
    val drawn = src.select(
      col("value"),
      rand().as("u1"), rand().as("u2"), rand().as("u3"))
    val isAnomaly = col("u1") < anomalyRate
    val sign = when(col("u2") < 0.5, lit(-1.0)).otherwise(lit(1.0))
    val magnitude = when(isAnomaly, lit(bound) + col("u3") * (bound / 2))
      .otherwise(col("u3") * bound)
    drawn.select(
      element_at(typedlit(sensors), (col("value") % sensors.size + 1).cast("int")).as("sensor"),
      (sign * magnitude).as("value"),
      isAnomaly.cast("int").as("anomaly"))
  }
}
