package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream join — labeling the readings stream with
  * the control command that was active when each reading arrived (the
  * reference's producer flips anomaly episodes via `POST /update`;
  * joining readings to those commands is how an operator audits which
  * readings were produced under which episode). An EXTENSION beyond
  * the reference's per-store lookups, and the canonical Spark shape
  * for it: both sides watermarked, an equi-key plus a bounded
  * time-range condition, so the state store retains only rows inside
  * the join horizon — state is bounded by (keys × horizon), never by
  * stream length, which is what lets the join run forever at 100 TB.
  */
object StreamJoin {

  /** Inner-join readings (sensor, ts, value, …) to commands
    * (sensor, ts, anomaly): each reading matches the commands issued
    * within `horizon` BEFORE it. Late rows beyond `lateness` are
    * dropped by the watermark; command state older than
    * watermark − horizon is evicted. */
  def enrich(
      readings: DataFrame,
      commands: DataFrame,
      horizon: String = "1 minute",
      lateness: String = "30 seconds"): DataFrame = {
    val r = readings.withWatermark("ts", lateness)
    val c = commands
      .select(col("sensor").as("c_sensor"), col("ts").as("cmd_ts"),
        col("anomaly").as("cmd_anomaly"))
      .withWatermark("cmd_ts", lateness)
    r.join(c,
      expr(s"sensor = c_sensor AND ts >= cmd_ts AND ts < cmd_ts + interval $horizon"))
      .select(col("sensor"), col("ts"), col("value"), col("cmd_ts"),
        col("cmd_anomaly"))
  }
}
